"""Full GLM-4.5-Air TOPOLOGY on the virtual 8-device mesh (VERDICT r2
item 3): 46 decoder layers (1 dense + 45 MoE — the real two-stack split),
128 routed experts top-8 + 1 shared, real head COUNTS (96q/8kv), through
the TP+EP sharding specs with a2a dispatch. Widths are reduced for CPU
runtime (head_dim 16, hidden 128, Im 64) — the true-WIDTH slice runs in
tests/test_air_shape.py and on-chip in examples/bench_air_slice.py; this
test pins the depth/topology axis the round-2 suite never executed:
scan depth 45, dense+moe stack handoff, and EP at E=128 over the mesh.

Reference context: the reference never runs its full model either — it
debug-loads 2 layers (`/root/reference/nanovllm/models/glm4_moe/
model.py:20-22`); BASELINE config 4 is the full 46-layer Air on a v5e-8.
"""

import numpy as np
import pytest

from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig
from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
from glm4_moe_nano_vllm_tpu.parallel.sharding import make_mesh
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams


def thin_air_topology() -> ModelConfig:
    """GLM-4.5-Air's exact topology (depth, stacks, expert counts, head
    counts, routing semantics) at reduced widths."""
    return ModelConfig(
        architecture="glm4_moe",
        vocab_size=1024,
        hidden_size=128,
        num_layers=46,
        num_heads=96,
        num_kv_heads=8,
        head_dim=16,
        intermediate_size=256,
        max_position_embeddings=1024,
        partial_rotary_factor=0.5,
        use_qk_norm=True,
        attention_bias=True,
        tie_word_embeddings=True,
        eos_token_id=2,
        n_routed_experts=128,
        num_experts_per_tok=8,
        moe_intermediate_size=64,
        n_shared_experts=1,
        first_k_dense_replace=1,
        routed_scaling_factor=2.5,
    )


@pytest.mark.slow
def test_full_air_depth_tp_ep_engine_smoke():
    """46 layers / 128 experts end-to-end through (dp=2, tp=4) + EP a2a."""
    mc = thin_air_topology()
    cfg = Config(
        model="", model_config=mc, max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=256, kvcache_block_size=16,
        num_kvcache_blocks=64, prefill_chunk_size=64, enforce_eager=True,
        dtype="float32", kv_cache_dtype="float32",
        decode_buckets=(4,), prefill_seq_buckets=(4,),
        prefill_len_buckets=(16, 64), moe_parallel="ep", ep_dispatch="a2a",
        num_scheduler_steps=2,
    )
    mesh = make_mesh(dp=2, tp=4)
    runner = ModelRunner(cfg, mesh=mesh)
    assert runner.model.moe_ep
    assert runner.model.num_dense == 1 and runner.model.num_moe == 45
    sched = Scheduler(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)
    seqs = [Sequence(list(range(1, 30)), sp), Sequence([7, 8, 9], sp),
            Sequence(list(range(50, 70)), sp)]
    for s in seqs:
        sched.add(s)
    while not sched.is_finished():
        batch = sched.schedule()
        sched.postprocess(batch, runner.run(batch))
    for s in seqs:
        assert len(s.completion_token_ids) == 3

    # greedy output is mesh-invariant: same model single-device
    cfg2 = Config(
        model="", model_config=mc, max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=256, kvcache_block_size=16,
        num_kvcache_blocks=64, prefill_chunk_size=64, enforce_eager=True,
        dtype="float32", kv_cache_dtype="float32",
        decode_buckets=(4,), prefill_seq_buckets=(4,),
        prefill_len_buckets=(16, 64), num_scheduler_steps=2,
    )
    # init_params is seeded with PRNGKey(0) in both runners, so the
    # single-device engine sees identical weights
    runner2 = ModelRunner(cfg2)
    sched2 = Scheduler(cfg2)
    seqs2 = [Sequence(list(range(1, 30)), sp), Sequence([7, 8, 9], sp),
             Sequence(list(range(50, 70)), sp)]
    for s in seqs2:
        sched2.add(s)
    while not sched2.is_finished():
        batch = sched2.schedule()
        sched2.postprocess(batch, runner2.run(batch))
    assert [s.completion_token_ids for s in seqs2] == \
        [s.completion_token_ids for s in seqs]


# ---- v5e-8 HBM budget for the REAL GLM-4.5-Air (BASELINE config 4) -------

def air_hbm_budget(num_chips: int = 8, kv_dtype_bytes: int = 1,
                   block_tokens_per_chip: int = 64 * 512,
                   scale_bytes: int = 2):
    """Bytes-per-chip budget math for full GLM-4.5-Air INT4 on a v5e-8
    host under TP=8 + EP (experts sharded 16/chip, attention heads 12/chip,
    KV heads replicated 8-way... kv 8 heads / 8 chips -> 1 each).

    Mirrors the table in ARCHITECTURE.md ("v5e-8 HBM budget"); a unit test
    so the doc numbers can't rot silently.
    """
    H, L, E, IM, IS = 4096, 46, 128, 1408, 1408
    NQ, NKV, HD, V = 96, 8, 128, 151552
    LM = L - 1  # MoE layers

    def int4_bytes(k, n):  # packed qw + zp u8 + scale (KG = k/128;
        # scale_bytes=2 is the bf16 default, QuantConfig.scale_dtype)
        kg = -(-k // 128)
        return k * n // 2 + kg * n + kg * n * scale_bytes

    experts = LM * E * (2 * int4_bytes(H, IM) + int4_bytes(IM, H))
    shared = LM * (2 * int4_bytes(H, IS) + int4_bytes(IS, H))
    dense_mlp = 1 * (2 * int4_bytes(H, 10944) + int4_bytes(10944, H))
    attn = L * (int4_bytes(H, NQ * HD) + 2 * int4_bytes(H, NKV * HD)
                + int4_bytes(NQ * HD, H))
    router = LM * (E * H * 4 + E * 4)
    head = int4_bytes(H, V)  # tied quantized head serves embed too
    norms = L * 2 * H * 2 + H * 2

    total = experts + shared + dense_mlp + attn + router + head + norms
    per_chip_weights = (
        experts // num_chips  # EP: E/8 experts per chip
        + shared // num_chips  # Im sharded over tp
        + dense_mlp // num_chips
        + attn // num_chips  # heads sharded (12q per chip)
        + router  # replicated (tiny)
        + head // num_chips  # vocab-sharded
        + norms  # replicated
    )
    kv_per_chip = (
        2 * L * 1 * HD * block_tokens_per_chip * kv_dtype_bytes
    )  # 1 kv head per chip at tp=8
    return {
        "total_weights_gib": total / 2**30,
        "per_chip_weights_gib": per_chip_weights / 2**30,
        "kv_per_chip_gib": kv_per_chip / 2**30,
        "per_chip_total_gib": (per_chip_weights + kv_per_chip) / 2**30,
    }


def test_v5e8_hbm_budget_fits():
    """Full Air INT4 + 32K-token-per-chip fp8 KV fits the 16 GiB/chip HBM
    (with headroom for activations/collectives)."""
    b = air_hbm_budget(num_chips=8, kv_dtype_bytes=1)
    assert 48 < b["total_weights_gib"] < 60, b  # ~53 GiB packed INT4
    assert b["per_chip_total_gib"] < 16 * 0.9, b
    # bf16 KV variant still fits
    b2 = air_hbm_budget(num_chips=8, kv_dtype_bytes=2)
    assert b2["per_chip_total_gib"] < 16 * 0.9, b2
