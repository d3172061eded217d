"""GLM-4.5 355B (BASELINE config 5) topology evidence on virtual meshes.

Mirrors what tests/test_air_topology.py does for config 4: the full
92-layer / 160-expert topology (3 dense + 89 MoE stacks, 96q/8kv heads,
top-8 + shared routing) runs end-to-end at reduced widths over a TP+EP
mesh with a2a dispatch and is mesh-invariant vs single-device; plus the
per-chip HBM-budget math extended to >= 2-host meshes — the config-5
deployment shape (reference intent: the vendored-but-unused multi-node
groups, `/root/reference/nanovllm/distributed/parallel_state_ref.py:
1022-1079`).

The DCN-crossing collective pattern itself (EP axis spanning a process
boundary) is executed by tests/test_multihost.py::
test_two_process_ep_axis_across_boundary; this module pins the 355B
topology and budget.
"""

import json
import os

import pytest

from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig
from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
from glm4_moe_nano_vllm_tpu.parallel.sharding import make_mesh
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "glm45_355b.json")


def cfg_355b() -> ModelConfig:
    with open(CFG_PATH) as f:
        return ModelConfig.from_hf_dict(json.load(f))


def test_355b_config_parses_true_topology():
    mc = cfg_355b()
    assert mc.architecture == "glm4_moe"
    assert (mc.hidden_size, mc.num_layers) == (5120, 92)
    assert (mc.num_heads, mc.num_kv_heads, mc.head_dim) == (96, 8, 128)
    assert (mc.n_routed_experts, mc.num_experts_per_tok) == (160, 8)
    assert mc.moe_intermediate_size == 1536
    assert mc.first_k_dense_replace == 3
    assert mc.quant is not None and mc.quant.group_size == 128
    # EP divisibility for the config-5 mesh shapes: 8 chips/host
    assert mc.n_routed_experts % 8 == 0 and mc.n_routed_experts % 16 == 0


def thin_355b_topology() -> ModelConfig:
    """GLM-4.5-355B's exact topology (depth, stacks, expert counts, head
    counts, routing semantics) at reduced widths for CPU runtime."""
    mc = cfg_355b()
    return ModelConfig(
        architecture="glm4_moe",
        vocab_size=1024,
        hidden_size=128,
        num_layers=mc.num_layers,
        num_heads=mc.num_heads,
        num_kv_heads=mc.num_kv_heads,
        head_dim=16,
        intermediate_size=256,
        max_position_embeddings=1024,
        partial_rotary_factor=mc.partial_rotary_factor,
        use_qk_norm=mc.use_qk_norm,
        attention_bias=mc.attention_bias,
        tie_word_embeddings=True,
        eos_token_id=2,
        n_routed_experts=mc.n_routed_experts,
        num_experts_per_tok=mc.num_experts_per_tok,
        moe_intermediate_size=64,
        n_shared_experts=mc.n_shared_experts,
        first_k_dense_replace=mc.first_k_dense_replace,
        routed_scaling_factor=mc.routed_scaling_factor,
    )


@pytest.mark.slow
def test_full_355b_depth_tp_ep_engine_smoke():
    """92 layers / 160 experts end-to-end through (dp=2, tp=4) + EP a2a,
    greedy-identical to the single-device run."""
    mc = thin_355b_topology()

    def run(mesh, moe_parallel="auto", dispatch="auto"):
        cfg = Config(
            model="", model_config=mc, max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=256, kvcache_block_size=16,
            num_kvcache_blocks=64, prefill_chunk_size=64,
            enforce_eager=True, dtype="float32", kv_cache_dtype="float32",
            decode_buckets=(4,), prefill_seq_buckets=(4,),
            prefill_len_buckets=(16, 64), moe_parallel=moe_parallel,
            ep_dispatch=dispatch, num_scheduler_steps=2,
        )
        runner = ModelRunner(cfg, mesh=mesh)
        sched = Scheduler(cfg)
        sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)
        seqs = [Sequence(list(range(1, 30)), sp), Sequence([7, 8, 9], sp),
                Sequence(list(range(50, 70)), sp)]
        for s in seqs:
            sched.add(s)
        while not sched.is_finished():
            batch = sched.schedule()
            sched.postprocess(batch, runner.run(batch))
        return runner, [s.completion_token_ids for s in seqs]

    runner, got = run(make_mesh(dp=2, tp=4), moe_parallel="ep",
                      dispatch="a2a")
    assert runner.model.moe_ep
    assert runner.model.num_dense == 3 and runner.model.num_moe == 89
    assert all(len(c) == 3 for c in got)

    _, want = run(None)  # single device, same PRNGKey(0) weights
    assert got == want


# ---- per-chip HBM budget across >= 2 hosts (BASELINE config 5) -----------

def glm355b_hbm_budget(num_chips: int, kv_dtype_bytes: int = 1,
                       block_tokens_per_chip: int = 32 * 512):
    """Bytes-per-chip budget for full GLM-4.5-355B INT4 over ``num_chips``
    v5e chips (>= 16, i.e. >= 2 hosts of 8): TP over heads within the
    global tp axis, EP sharding 160 experts num_chips-ways, vocab-sharded
    tied head, routers/norms replicated. Mirrors
    tests/test_air_topology.py::air_hbm_budget for config 4."""
    H, L, E, IM, IS = 5120, 92, 160, 1536, 1536
    NQ, NKV, HD, V = 96, 8, 128, 151552
    DENSE = 3
    LM = L - DENSE

    def int4_bytes(k, n):  # packed qw + zp u8 + scale f32 (KG = k/128)
        kg = -(-k // 128)
        return k * n // 2 + kg * n + kg * n * 4

    experts = LM * E * (2 * int4_bytes(H, IM) + int4_bytes(IM, H))
    shared = LM * (2 * int4_bytes(H, IS) + int4_bytes(IS, H))
    dense_mlp = DENSE * (2 * int4_bytes(H, 12288) + int4_bytes(12288, H))
    attn = L * (int4_bytes(H, NQ * HD) + 2 * int4_bytes(H, NKV * HD)
                + int4_bytes(NQ * HD, H))
    router = LM * (E * H * 4 + E * 4)
    head = int4_bytes(H, V)
    norms = L * 2 * H * 2 + H * 2

    total = experts + shared + dense_mlp + attn + router + head + norms
    per_chip_weights = (
        experts // num_chips      # EP: 160/num_chips experts per chip
        + shared // num_chips     # Im sharded over the global tp axis
        + dense_mlp // num_chips
        + attn // num_chips       # 96 q heads shard to num_chips ways
        + router                  # replicated (tiny)
        + head // num_chips       # vocab-sharded
        + norms                   # replicated
    )
    kv_heads_per_chip = max(1, NKV // num_chips)  # replicate below 1/chip
    kv_per_chip = (2 * L * kv_heads_per_chip * HD * block_tokens_per_chip
                   * kv_dtype_bytes)
    return {
        "total_weights_gib": total / 2**30,
        "per_chip_weights_gib": per_chip_weights / 2**30,
        "kv_per_chip_gib": kv_per_chip / 2**30,
        "per_chip_total_gib": (per_chip_weights + kv_per_chip) / 2**30,
    }


def test_355b_hbm_budget_needs_two_hosts_and_fits_on_two():
    """The packed-INT4 355B does NOT fit one v5e-8 host (that is why
    BASELINE config 5 says >= 2 hosts) and DOES fit 16 chips with scaled
    (int8/fp8) KV and headroom."""
    b8 = glm355b_hbm_budget(num_chips=8, kv_dtype_bytes=1)
    assert 160 < b8["total_weights_gib"] < 200, b8  # ~177 GiB packed INT4
    assert b8["per_chip_total_gib"] > 16 * 0.9, b8  # one host: over budget

    b16 = glm355b_hbm_budget(num_chips=16, kv_dtype_bytes=1)
    assert b16["per_chip_total_gib"] < 16 * 0.9, b16
    # bf16 KV at the same per-chip token budget also fits on 2 hosts
    b16_bf = glm355b_hbm_budget(num_chips=16, kv_dtype_bytes=2)
    assert b16_bf["per_chip_total_gib"] < 16 * 0.9, b16_bf
    # experts divide evenly for both mesh shapes
    assert 160 % 8 == 0 and 160 % 16 == 0
