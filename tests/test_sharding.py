"""Tensor-parallel sharding correctness on a virtual 8-device CPU mesh.

Validates what the reference never tests (its TP is broken in the fork,
SURVEY §2.3): sharded execution produces the same logits as single-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig
from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
from glm4_moe_nano_vllm_tpu.parallel.sharding import (
    batch_specs,
    cache_specs,
    make_mesh,
    param_specs,
    shard_tree,
    validate_model_for_mesh,
)
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

TINY_MOE = ModelConfig(
    architecture="glm4_moe",
    vocab_size=128,
    hidden_size=64,
    num_layers=3,
    num_heads=8,
    num_kv_heads=4,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=2048,
    partial_rotary_factor=0.5,
    use_qk_norm=True,
    attention_bias=True,
    tie_word_embeddings=True,
    eos_token_id=0,
    n_routed_experts=8,
    num_experts_per_tok=2,
    moe_intermediate_size=32,
    n_shared_experts=1,
    first_k_dense_replace=1,
    routed_scaling_factor=1.5,
)


def make_runner(mc, mesh=None, moe_parallel="im", **kw):
    defaults = dict(
        max_num_seqs=4, max_model_len=128,
        kvcache_block_size=16, num_kvcache_blocks=64, prefill_chunk_size=64,
        enforce_eager=True, dtype="float32", kv_cache_dtype="float32",
        decode_buckets=(1, 2, 4), prefill_seq_buckets=(1, 2, 4),
        prefill_len_buckets=(16, 32, 64), moe_parallel=moe_parallel,
    )
    defaults.update(kw)
    cfg = Config(model="", model_config=mc, **defaults)
    return ModelRunner(cfg, mesh=mesh), Scheduler(cfg)


def greedy_tokens(runner, sched, prompts, n=6):
    seqs = [
        Sequence(list(p), SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True))
        for p in prompts
    ]
    for s in seqs:
        sched.add(s)
    while not sched.is_finished():
        batch = sched.schedule()
        sched.postprocess(batch, runner.run(batch))
    return [s.completion_token_ids for s in seqs]


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 2), (4, 2), (1, 8)])
def test_tp_matches_single_device(dp, tp):
    assert len(jax.devices()) >= dp * tp, "conftest must provide 8 cpu devices"
    validate_model_for_mesh(TINY_MOE, tp)
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]

    r1, s1 = make_runner(TINY_MOE)
    base = greedy_tokens(r1, s1, prompts)

    mesh = make_mesh(dp=dp, tp=tp)
    r2, s2 = make_runner(TINY_MOE, mesh=mesh)
    # same random weights: re-init with same seed happens inside ModelRunner
    sharded = greedy_tokens(r2, s2, prompts)
    assert base == sharded


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 4), (1, 8)])
def test_ep_matches_single_device(dp, tp):
    """Expert parallelism (E-dim sharding + psum combine) vs single device."""
    assert len(jax.devices()) >= dp * tp
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], [11, 12]]

    r1, s1 = make_runner(TINY_MOE)
    base = greedy_tokens(r1, s1, prompts)

    mesh = make_mesh(dp=dp, tp=tp)
    r2, s2 = make_runner(TINY_MOE, mesh=mesh, moe_parallel="ep")
    assert r2.model.moe_ep
    sharded = greedy_tokens(r2, s2, prompts)
    assert base == sharded


def test_ep_matches_single_device_quantized():
    """EP with AWQ INT4 expert weights (quant-dict leaves sharded on E)."""
    from dataclasses import replace

    from glm4_moe_nano_vllm_tpu.config import QuantConfig

    mc = replace(TINY_MOE, hidden_size=128, moe_intermediate_size=128,
                 intermediate_size=256,
                 quant=QuantConfig(method="awq", bits=4, group_size=128))
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]

    r1, s1 = make_runner(mc)
    base = greedy_tokens(r1, s1, prompts)

    mesh = make_mesh(dp=1, tp=4)
    r2, s2 = make_runner(mc, mesh=mesh, moe_parallel="ep")
    assert r2.model.moe_ep
    sharded = greedy_tokens(r2, s2, prompts)
    assert base == sharded


def test_param_specs_cover_tree():
    from glm4_moe_nano_vllm_tpu.models.registry import build_model

    model = build_model(TINY_MOE, jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    specs = param_specs(params)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    assert len(flat_p) == len(flat_s)
    for p, s in zip(flat_p, flat_s):
        assert len(s) <= p.ndim


def test_quantized_lm_head_matches_single_device():
    """Vocab-sharded [H, V] quant-dict head: tp logits/gather == single
    device (QuantConfig.quantize_lm_head; the dict leaves inherit the
    lm_head P(None, tp) rule)."""
    from dataclasses import replace

    from glm4_moe_nano_vllm_tpu.config import QuantConfig

    mc = replace(TINY_MOE, hidden_size=128, moe_intermediate_size=128,
                 intermediate_size=256,
                 quant=QuantConfig(method="awq", bits=4, group_size=128,
                                   quantize_lm_head=True))
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]

    r1, s1 = make_runner(mc)
    assert isinstance(r1.params["lm_head"], dict)
    assert "embed" not in r1.params  # tied: one quant dict serves both
    base = greedy_tokens(r1, s1, prompts)

    mesh = make_mesh(dp=1, tp=4)
    r2, s2 = make_runner(mc, mesh=mesh)
    sharded = greedy_tokens(r2, s2, prompts)
    assert base == sharded


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 4)])
def test_ep_a2a_engine_matches_single_device(dp, tp):
    """Full engine with ep_dispatch="a2a": all-to-all expert dispatch on
    every MoE call (prefill AND decode) == single device."""
    assert len(jax.devices()) >= dp * tp
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], list(range(11, 51))]

    r1, s1 = make_runner(TINY_MOE)
    base = greedy_tokens(r1, s1, prompts)

    mesh = make_mesh(dp=dp, tp=tp)
    r2, s2 = make_runner(TINY_MOE, mesh=mesh, moe_parallel="ep",
                         ep_dispatch="a2a")
    assert r2.model.moe_ep and r2.model.ep_dispatch == "a2a"
    sharded = greedy_tokens(r2, s2, prompts)
    assert base == sharded


def test_im_mode_quant_group_fracture_rejected_at_config_time():
    """Forcing moe_parallel='im' (or auto resolving to it) with INT4 experts
    whose Im/tp fractures the quant group must fail with a clear config-time
    error, not a deep loader assert (VERDICT r3 item 9)."""
    import pytest

    from glm4_moe_nano_vllm_tpu.config import ModelConfig, QuantConfig
    from glm4_moe_nano_vllm_tpu.parallel.sharding import resolve_moe_parallel

    mc = ModelConfig(
        architecture="glm4_moe", vocab_size=1024, hidden_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
        intermediate_size=512, max_position_embeddings=1024,
        tie_word_embeddings=True, eos_token_id=0,
        n_routed_experts=12, num_experts_per_tok=2,
        moe_intermediate_size=1408, n_shared_experts=1,
        first_k_dense_replace=1,
        quant=QuantConfig(method="awq", bits=4, group_size=128),
    )
    import os

    # the check applies where the packed Pallas kernels serve (TPU); CPU
    # GSPMD meshes may emulate fractured im shards on the XLA dequant path
    os.environ["NVT_STRICT_QUANT_SHARDING"] = "1"
    try:
        # E=12 does not divide tp=8 -> auto resolves to im; Im/8=176
        # fractures the 128-wide groups (the GLM-4.5-Air geometry from
        # ARCHITECTURE.md)
        with pytest.raises(ValueError, match="fractures"):
            resolve_moe_parallel(mc, tp=8, knob="auto")
        with pytest.raises(ValueError, match="fractures"):
            resolve_moe_parallel(mc, tp=8, knob="im")
        # E % tp == 0: auto picks EP and the knob is fine
        assert resolve_moe_parallel(mc, tp=4, knob="auto") is True
        # unquantized experts may shard Im freely
        mc2 = ModelConfig(**{**mc.__dict__, "quant": None})
        assert resolve_moe_parallel(mc2, tp=8, knob="im") is False
    finally:
        del os.environ["NVT_STRICT_QUANT_SHARDING"]
    # non-strict (CPU): the same config resolves without raising
    assert resolve_moe_parallel(mc, tp=8, knob="im") is False
