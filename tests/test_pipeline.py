"""Pipeline-parallel correctness on a virtual 8-device CPU mesh.

The reference only stubs PP (`glm4_moe/model.py:94-100` fakes
``is_last_rank``; real groups live in the vendored, unused
`parallel_state_ref.py:1048-1058`). Here PP is a real microbatched
layer-stage pipeline (parallel/pipeline.py) — these tests pin down that it
produces exactly the single-device tokens, composed with tp and dp, for both
model families and both prefill and multi-step decode.
"""

import jax
import pytest

pytestmark = pytest.mark.slow

from tests.test_sharding import TINY_MOE, greedy_tokens, make_runner
from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig
from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.parallel.sharding import make_mesh

PROMPTS = [[1, 2, 3, 4, 5], [7, 8, 9], [11, 12], [3, 1, 4, 1, 5, 9, 2, 6]]


@pytest.mark.parametrize("dp,pp,tp", [(1, 2, 1), (1, 2, 2), (2, 2, 2), (1, 4, 2)])
def test_pp_moe_matches_single_device(dp, pp, tp):
    assert len(jax.devices()) >= dp * pp * tp
    # TINY_MOE: 1 dense + 2 MoE layers — pp=2 splits the MoE stack 1/1;
    # pp=4 needs a 4-layer MoE stack
    mc = TINY_MOE
    if (mc.num_layers - mc.first_k_dense_replace) % pp != 0:
        from dataclasses import replace

        mc = replace(mc, num_layers=mc.first_k_dense_replace + pp)

    r1, s1 = make_runner(mc)
    base = greedy_tokens(r1, s1, PROMPTS)

    mesh = make_mesh(dp=dp, tp=tp, pp=pp)
    r2, s2 = make_runner(mc, mesh=mesh)
    assert r2.model.pp == pp
    piped = greedy_tokens(r2, s2, PROMPTS)
    assert base == piped


def test_pp_qwen3_matches_single_device():
    mc = ModelConfig(
        architecture="qwen3",
        vocab_size=128,
        hidden_size=64,
        num_layers=4,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        intermediate_size=128,
        max_position_embeddings=2048,
        tie_word_embeddings=True,
        eos_token_id=0,
    )
    r1, s1 = make_runner(mc)
    base = greedy_tokens(r1, s1, PROMPTS)

    mesh = make_mesh(dp=1, tp=2, pp=2)
    r2, s2 = make_runner(mc, mesh=mesh)
    piped = greedy_tokens(r2, s2, PROMPTS)
    assert base == piped


def test_pp_extra_microbatches():
    """num_mb > pp (smaller bubble) must not change results."""
    mc = TINY_MOE

    r1, s1 = make_runner(mc)
    base = greedy_tokens(r1, s1, PROMPTS)

    mesh = make_mesh(dp=1, tp=2, pp=2)
    cfg = Config(
        model="", model_config=mc, max_num_seqs=4, max_model_len=128,
        kvcache_block_size=16, num_kvcache_blocks=64, prefill_chunk_size=64,
        enforce_eager=True, dtype="float32", kv_cache_dtype="float32",
        decode_buckets=(4,), prefill_seq_buckets=(4,),
        prefill_len_buckets=(16, 32, 64), pp_microbatches=4,
    )
    r2 = ModelRunner(cfg, mesh=mesh)
    s2 = Scheduler(cfg)
    assert r2.model.pp_microbatches == 4
    piped = greedy_tokens(r2, s2, PROMPTS)
    assert base == piped


def test_pp_rejects_sequence_parallel_prefill():
    """Sibling SP rows could pipeline out of order across microbatches
    (a later chunk attending unwritten sibling KV) — config must reject."""
    import pytest

    from glm4_moe_nano_vllm_tpu.config import Config

    with pytest.raises(AssertionError, match="pipeline"):
        Config(model="", model_config=TINY_MOE, prefill_sp_degree=2,
               prefill_chunk_size=32, kvcache_block_size=16,
               pipeline_parallel_size=2, num_kvcache_blocks=64)


def test_pp_fp8_kv_matches_single_device():
    """fp8 {data, scale} KV caches under pipeline parallelism (the round-2
    assert is lifted: pipeline_forward + cache_specs are pytree-generic).
    Parity vs a single-device fp8 engine — fp8 storage changes values
    slightly vs bf16, so the reference must be fp8 too."""
    mc = TINY_MOE
    r1, s1 = make_runner(mc, kv_cache_dtype="float8_e4m3fn")
    base = greedy_tokens(r1, s1, PROMPTS)

    mesh = make_mesh(dp=1, tp=2, pp=2)
    r2, s2 = make_runner(mc, mesh=mesh, kv_cache_dtype="float8_e4m3fn")
    assert r2.model.pp == 2
    piped = greedy_tokens(r2, s2, PROMPTS)
    assert base == piped
