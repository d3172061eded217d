"""Sequence-parallel prefill: chunks of one prompt as sibling rows.

The reference has no sequence/context parallelism at all (SURVEY §2.3) and
prefills whole prompts in one step (`scheduler.py:29-41`). Here a long prompt
can prefill as ``prefill_sp_degree`` chunk rows inside ONE step — rows attend
each other's same-step KV writes through the global-position causal mask, and
the rows are dp-sharded, so a single long prompt spreads across the mesh.
These tests pin down that SP changes scheduling only, never tokens.
"""

import numpy as np
import pytest

from tests.test_sharding import TINY_MOE, greedy_tokens
from glm4_moe_nano_vllm_tpu.config import Config
from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.parallel.sharding import make_mesh

rng = np.random.default_rng(7)
LONG_PROMPTS = [
    rng.integers(1, 100, size=n).tolist() for n in (40, 17, 53, 64)
]


def make_runner_sp(sp_degree, mesh=None, prefix_cache=True):
    cfg = Config(
        model="", model_config=TINY_MOE, max_num_seqs=16, max_model_len=128,
        kvcache_block_size=16, num_kvcache_blocks=128, prefill_chunk_size=16,
        enforce_eager=True, dtype="float32", kv_cache_dtype="float32",
        decode_buckets=(4,), prefill_seq_buckets=(2, 4, 8, 16),
        prefill_len_buckets=(16,), prefill_sp_degree=sp_degree,
        enable_prefix_caching=prefix_cache,
    )
    return ModelRunner(cfg, mesh=mesh), Scheduler(cfg)


@pytest.mark.slow
def test_sp_prefill_matches_sequential_chunks():
    r1, s1 = make_runner_sp(sp_degree=1)
    base = greedy_tokens(r1, s1, LONG_PROMPTS)

    r2, s2 = make_runner_sp(sp_degree=4)
    sp = greedy_tokens(r2, s2, LONG_PROMPTS)
    assert base == sp


def test_sp_prefill_single_step_whole_prompt():
    """With enough degree, one step prefills the entire prompt."""
    r, s = make_runner_sp(sp_degree=4)
    from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
    from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

    seq = Sequence(LONG_PROMPTS[0],  # 40 tokens, chunk 16 → 3 rows
                   SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True))
    s.add(seq)
    batch = s.schedule()
    assert batch.is_prefill and len(batch.seqs) == 3
    assert batch.q_lens == [16, 16, 8]
    assert batch.q_starts == [0, 16, 32]
    s.postprocess(batch, r.run(batch))
    assert seq.num_computed_tokens == 40  # whole prompt in one step
    assert seq.num_completion_tokens == 1  # plus the sampled first token


@pytest.mark.slow
@pytest.mark.parametrize("dp,tp", [(4, 1), (2, 2)])
def test_sp_prefill_on_dp_mesh(dp, tp):
    """SP rows shard over dp: same tokens as single device."""
    r1, s1 = make_runner_sp(sp_degree=1)
    base = greedy_tokens(r1, s1, LONG_PROMPTS)

    mesh = make_mesh(dp=dp, tp=tp)
    r2, s2 = make_runner_sp(sp_degree=4, mesh=mesh)
    sp = greedy_tokens(r2, s2, LONG_PROMPTS)
    assert base == sp


def test_sp_prefill_with_prefix_cache_rerun():
    """Second run of the same prompts hits the prefix cache under SP."""
    r, s = make_runner_sp(sp_degree=4)
    first = greedy_tokens(r, s, LONG_PROMPTS)
    second = greedy_tokens(r, s, LONG_PROMPTS)
    assert first == second
