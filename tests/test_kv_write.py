"""Pallas KV-write kernel vs the XLA scatter oracle (interpret mode).

The kernel replaces the reference's ``store_kvcache_kernel`` Triton scatter
(`/root/reference/nanovllm/layers/attention.py:10-42`) with an in-place
read-modify-write over paged blocks (ops/kv_write_pallas.py). These tests pin
the write plan against the slot-mapping oracle across the shapes the engine
produces: chunked prefill (block-misaligned starts), decode (q=1), padded
rows (q=0), and SP sibling chunks sharing a boundary block.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glm4_moe_nano_vllm_tpu.ops.kv_cache import write_kv
from glm4_moe_nano_vllm_tpu.ops.kv_write_pallas import plan_kv_writes, write_kv_pallas

D = 128


def oracle_slots(starts, qs, bt, bs, s):
    b = len(starts)
    slots = np.full((b, s), -1, np.int64)
    for i in range(b):
        for r in range(qs[i]):
            p = starts[i] + r
            slots[i, r] = int(bt[i, p // bs]) * bs + p % bs
    return jnp.asarray(slots.reshape(-1), jnp.int32)


def run_both(starts, qs, s, hkv=4, nb=32, bs=16, seed=0):
    rng = np.random.default_rng(seed)
    b = len(starts)
    k_cache = jnp.asarray(rng.normal(size=(hkv, nb, bs, D)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(hkv, nb, bs, D)), jnp.float32)
    maxb = nb // b
    bt = jnp.asarray(rng.permutation(nb)[: b * maxb].reshape(b, maxb), jnp.int32)
    k_new = jnp.asarray(rng.normal(size=(b * s, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(b * s, hkv, D)), jnp.float32)
    starts = np.asarray(starts, np.int32)
    qs = np.asarray(qs, np.int32)
    ref = write_kv(k_cache, v_cache, k_new, v_new, oracle_slots(starts, qs, bt, bs, s))
    out = write_kv_pallas(
        k_cache, v_cache, k_new, v_new, bt,
        jnp.asarray(starts), jnp.asarray(starts + qs), interpret=True,
    )
    return ref, out


@pytest.mark.parametrize(
    "starts,qs,s",
    [
        ([0, 7, 30, 0], [24, 17, 24, 0], 24),  # misaligned chunked prefill + pad row
        ([5, 16, 31, 0], [1, 1, 1, 0], 1),  # decode
        ([0, 16, 32, 48], [16, 16, 16, 16], 16),  # SP siblings sharing block edges
        ([3, 3, 3, 3], [0, 0, 0, 0], 8),  # all-padded batch: no writes at all
    ],
)
def test_write_kernel_matches_oracle(starts, qs, s):
    (kr, vr), (kp, vp) = run_both(starts, qs, s)
    np.testing.assert_array_equal(np.asarray(kr), np.asarray(kp))
    np.testing.assert_array_equal(np.asarray(vr), np.asarray(vp))


def test_sp_siblings_block_aligned():
    """Block-aligned sibling rows of one prompt (the contract the scheduler
    guarantees: same-step rows never share a KV block — see the
    prefill_sp_degree assert in config.py and emit_rows' rounding)."""
    rng = np.random.default_rng(3)
    hkv, nb, bs, s = 2, 8, 16, 16
    k_cache = jnp.asarray(rng.normal(size=(hkv, nb, bs, D)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(hkv, nb, bs, D)), jnp.float32)
    table = jnp.asarray([[2, 5, 7], [2, 5, 7]], jnp.int32)  # same seq: same table
    k_new = jnp.asarray(rng.normal(size=(2 * s, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(2 * s, hkv, D)), jnp.float32)
    starts = np.asarray([0, 16], np.int32)
    qs = np.asarray([16, 16], np.int32)
    ref = write_kv(k_cache, v_cache, k_new, v_new,
                   oracle_slots(starts, qs, table, bs, s))
    out = write_kv_pallas(k_cache, v_cache, k_new, v_new, table,
                          jnp.asarray(starts), jnp.asarray(starts + qs),
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))


def test_scheduler_aligns_sp_chunks():
    """Under SP, a budget-clipped non-final chunk is rounded down to a block
    boundary so same-step sibling rows never share a block."""
    from glm4_moe_nano_vllm_tpu.config import Config
    from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
    from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
    from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams
    from tests.test_sharding import TINY_MOE

    cfg = Config(model="", model_config=TINY_MOE, max_num_seqs=8,
                 max_model_len=128, kvcache_block_size=16,
                 num_kvcache_blocks=64, prefill_chunk_size=32,
                 max_num_batched_tokens=40,  # clips the second row to 8 < 16
                 prefill_sp_degree=4, enforce_eager=True, dtype="float32")
    s = Scheduler(cfg)
    s.add(Sequence(list(range(1, 101)),
                   SamplingParams(temperature=0.0, max_tokens=1)))
    batch = s.schedule()
    # 40-token budget: row0 = 32 (full chunk), row1 clipped 8 -> 0, dropped
    assert batch.q_lens == [32]
    for q, st in zip(batch.q_lens[:-1], batch.q_starts[:-1]):
        assert (st + q) % 16 == 0


def test_plan_kv_writes_shapes():
    g, lo, hi, src0 = plan_kv_writes(
        jnp.asarray([0, 7], jnp.int32), jnp.asarray([24, 24], jnp.int32),
        s=24, block_size=16,
    )
    assert g.shape == (2, 3)  # 24 tokens can straddle 3 16-blocks
    # row 0: [0,24) -> blocks 0 rows [0,16), 1 rows [0,8)
    assert g[0, 0] == 0 and lo[0, 0] == 0 and hi[0, 0] == 16
    assert g[0, 1] == 1 and lo[0, 1] == 0 and hi[0, 1] == 8
    assert g[0, 2] == -1
    # row 1: [7,24) -> block 0 rows [7,16), block 1 rows [0,8)
    assert g[1, 0] == 0 and lo[1, 0] == 7 and hi[1, 0] == 16
    assert src0[1, 0] == 24  # first token of row 1 in the flat [B*s] rows
