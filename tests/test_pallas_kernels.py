"""Pallas kernel correctness vs the XLA reference oracle (interpret mode).

Mirrors the reference's hermetic kernel test approach
(`/root/reference/nanovllm/examples/linear_test.py`): random data, trusted
reference implementation, tolerance comparison. Compiled-mode validation on
the real chip happens in examples/kernel_check_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glm4_moe_nano_vllm_tpu.ops.attention_ref import paged_attention_ref
from glm4_moe_nano_vllm_tpu.ops.kv_cache import write_kv
from glm4_moe_nano_vllm_tpu.ops.paged_attention_pallas import paged_attention_decode
from glm4_moe_nano_vllm_tpu.ops.prefill_pallas import paged_prefill

BS = 16  # kv block size
D = 128


def make_cache(rng, hkv, nb):
    k = jnp.asarray(rng.normal(size=(hkv, nb, BS, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(hkv, nb, BS, D)), jnp.float32)
    return k, v


def random_block_tables(rng, b, maxb, nb):
    """Disjoint random block assignments per sequence."""
    perm = rng.permutation(nb)[: b * maxb].reshape(b, maxb)
    return jnp.asarray(perm, jnp.int32)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_decode_kernel_matches_ref(hq, hkv):
    rng = np.random.default_rng(0)
    b, nb, maxb = 4, 64, 4
    k_cache, v_cache = make_cache(rng, hkv, nb)
    bt = random_block_tables(rng, b, maxb, nb)
    ctx = jnp.asarray([1, BS, 2 * BS + 3, maxb * BS], jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, 1, hq, D)), jnp.float32)
    positions = (ctx - 1)[:, None]

    ref = paged_attention_ref(q, k_cache, v_cache, bt, ctx, positions, 0.125)
    out = paged_attention_decode(
        q[:, 0], k_cache, v_cache, bt, ctx, 0.125, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, 0]),
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_padded_seq_is_zero():
    rng = np.random.default_rng(1)
    hq = hkv = 2
    b, nb, maxb = 2, 16, 2
    k_cache, v_cache = make_cache(rng, hkv, nb)
    bt = random_block_tables(rng, b, maxb, nb)
    ctx = jnp.asarray([BS, 0], jnp.int32)  # seq 1 is padding
    q = jnp.asarray(rng.normal(size=(b, hq, D)), jnp.float32)
    out = paged_attention_decode(q, k_cache, v_cache, bt, ctx, 0.125, interpret=True)
    assert np.all(np.asarray(out[1]) == 0)
    assert np.all(np.isfinite(np.asarray(out[0])))


@pytest.mark.parametrize("hq,hkv,sq", [(4, 2, 8), (2, 2, 32)])
def test_prefill_kernel_matches_ref(hq, hkv, sq):
    """Fresh prefill (q_start = 0) and chunked prefill (q_start > 0)."""
    rng = np.random.default_rng(2)
    b, nb, maxb = 3, 64, 4
    k_cache, v_cache = make_cache(rng, hkv, nb)
    bt = random_block_tables(rng, b, maxb, nb)
    # seq 0: fresh prefill q_len = sq; seq 1: chunk with cached prefix;
    # seq 2: q_len < sq (padded rows)
    q_lens = jnp.asarray([sq, sq, max(1, sq // 3)], jnp.int32)
    q_start = jnp.asarray([0, 17, 5], jnp.int32)
    ctx = q_start + q_lens
    assert int(jnp.max(ctx)) <= maxb * BS

    q = jnp.asarray(rng.normal(size=(b, sq, hq, D)), jnp.float32)
    pos_idx = jnp.arange(sq, dtype=jnp.int32)[None, :]
    positions = jnp.where(pos_idx < q_lens[:, None], q_start[:, None] + pos_idx, 0)

    ref = paged_attention_ref(q, k_cache, v_cache, bt, ctx, positions, 0.125)
    out = paged_prefill(
        q, k_cache, v_cache, bt, ctx, q_lens, 0.125, interpret=True
    )
    # compare only real rows (padded rows are 0 in kernel, garbage in ref)
    for i in range(b):
        ql = int(q_lens[i])
        np.testing.assert_allclose(
            np.asarray(out[i, :ql]), np.asarray(ref[i, :ql]),
            rtol=2e-5, atol=2e-5, err_msg=f"seq {i}",
        )
        assert np.all(np.asarray(out[i, ql:]) == 0)


def test_write_then_attend_roundtrip():
    """Scatter new KV then decode-attend over it: the model's actual flow."""
    rng = np.random.default_rng(3)
    hq = hkv = 2
    b, nb = 2, 8
    k_cache = jnp.zeros((hkv, nb, BS, D), jnp.float32)
    v_cache = jnp.zeros((hkv, nb, BS, D), jnp.float32)
    bt = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    ctx = jnp.asarray([5, 20], jnp.int32)
    # write each sequence's context tokens into its blocks
    slots, ks, vs = [], [], []
    for i in range(b):
        for p in range(int(ctx[i])):
            blk = int(bt[i, p // BS])
            slots.append(blk * BS + p % BS)
    t = len(slots)
    k_new = jnp.asarray(rng.normal(size=(t, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(t, hkv, D)), jnp.float32)
    k_cache, v_cache = write_kv(k_cache, v_cache, k_new, v_new,
                                jnp.asarray(slots, jnp.int32))
    q = jnp.asarray(rng.normal(size=(b, 1, hq, D)), jnp.float32)
    positions = (ctx - 1)[:, None]
    ref = paged_attention_ref(q, k_cache, v_cache, bt, ctx, positions, 0.125)
    out = paged_attention_decode(q[:, 0], k_cache, v_cache, bt, ctx, 0.125,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, 0]),
                               rtol=2e-5, atol=2e-5)


def test_write_kv_slot_minus_one_is_noop():
    k_cache = jnp.ones((2, 4, BS, D), jnp.float32)
    v_cache = jnp.ones((2, 4, BS, D), jnp.float32)
    k_new = jnp.full((3, 2, D), 7.0)
    v_new = jnp.full((3, 2, D), 9.0)
    slots = jnp.asarray([-1, 5, -1], jnp.int32)
    k2, v2 = write_kv(k_cache, v_cache, k_new, v_new, slots)
    assert float(k2.reshape(2, -1, D)[0, 5, 0]) == 7.0
    # everything else untouched
    mask = np.ones((2, 4 * BS), bool)
    mask[:, 5] = False
    assert np.all(np.asarray(k2.reshape(2, -1, D))[mask] == 1.0)
