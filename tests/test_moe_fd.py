"""Parity tests for the fused-dispatch MoE kernel (ops/moe_fd_pallas.py)
against the XLA dequant oracle, in Pallas interpret mode on CPU.

Mirrors the reference's layerwise-equivalence strategy
(`/root/reference/nanovllm/examples/linear_test.py`) hermetically: random
AWQ-quantized experts, oracle = dequantize + per-token loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glm4_moe_nano_vllm_tpu.ops.moe_fd_pallas import moe_fused_dispatch
from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize

from tests.test_moe_sorted_fused import _oracle, _qdict


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("t,e,k", [(16, 8, 2), (8, 8, 8), (13, 8, 2)])
def test_fd_parity(int8, t, e, k):
    rng = np.random.default_rng(0)
    h, im = 128, 192  # KG not a multiple of 8 for im (192/64=3): pad path
    wg = _qdict(rng, e, h, im, int8=int8)
    wu = _qdict(rng, e, h, im, int8=int8)
    wd = _qdict(rng, e, im, h, int8=int8)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.bfloat16)
    idx = np.stack([rng.permutation(e)[:k] for _ in range(t)])
    w = rng.random((t, k)).astype(np.float32)
    out = moe_fused_dispatch(x, jnp.asarray(idx, jnp.int32), jnp.asarray(w),
                             wg, wu, wd, interpret=True)
    ref = _oracle(x, idx, w, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.05, atol=0.02)


def test_fd_layer_stacked_skew_and_empty_experts():
    """Layer-stacked weights + heavily skewed routing (multi-chunk spans +
    empty experts)."""
    rng = np.random.default_rng(1)
    t, e, k, h, im, layers = 32, 4, 2, 128, 128, 3
    wg = _qdict(rng, e, h, im, layers=layers)
    wu = _qdict(rng, e, h, im, layers=layers)
    wd = _qdict(rng, e, im, h, layers=layers)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.bfloat16)
    idx = np.where(rng.random((t, k)) < 0.8, 0,
                   rng.choice([1, 3], size=(t, k)))
    idx[:, 1] = np.where(idx[:, 1] == idx[:, 0],
                         (idx[:, 1] + 1) % e, idx[:, 1])
    w = rng.random((t, k)).astype(np.float32)
    for li in range(layers):
        out = moe_fused_dispatch(
            x, jnp.asarray(idx, jnp.int32), jnp.asarray(w), wg, wu, wd,
            layer_idx=jnp.asarray(li, jnp.int32), interpret=True,
        )
        wl = {
            kk: {p: v[li] for p, v in d.items()}
            for kk, d in (("g", wg), ("u", wu), ("d", wd))
        }
        ref = _oracle(x, idx, w, wl["g"], wl["u"], wl["d"])
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   rtol=0.05, atol=0.02)


def test_fd_shared_expert_fused():
    """The shared expert rides the kernel at combine weight 1.0."""
    rng = np.random.default_rng(2)
    t, e, k, h, im = 16, 8, 4, 128, 128
    wg = _qdict(rng, e, h, im)
    wu = _qdict(rng, e, h, im)
    wd = _qdict(rng, e, im, h)
    sg = _qdict(rng, 1, h, im)
    su = _qdict(rng, 1, h, im)
    sd = _qdict(rng, 1, im, h)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.bfloat16)
    idx = np.stack([rng.permutation(e)[:k] for _ in range(t)])
    w = rng.random((t, k)).astype(np.float32)

    def strip_e(d):  # [1, K, N] expert stacks -> [K, N] shared-expert dicts
        return {kk: v[0] for kk, v in d.items()}

    out = moe_fused_dispatch(
        x, jnp.asarray(idx, jnp.int32), jnp.asarray(w), wg, wu, wd,
        shared=(strip_e(sg), strip_e(su), strip_e(sd)), interpret=True,
    )
    ref = _oracle(x, idx, w, wg, wu, wd)
    ones = np.ones((t, 1), np.float32)
    zer = np.zeros((t, 1), np.int64)
    ref += _oracle(x, zer, ones, sg, su, sd)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.05, atol=0.04)


def test_fd_sentinel_assignments_dropped():
    """Index == E rows (EP non-local assignments) contribute nothing."""
    rng = np.random.default_rng(4)
    t, e, k, h, im = 16, 4, 4, 128, 128
    wg = _qdict(rng, e, h, im)
    wu = _qdict(rng, e, h, im)
    wd = _qdict(rng, e, im, h)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.bfloat16)
    idx = np.stack([rng.permutation(e)[:k] for _ in range(t)])
    w = rng.random((t, k)).astype(np.float32)
    # drop half the assignments: sentinel id + zero weight
    drop = rng.random((t, k)) < 0.5
    idx_s = np.where(drop, e, idx)
    w_s = np.where(drop, 0.0, w).astype(np.float32)
    out = moe_fused_dispatch(x, jnp.asarray(idx_s, jnp.int32),
                             jnp.asarray(w_s), wg, wu, wd, interpret=True)
    ref = _oracle(x, np.where(drop, 0, idx), w_s, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.05, atol=0.02)


def test_fd_policy_bounds():
    """The VMEM-residency policy admits decode shapes and rejects prefill
    chunks."""
    import os

    from glm4_moe_nano_vllm_tpu.ops.moe import use_fused_dispatch

    rng = np.random.default_rng(5)
    wg = _qdict(rng, 8, 128, 128)
    os.environ["NVT_FUSED_MOE_INTERPRET"] = "1"
    try:
        assert use_fused_dispatch(128, wg, 8)
        assert use_fused_dispatch(256, wg, 8)
        assert not use_fused_dispatch(4096, wg, 8)  # prefill chunk
    finally:
        del os.environ["NVT_FUSED_MOE_INTERPRET"]


def test_fd_hot_expert_scratch_path_parity(monkeypatch):
    """ALL tokens on one expert with TM pinned to 16: the 64-row span is 4
    TM chunks — the hot-expert/skewed-routing case (multi-chunk fori_loop
    over one expert's span); output must match the oracle. (Two
    chunk-restructuring optimizations for this case were measured and
    reverted, ARCHITECTURE.md "Routing-skew cost"; this test pins the
    multi-chunk path's correctness either way.)"""
    monkeypatch.setenv("NVT_FD_TM", "16")
    rng = np.random.default_rng(3)
    t, e, k, h, im = 64, 4, 2, 128, 128
    wg = _qdict(rng, e, h, im)
    wu = _qdict(rng, e, h, im)
    wd = _qdict(rng, e, im, h)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.bfloat16)
    idx = np.tile(np.array([0, 1]), (t, 1))  # expert 0 + 1 for every token
    w = rng.random((t, k)).astype(np.float32)
    out = moe_fused_dispatch(x, jnp.asarray(idx, jnp.int32), jnp.asarray(w),
                             wg, wu, wd, interpret=True)
    ref = _oracle(x, idx, w, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.05, atol=0.02)
