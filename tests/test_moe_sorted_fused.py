"""Parity tests for the fused sorted-dispatch MoE kernel
(ops/moe_sorted_fused_pallas.py) against the XLA dequant oracle, in Pallas
interpret mode on CPU.

Mirrors the reference's layerwise-equivalence strategy
(`/root/reference/nanovllm/examples/linear_test.py`) hermetically: random
AWQ-quantized experts, oracle = dequantize + per-token loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glm4_moe_nano_vllm_tpu.ops import quant
from glm4_moe_nano_vllm_tpu.ops.moe_sorted_fused_pallas import (
    moe_sorted_fused,
)
from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize


def _qdict(rng, e, k, n, g=64, int8=False, layers=None):
    shape_l = (layers,) if layers else ()
    qws, zps, scs = [], [], []
    for _ in range(int(np.prod(shape_l or (1,))) * e):
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
        if int8:
            qw, sc = quant.quantize_int8(w, g)
            qws.append(qw), scs.append(sc.astype(np.float32))
        else:
            qw, qz, sc = quant.quantize_awq(w, g)
            qw2, zp2, sc2 = quant.repack_awq_for_tpu(qw, qz, sc)
            qws.append(qw2), zps.append(zp2), scs.append(sc2)

    def st(a):
        return jnp.asarray(np.stack(a).reshape(*shape_l, e, *a[0].shape))

    d = {"qw": st(qws), "scale": st(scs)}
    if not int8:
        d["zp"] = st(zps)
    return d


def _oracle(x, topk_idx, topk_w, w_gate, w_up, w_down):
    """Dense-weights oracle in f32: silu(x@g) * (x@u) @ d per assignment."""
    wg = dequantize(w_gate, jnp.float32)
    wu = dequantize(w_up, jnp.float32)
    wd = dequantize(w_down, jnp.float32)
    t, k = topk_idx.shape
    out = np.zeros((t, x.shape[1]), np.float32)
    xf = np.asarray(x, np.float32)
    for ti in range(t):
        for kk in range(k):
            ei = int(topk_idx[ti, kk])
            g = xf[ti] @ np.asarray(wg[ei])
            u = xf[ti] @ np.asarray(wu[ei])
            h = (g / (1 + np.exp(-g))) * u
            out[ti] += float(topk_w[ti, kk]) * (h @ np.asarray(wd[ei]))
    return out


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("t,e,k", [(16, 8, 2), (8, 8, 8)])
def test_sorted_fused_parity(int8, t, e, k):
    rng = np.random.default_rng(0)
    h, im = 128, 192  # KG not a multiple of 8 for im (192/64=3): pad path
    wg = _qdict(rng, e, h, im, int8=int8)
    wu = _qdict(rng, e, h, im, int8=int8)
    wd = _qdict(rng, e, im, h, int8=int8)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.bfloat16)
    idx = np.stack([rng.permutation(e)[:k] for _ in range(t)])
    w = rng.random((t, k)).astype(np.float32)
    out = moe_sorted_fused(x, jnp.asarray(idx, jnp.int32), jnp.asarray(w),
                           wg, wu, wd, interpret=True)
    ref = _oracle(x, idx, w, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.05, atol=0.02)


def test_sorted_fused_layer_stacked_and_skew():
    """Layer-stacked weights + heavily skewed routing (multi-chunk spans +
    empty experts)."""
    rng = np.random.default_rng(1)
    t, e, k, h, im, layers = 32, 4, 2, 128, 128, 3
    wg = _qdict(rng, e, h, im, layers=layers)
    wu = _qdict(rng, e, h, im, layers=layers)
    wd = _qdict(rng, e, im, h, layers=layers)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.bfloat16)
    # expert 0 hot (most tokens), expert 2 empty
    idx = np.where(rng.random((t, k)) < 0.8, 0,
                   rng.choice([1, 3], size=(t, k)))
    idx[:, 1] = np.where(idx[:, 1] == idx[:, 0],
                         (idx[:, 1] + 1) % e, idx[:, 1])
    w = rng.random((t, k)).astype(np.float32)
    for li in range(layers):
        out = moe_sorted_fused(
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


def test_quant_group_with_prepadded_scale_rows():
    """Engine init pads zp/scale KG rows to the sublane tiling once and the
    kernels receive the true group via quant_group — padded rows must never
    be read (trace-time padding measured 5.8 ms per Air decode step)."""
    rng = np.random.default_rng(3)
    t, e, k, h, im, g = 12, 4, 2, 128, 192, 64  # KG(im)=3 -> pad to 8
    wg = _qdict(rng, e, h, im, g=g)
    wu = _qdict(rng, e, h, im, g=g)
    wd = _qdict(rng, e, im, h, g=g)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.bfloat16)
    idx = np.stack([rng.permutation(e)[:k] for _ in range(t)])
    w = rng.random((t, k)).astype(np.float32)
    want = moe_sorted_fused(x, jnp.asarray(idx, jnp.int32), jnp.asarray(w),
                            wg, wu, wd, interpret=True)

    def pad(d):
        out = dict(d)
        for leaf in ("zp", "scale"):
            arr = d[leaf]
            kg = arr.shape[-2]
            p = [(0, 0)] * arr.ndim
            p[-2] = (0, -(-kg // 8) * 8 - kg)
            out[leaf] = jnp.pad(arr, p)
        return out

    got = moe_sorted_fused(x, jnp.asarray(idx, jnp.int32), jnp.asarray(w),
                           pad(wg), pad(wu), pad(wd), quant_group=g,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-6, atol=1e-6)

    # dequantize() honors explicit group_size on padded dicts too
    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize

    np.testing.assert_array_equal(
        np.asarray(dequantize(pad(wd), jnp.float32, group_size=g)),
        np.asarray(dequantize(wd, jnp.float32)),
    )
