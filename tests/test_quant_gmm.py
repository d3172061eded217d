"""Fused INT4 grouped-matmul kernel vs the dequantize+ragged_dot oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from glm4_moe_nano_vllm_tpu.ops.quant import pack_rows_u8
from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_gmm
from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize

import jax


def make_quant_stack(rng, e, k, n, g):
    qw_n = rng.integers(0, 16, size=(e, k, n)).astype(np.uint8)
    zp = rng.integers(0, 16, size=(e, k // g, n)).astype(np.uint8)
    scale = (np.abs(rng.normal(size=(e, k // g, n))) * 0.02 + 0.001).astype(np.float32)
    qp = {
        "qw": jnp.asarray(pack_rows_u8(qw_n, g)),
        "zp": jnp.asarray(zp),
        "scale": jnp.asarray(scale),
    }
    return qp


@pytest.mark.parametrize(
    "e,m,k,n,g,sizes",
    [
        (1, 16, 256, 128, 128, None),  # dense-equivalent
        (4, 64, 256, 128, 64, [10, 0, 37, 17]),  # zero-size group
        (8, 200, 128, 256, 32, None),  # random sizes
    ],
)
def test_quant_gmm_matches_oracle(e, m, k, n, g, sizes):
    rng = np.random.default_rng(0)
    qp = make_quant_stack(rng, e, k, n, g)
    if sizes is None:
        cuts = np.sort(rng.integers(0, m + 1, size=e - 1)) if e > 1 else []
        sizes = np.diff(np.concatenate([[0], cuts, [m]]))
    gs = jnp.asarray(np.asarray(sizes, np.int32))
    assert int(gs.sum()) == m
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)

    ref = jax.lax.ragged_dot(x, dequantize(qp, jnp.float32), gs)
    got = quant_gmm(x, qp["qw"], qp["zp"], qp["scale"], gs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def make_int8_stack(rng, e, k, n, g):
    qw = rng.integers(-127, 128, size=(e, k, n)).astype(np.int8)
    scale = (np.abs(rng.normal(size=(e, k // g, n))) * 0.003 + 1e-4).astype(np.float32)
    return {"qw": jnp.asarray(qw), "scale": jnp.asarray(scale)}


@pytest.mark.parametrize(
    "e,m,k,n,g,sizes",
    [
        (1, 16, 256, 128, 128, None),  # dense-equivalent
        (4, 64, 256, 128, 64, [10, 0, 37, 17]),  # zero-size group
        (8, 200, 128, 256, 32, None),  # random sizes
    ],
)
def test_quant_gmm_int8_matches_oracle(e, m, k, n, g, sizes):
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_gmm_int8

    rng = np.random.default_rng(3)
    qp = make_int8_stack(rng, e, k, n, g)
    if sizes is None:
        cuts = np.sort(rng.integers(0, m + 1, size=e - 1)) if e > 1 else []
        sizes = np.diff(np.concatenate([[0], cuts, [m]]))
    gs = jnp.asarray(np.asarray(sizes, np.int32))
    assert int(gs.sum()) == m
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)

    ref = jax.lax.ragged_dot(x, dequantize(qp, jnp.float32), gs)
    got = quant_gmm_int8(x, qp["qw"], qp["scale"], gs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_quant_gmm_int8_pair_matches_singles():
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import (
        quant_gmm_int8,
        quant_gmm_int8_pair,
    )

    rng = np.random.default_rng(9)
    e, m, k, n, g = 4, 96, 128, 256, 64
    qa = make_int8_stack(rng, e, k, n, g)
    qb = make_int8_stack(rng, e, k, n, g)
    gs = jnp.asarray([40, 0, 16, 40], jnp.int32)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    ga = quant_gmm_int8(x, qa["qw"], qa["scale"], gs, interpret=True)
    gb = quant_gmm_int8(x, qb["qw"], qb["scale"], gs, interpret=True)
    pa, pb = quant_gmm_int8_pair(x, qa["qw"], qa["scale"],
                                 qb["qw"], qb["scale"], gs, interpret=True)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(ga), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(gb), rtol=1e-5, atol=1e-5)


def test_quant_gmm_pair_matches_singles():
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_gmm_pair

    rng = np.random.default_rng(7)
    e, m, k, n, g = 4, 96, 128, 256, 64
    qa = make_quant_stack(rng, e, k, n, g)
    qb = make_quant_stack(rng, e, k, n, g)
    gs = jnp.asarray([40, 0, 16, 40], jnp.int32)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    ga = quant_gmm(x, qa["qw"], qa["zp"], qa["scale"], gs, interpret=True)
    gb = quant_gmm(x, qb["qw"], qb["zp"], qb["scale"], gs, interpret=True)
    pa, pb = quant_gmm_pair(x, qa["qw"], qa["zp"], qa["scale"],
                            qb["qw"], qb["zp"], qb["scale"], gs, interpret=True)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(ga), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(gb), rtol=1e-5, atol=1e-5)


def test_quant_moe_experts_dense_matches_dequant_oracle():
    """Broadcast-lhs dense-mode MoE (decode fast path): every expert runs all
    tokens; gate+up in broadcast mode, down over the expert-contiguous
    intermediate. Oracle = dequantized dense einsums."""
    from glm4_moe_nano_vllm_tpu.layers.activation import silu_and_mul
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_moe_experts_dense
    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize

    rng = np.random.default_rng(11)
    e, t, h, i, g = 4, 24, 256, 128, 128
    qg_ = make_quant_stack(rng, e, h, i, g)
    qu_ = make_quant_stack(rng, e, h, i, g)
    qd_ = make_quant_stack(rng, e, i, h, g)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.float32)
    out = quant_moe_experts_dense(x, qg_, qu_, qd_, interpret=True)  # [E,T,H]
    wg = dequantize(qg_, jnp.float32)
    wu = dequantize(qu_, jnp.float32)
    wd = dequantize(qd_, jnp.float32)
    hh = silu_and_mul(jnp.einsum("th,ehi->tei", x, wg),
                      jnp.einsum("th,ehi->tei", x, wu))
    ref = jnp.einsum("tei,eih->eth", hh, wd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gmm_bf16_matches_ragged_dot():
    """Full-precision GMM mode (n_w=1) vs jax.lax.ragged_dot."""
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import gmm_bf16, gmm_bf16_pair

    rng = np.random.default_rng(5)
    e, m, k, n = 4, 96, 256, 256
    w = jnp.asarray(rng.normal(size=(e, k, n)), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(e, k, n)), jnp.float32)
    gs = jnp.asarray([40, 0, 16, 40], jnp.int32)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    ref_a = jax.lax.ragged_dot(x, w, gs)
    ref_b = jax.lax.ragged_dot(x, wb, gs)
    np.testing.assert_allclose(np.asarray(gmm_bf16(x, w, gs, interpret=True)),
                               np.asarray(ref_a), rtol=1e-4, atol=1e-4)
    pa, pb = gmm_bf16_pair(x, w, wb, gs, interpret=True)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(ref_a), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(ref_b), rtol=1e-4, atol=1e-4)


# ---- v2 grouped kernel (quant_gmm2_pallas) -----------------------------------

def _qdict_stack(rng, e, k, n, g=16):
    from glm4_moe_nano_vllm_tpu.ops import quant

    qws, zps, scs = [], [], []
    for _ in range(e):
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        qw, qz, sc = quant.quantize_awq(w, g)
        a, b, c = quant.repack_awq_for_tpu(qw, qz, sc)
        qws.append(a), zps.append(b), scs.append(c)
    return {"qw": jnp.asarray(np.stack(qws)), "zp": jnp.asarray(np.stack(zps)),
            "scale": jnp.asarray(np.stack(scs), jnp.float32)}


@pytest.mark.parametrize("sizes", [[5, 0, 300, 11], [0, 0, 7, 1],
                                   [256, 256, 256, 256], [1, 2, 3, 4]])
def test_quant_gmm2_matches_dequant(sizes):
    """v2 kernel (interpret mode) == per-group dequantize-then-dot, incl.
    empty groups, sub-tile groups, and tile-straddling trailing chunks."""
    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm2_pallas import (
        quant_gmm2,
        quant_gmm2_pair,
    )

    rng = np.random.default_rng(3)
    e, k, n = 4, 64, 96
    m = sum(sizes)
    gs = jnp.asarray(sizes, jnp.int32)
    lhs = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    qa, qb = _qdict_stack(rng, e, k, n), _qdict_stack(rng, e, k, n)
    got = np.asarray(quant_gmm2(lhs, qa, gs, interpret=True))
    wa = np.asarray(dequantize(qa, jnp.float32))
    want = np.zeros((m, n), np.float32)
    off = 0
    for ei, c in enumerate(sizes):
        want[off:off + c] = np.asarray(lhs)[off:off + c] @ wa[ei]
        off += c
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    ga, _ = quant_gmm2_pair(lhs, qa, qb, gs, interpret=True)
    np.testing.assert_allclose(np.asarray(ga), want, rtol=2e-5, atol=2e-5)


def test_quant_gmm2_layer_stacked_chain():
    """Layer-stacked weights selected in-kernel (scalar prefetch) — the
    chain API the MoE sorted path uses."""
    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm2_pallas import (
        make_layout,
        quant_gmm2_chain,
        scatter_rows,
    )

    rng = np.random.default_rng(5)
    ll, e, k, n = 3, 4, 64, 96
    sizes = [9, 40, 0, 17]
    m = sum(sizes)
    gs = jnp.asarray(sizes, jnp.int32)
    lhs = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    qs = [_qdict_stack(rng, e, k, n) for _ in range(ll)]
    stacked = {kk: jnp.stack([q[kk] for q in qs]) for kk in qs[0]}

    layout = make_layout(gs, m)
    src = scatter_rows(jnp.arange(m, dtype=jnp.int32), layout)
    lhs8 = jnp.take(lhs, src, axis=0)
    for li in range(ll):
        (o8,) = quant_gmm2_chain(lhs8, [stacked], layout,
                                 layer_idx=jnp.int32(li), interpret=True)
        got = np.asarray(jnp.take(o8, layout.dst8, axis=0))
        w = np.asarray(dequantize(qs[li], jnp.float32))
        want = np.zeros((m, n), np.float32)
        off = 0
        for ei, c in enumerate(sizes):
            want[off:off + c] = np.asarray(lhs)[off:off + c] @ w[ei]
            off += c
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_quant_gmm2_multi_ntile_skip_x():
    """n > 512 => 2 N-tiles: exercises the decode-shape skip_x lhs-reuse
    fast path (nchunks==1, program_id(1)>0 reuses the VMEM-resident rows)
    and its semaphore balancing — ADVICE r2: previously untested (test
    shapes all picked tn==n)."""
    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm2_pallas import quant_gmm2

    rng = np.random.default_rng(7)
    e, k, n = 4, 64, 1024  # tn=512 -> 2 N-tiles per expert
    sizes = [8, 0, 16, 3]  # decode-sized groups: nchunks==1 everywhere
    m = sum(sizes)
    gs = jnp.asarray(sizes, jnp.int32)
    lhs = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    qa = _qdict_stack(rng, e, k, n)
    got = np.asarray(quant_gmm2(lhs, qa, gs, interpret=True))
    wa = np.asarray(dequantize(qa, jnp.float32))
    want = np.zeros((m, n), np.float32)
    off = 0
    for ei, c in enumerate(sizes):
        want[off:off + c] = np.asarray(lhs)[off:off + c] @ wa[ei]
        off += c
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # mixed: one multi-chunk group (skip_x must NOT engage for it)
    sizes2 = [70, 2, 0, 9]
    m2 = sum(sizes2)
    gs2 = jnp.asarray(sizes2, jnp.int32)
    lhs2 = jnp.asarray(rng.normal(size=(m2, k)), jnp.float32)
    got2 = np.asarray(quant_gmm2(lhs2, qa, gs2, interpret=True))
    want2 = np.zeros((m2, n), np.float32)
    off = 0
    for ei, c in enumerate(sizes2):
        want2[off:off + c] = np.asarray(lhs2)[off:off + c] @ wa[ei]
        off += c
    np.testing.assert_allclose(got2, want2, rtol=2e-5, atol=2e-5)


def test_int8_gmm_unaligned_kg():
    """Im=1408-class K (KG=11, not a multiple of the 8-sublane tiling):
    the int8 v1 GMM pads the scale rows internally (a Mosaic memref_slice
    error on chip at true Air widths, round 4) and an explicitly
    pre-padded scale + quant_group gives identical results."""
    import jax.numpy as jnp

    from glm4_moe_nano_vllm_tpu.ops import quant
    from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_gmm_int8

    rng = np.random.default_rng(11)
    e, k, n, g = 4, 704, 256, 64  # KG = 11
    qws, scs = [], []
    for _ in range(e):
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
        qw, sc = quant.quantize_int8(w, g)
        qws.append(qw), scs.append(sc.astype(np.float32))
    qw = jnp.asarray(np.stack(qws))
    sc = jnp.asarray(np.stack(scs))
    m = 32
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    gs = jnp.asarray([10, 0, 15, 7], jnp.int32)

    got = quant_gmm_int8(x, qw, sc, gs, interpret=True)

    # oracle: dequant + ragged_dot
    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize

    wfull = dequantize({"qw": qw, "scale": sc}, jnp.float32)
    want = jax.lax.ragged_dot(x.astype(jnp.float32), wfull, gs)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.03, atol=0.03)

    # pre-padded scale rows + explicit quant_group: identical
    sc_pad = jnp.pad(sc, ((0, 0), (0, 5), (0, 0)))
    got2 = quant_gmm_int8(x, qw, sc_pad, gs, quant_group=g, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))
