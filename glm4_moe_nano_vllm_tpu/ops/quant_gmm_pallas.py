"""Pallas TPU fused INT4-dequant grouped matmul (expert GMM + dense matmul).

SURVEY §7 hard-part #1: the reference dequantizes AWQ weights to fp16 in HBM
and then matmuls (`/root/reference/nanovllm/layers/linear_awq_new.py:254-255`)
— and under XLA the same materialization happens for the MoE expert stacks
(measured 1.5x decode slowdown vs bf16). This kernel keeps weights INT4 in
HBM and dequantizes inside the matmul pipeline, in VMEM tiles.

Covers three uses through one kernel builder:
  * **Grouped (MoE experts)** — ``quant_gmm``: lhs rows sorted by expert,
    group offsets padded to the row tile (``pad_group_layout``).
  * **Paired grouped (gate+up)** — ``quant_gmm_pair``: two weight sets share
    one pass over the activations.
  * **Dense** — E = 1 fast path (plain row padding, no scatter).

Performance structure (measured on v5e; DMA latency dominates decode):
  * ``eb`` experts are processed per grid instance; their packed weights are
    contiguous in [E, K/2, N] so ONE DMA fetches all eb weight blocks —
    per-expert DMA latency is amortized eb-fold;
  * all scratch indexing is STATIC (dynamic buffer-slot reads copy whole
    slabs and measured 12x slower), which is why the inner expert loop is a
    Python range over the eb-resident weights;
  * nibbles are half-split-packed per quant group (ops/quant.py): the VMEM
    unpack is a contiguous row concat (even/odd interleave would be a slow
    cross-sublane shuffle); each K tile (== group) uses one scale/zero row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n_sets: int, tm: int, tn: int, kt: int, nk: int, eb: int,
                 n_w: int, broadcast_lhs: bool = False):
    """n_w = tensors per weight set: 3 = int4 (qw, zp, scale), 2 = int8
    (qw, scale). ``broadcast_lhs``: every expert consumes the SAME lhs rows
    [0, cnt) while writing its own output span (dense-mode MoE, see
    quant_moe_experts_dense) — removes the sorted-dispatch gather/scatter."""

    def kernel(offs_ref, *refs):
        lhs_hbm = refs[0]
        w_hbm = refs[1: 1 + n_w * n_sets]
        outs = refs[1 + n_w * n_sets: 1 + (n_w + 1) * n_sets]
        scr = refs[1 + (n_w + 1) * n_sets:]
        x_scr = scr[0]
        wzs_scr = scr[1: 1 + n_w * n_sets]  # weight scratch per set
        o_scr = scr[1 + n_w * n_sets: 1 + (n_w + 1) * n_sets]
        sems = scr[-1]  # n_w=1: full-precision weights (no dequant)

        ei = pl.program_id(0)
        n = pl.program_id(1)
        e0 = ei * eb
        col = pl.multiple_of(n * tn, tn)

        # one DMA per tensor fetches all eb experts' blocks (contiguous)
        copies = []
        for s in range(n_sets):
            for j in range(n_w):
                copies.append(pltpu.make_async_copy(
                    w_hbm[n_w * s + j].at[pl.ds(e0, eb), :, pl.ds(col, tn)],
                    wzs_scr[n_w * s + j], sems.at[n_w * s + j]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        for el in range(eb):  # static expert offset within the resident block
            start = offs_ref[e0 + el]
            cnt = offs_ref[e0 + el + 1] - start
            nchunks = cnt // tm

            @pl.when(nchunks > 0)
            def _(el=el, start=start, nchunks=nchunks):
                def chunk_body(r, _):
                    row = pl.multiple_of(start + r * tm, tm)
                    lhs_row = pl.multiple_of(r * tm, tm) if broadcast_lhs else row
                    xcp = pltpu.make_async_copy(
                        lhs_hbm.at[pl.ds(lhs_row, tm), :], x_scr,
                        sems.at[n_w * n_sets],
                    )
                    xcp.start()
                    xcp.wait()

                    for s in range(n_sets):
                        acc = jnp.zeros((tm, tn), jnp.float32)
                        for ki in range(nk):
                            x = x_scr[:, ki * kt:(ki + 1) * kt]
                            if n_w == 1:  # full-precision weights
                                w = wzs_scr[s][el, ki * kt:(ki + 1) * kt]
                                acc = acc + jnp.dot(
                                    x, w, preferred_element_type=jnp.float32
                                )
                                continue
                            sc_scr = wzs_scr[n_w * s + n_w - 1]
                            scale = sc_scr[el, ki: ki + 1]
                            if n_w == 3:  # int4: unpack nibbles, shift by zp
                                w_scr, zp_scr = (wzs_scr[3 * s],
                                                 wzs_scr[3 * s + 1])
                                q32 = w_scr[
                                    el, ki * (kt // 2):(ki + 1) * (kt // 2)
                                ].astype(jnp.int32)
                                lo = q32 & 0x0F
                                hi = (q32 >> 4) & 0x0F
                                qun = jnp.concatenate([lo, hi], axis=0)
                                zp = zp_scr[el, ki: ki + 1].astype(jnp.int32)
                                q = (qun - zp).astype(jnp.float32)
                            else:  # int8: symmetric, no zero-point
                                w_scr = wzs_scr[2 * s]
                                q = w_scr[
                                    el, ki * kt:(ki + 1) * kt
                                ].astype(jnp.float32)
                            w = (q * scale).astype(x.dtype)
                            acc = acc + jnp.dot(
                                x, w, preferred_element_type=jnp.float32
                            )
                        o_scr[s][...] = acc.astype(o_scr[s].dtype)

                    ocs = [
                        pltpu.make_async_copy(
                            o_scr[s],
                            outs[s].at[pl.ds(row, tm), pl.ds(n * tn, tn)],
                            sems.at[n_w * n_sets + 1 + s],
                        )
                        for s in range(n_sets)
                    ]
                    for c in ocs:
                        c.start()
                    for c in ocs:
                        c.wait()
                    return ()

                jax.lax.fori_loop(0, nchunks, chunk_body, ())

    return kernel


def _choose_tm(m: int) -> int:
    if m >= 4096:
        return 512
    if m >= 1024:
        return 128
    if m >= 256:
        return 32
    return 8


def _choose_eb(e: int, k_bytes: int, tn: int, n_sets: int) -> int:
    """Experts resident per instance: bounded by a ~4MB weight-scratch budget
    and capped at 8 (the expert loop is fully unrolled — static indexing is
    mandatory for VMEM read performance — so eb multiplies kernel code size
    and Mosaic compile time). ``k_bytes`` = bytes per (K, 1) weight column."""
    budget = 4 * 1024 * 1024
    per_expert = k_bytes * tn * n_sets
    eb = max(1, min(e, 8, budget // max(per_expert, 1)))
    while e % eb != 0:
        eb -= 1
    return eb


@functools.partial(jax.jit, static_argnames=("tm", "broadcast_lhs",
                                             "quant_group", "interpret"))
def _gmm_call(lhs_padded, offs, *wsets_flat, tm: int,
              broadcast_lhs: bool = False, quant_group: int | None = None,
              interpret: bool = False):
    # int4 sets are (qw u8-packed, zp, scale); int8 sets are (qw i8, scale);
    # full-precision sets are a single weight stack (no dequant tensors)
    int4 = wsets_flat[0].dtype == jnp.uint8
    int8 = wsets_flat[0].dtype == jnp.int8
    n_w = 3 if int4 else (2 if int8 else 1)
    n_sets = len(wsets_flat) // n_w
    m_pad, k = lhs_padded.shape
    e, kw, n = wsets_flat[0].shape  # kw = K/2 (int4 packed) or K
    assert kw * (2 if int4 else 1) == k, (wsets_flat[0].shape, lhs_padded.shape)
    if n_w == 1:
        # K tile (VMEM slicing granularity, no quant groups): the largest
        # divisor of K up to 512 (K=1408 -> 352, etc.)
        kt = next(d for d in range(min(k, 512), 0, -1) if k % d == 0)
    else:
        kg = wsets_flat[1].shape[1]
        # explicit group wins: pre-padded zp/scale rows make k // kg wrong
        kt = quant_group or k // kg  # K tile == quant group size
        if kg % 8:
            # Mosaic cannot DMA-slice a sub-8 sublane extent (GLM-4.5-Air
            # Im=1408 -> KG=11 tripped a memref_slice error in the int8
            # path): pad zp/scale rows to the sublane tiling — the kernel
            # reads only the first nk rows
            def _pad_kg(w, i):
                if i % n_w == 0:  # qw rows are aligned
                    return w
                pad = [(0, 0)] * w.ndim
                pad[1] = (0, -(-kg // 8) * 8 - kg)
                return jnp.pad(w, pad)

            wsets_flat = tuple(_pad_kg(w, i)
                               for i, w in enumerate(wsets_flat))
            kg = -(-kg // 8) * 8
    tn = n if n <= 512 or n % 512 != 0 else 512
    assert n % tn == 0, (n, tn)
    w_itemsize = jnp.dtype(wsets_flat[0].dtype).itemsize
    eb = _choose_eb(e, kw * w_itemsize, tn, n_sets)

    scratch = [pltpu.VMEM((tm, k), lhs_padded.dtype)]
    for _ in range(n_sets):
        if n_w == 1:
            scratch += [pltpu.VMEM((eb, kw, tn), wsets_flat[0].dtype)]
        elif int4:
            scratch += [
                pltpu.VMEM((eb, kw, tn), jnp.uint8),
                pltpu.VMEM((eb, kg, tn), jnp.uint8),
                pltpu.VMEM((eb, kg, tn), jnp.float32),
            ]
        else:
            scratch += [
                pltpu.VMEM((eb, kw, tn), jnp.int8),
                pltpu.VMEM((eb, kg, tn), jnp.float32),
            ]
    scratch += [pltpu.VMEM((tm, tn), lhs_padded.dtype) for _ in range(n_sets)]
    scratch += [pltpu.SemaphoreType.DMA((n_w * n_sets + 1 + n_sets,))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // eb, n // tn),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + n_w * n_sets),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_sets,
        scratch_shapes=scratch,
    )
    m_out = m_pad * e if broadcast_lhs else m_pad
    out = pl.pallas_call(
        _make_kernel(n_sets, tm=tm, tn=tn, kt=kt, nk=k // kt, eb=eb, n_w=n_w,
                     broadcast_lhs=broadcast_lhs),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_out, n), lhs_padded.dtype)] * n_sets,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(offs, lhs_padded, *wsets_flat)
    return out


def pad_group_layout(group_sizes: jax.Array, m: int, tm: int):
    """Compute tm-aligned group offsets and the destination row of each of
    the m sorted input rows. Returns (offs [E+1], dst [m], m_pad)."""
    e = group_sizes.shape[0]
    padded = ((group_sizes + tm - 1) // tm) * tm
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )
    real_offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes).astype(jnp.int32)]
    )
    row = jnp.arange(m, dtype=jnp.int32)
    # group of each sorted row
    grp = jnp.searchsorted(real_offs[1:], row, side="right").astype(jnp.int32)
    dst = offs[grp] + (row - real_offs[grp])
    m_pad = m + e * tm  # static upper bound for sum(padded)
    return offs, dst, m_pad


def _prepare(lhs, group_sizes, e):
    m, k = lhs.shape
    tm = _choose_tm(m)
    if e == 1:
        m_pad = ((m + tm - 1) // tm) * tm
        lhs_p = jnp.zeros((m_pad, k), lhs.dtype).at[:m].set(lhs)
        offs = jnp.asarray([0, m_pad], jnp.int32)
        return lhs_p, offs, None, tm
    offs, dst, m_pad = pad_group_layout(group_sizes, m, tm)
    lhs_p = jnp.zeros((m_pad, k), lhs.dtype).at[dst].set(lhs)
    return lhs_p, offs, dst, tm


def quant_gmm(lhs, qw, zp, scale, group_sizes, interpret: bool = False):
    """Grouped quantized matmul over unaligned group sizes."""
    m = lhs.shape[0]
    lhs_p, offs, dst, tm = _prepare(lhs, group_sizes, qw.shape[0])
    (out_p,) = _gmm_call(lhs_p, offs, qw, zp, scale, tm=tm, interpret=interpret)
    return out_p[:m] if dst is None else out_p[dst]


def quant_gmm_pair(lhs, qwa, zpa, sca, qwb, zpb, scb, group_sizes,
                   interpret: bool = False):
    """Paired grouped quantized matmul (same lhs, two weight sets)."""
    m = lhs.shape[0]
    lhs_p, offs, dst, tm = _prepare(lhs, group_sizes, qwa.shape[0])
    oa, ob = _gmm_call(lhs_p, offs, qwa, zpa, sca, qwb, zpb, scb,
                       tm=tm, interpret=interpret)
    if dst is None:
        return oa[:m], ob[:m]
    return oa[dst], ob[dst]


def _flat_set(qp: dict):
    s = qp["scale"].astype(jnp.float32)
    if "zp" in qp:
        return (qp["qw"], qp["zp"], s)
    return (qp["qw"], s)


def quant_moe_experts_dense(x, qp_gate: dict, qp_up: dict, qp_down: dict,
                            interpret: bool = False):
    """Dense-mode quantized MoE experts: every expert processes ALL tokens.

    Decode fast path (see ops/moe.py DENSE_MODE_MAX_TOKENS): at small T the
    step is expert-weight-read bound, so running each expert on the full
    [T, H] block costs the same HBM traffic but removes the whole
    sort/gather/pad/scatter dispatch. gate+up run in broadcast-lhs mode (one
    lhs, per-expert output spans); the down projection consumes that already
    expert-contiguous intermediate with uniform group offsets — no XLA-side
    data movement at all. Returns [E, T, H] per-expert outputs (combine with
    the dense top-k weight map).
    """
    from glm4_moe_nano_vllm_tpu.layers.activation import silu_and_mul

    t, k = x.shape
    e = qp_gate["qw"].shape[0]
    # one chunk per expert: the whole [T, K] block stays VMEM-resident
    # (T <= DENSE_MODE_MAX_TOKENS -> <= 1 MB) instead of re-looping tiny tm
    # chunks per expert
    tm = -(-t // 8) * 8
    t_pad = tm
    x_p = jnp.zeros((t_pad, k), x.dtype).at[:t].set(x)
    offs = jnp.arange(e + 1, dtype=jnp.int32) * t_pad
    g, u = _gmm_call(x_p, offs, *_flat_set(qp_gate), *_flat_set(qp_up),
                     tm=tm, broadcast_lhs=True, interpret=interpret)
    h = silu_and_mul(g, u).astype(x.dtype)  # [E*t_pad, I] expert-contiguous
    (o,) = _gmm_call(h, offs, *_flat_set(qp_down), tm=tm, interpret=interpret)
    return o.reshape(e, t_pad, -1)[:, :t]


def gmm_bf16(lhs, w, group_sizes, interpret: bool = False):
    """Full-precision grouped expert matmul [m, K] x [E, K, N] (sorted rows).

    Same kernel as the quantized GMM with n_w = 1 (no dequant tensors) —
    an alternative to ``jax.lax.ragged_dot`` for the MoE prefill path.
    """
    m = lhs.shape[0]
    lhs_p, offs, dst, tm = _prepare(lhs, group_sizes, w.shape[0])
    (out_p,) = _gmm_call(lhs_p, offs, w, tm=tm, interpret=interpret)
    return out_p[:m] if dst is None else out_p[dst]


def gmm_bf16_pair(lhs, wa, wb, group_sizes, interpret: bool = False):
    """Paired full-precision grouped matmul (same lhs, two weight sets)."""
    m = lhs.shape[0]
    lhs_p, offs, dst, tm = _prepare(lhs, group_sizes, wa.shape[0])
    oa, ob = _gmm_call(lhs_p, offs, wa, wb, tm=tm, interpret=interpret)
    if dst is None:
        return oa[:m], ob[:m]
    return oa[dst], ob[dst]


def quant_gmm_int8(lhs, qw, scale, group_sizes,
                   quant_group: int | None = None,
                   interpret: bool = False):
    """Grouped matmul with symmetric INT8 weights [E, K, N] (no zero-point);
    weights stay int8 in HBM, dequantized in VMEM tiles."""
    m = lhs.shape[0]
    lhs_p, offs, dst, tm = _prepare(lhs, group_sizes, qw.shape[0])
    (out_p,) = _gmm_call(lhs_p, offs, qw, scale, tm=tm,
                         quant_group=quant_group, interpret=interpret)
    return out_p[:m] if dst is None else out_p[dst]


def quant_gmm_int8_pair(lhs, qwa, sca, qwb, scb, group_sizes,
                        quant_group: int | None = None,
                        interpret: bool = False):
    """Paired INT8 grouped matmul (same lhs, two weight sets)."""
    m = lhs.shape[0]
    lhs_p, offs, dst, tm = _prepare(lhs, group_sizes, qwa.shape[0])
    oa, ob = _gmm_call(lhs_p, offs, qwa, sca, qwb, scb, tm=tm,
                       quant_group=quant_group, interpret=interpret)
    if dst is None:
        return oa[:m], ob[:m]
    return oa[dst], ob[dst]
