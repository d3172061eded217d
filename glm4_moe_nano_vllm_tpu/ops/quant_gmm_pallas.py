"""Pallas TPU fused INT4-dequant grouped matmul (expert GMM + dense matmul).

SURVEY §7 hard-part #1: the reference dequantizes AWQ weights to fp16 in HBM
and then matmuls (`/root/reference/nanovllm/layers/linear_awq_new.py:254-255`)
— and under XLA the same materialization happens for the MoE expert stacks
(measured 1.5x decode slowdown vs bf16). This kernel keeps weights INT4 in
HBM and dequantizes inside the matmul pipeline, in VMEM tiles.

One kernel covers both uses:
  * **Grouped (MoE experts)**: lhs rows sorted by expert, with every group's
    start offset padded to the row-tile ``tm`` (the caller scatters rows into
    the padded layout — see ``pad_group_layout``), rhs [E, K/2, N] packed
    uint4 pairs, grid (expert, n_tile); empty groups are skipped entirely.
  * **Dense**: E = 1, group_sizes = [M].

Structure notes (measured on v5e):
  * all scratch indexing is STATIC — dynamic buffer-slot reads in the
    compute path copy the entire slab per read and measured 12x slower than
    this single-buffered static kernel;
  * each instance loads its expert's whole packed [K/2, TN] weight block +
    scale/zero rows in one round of DMAs; each row chunk's [TM, K]
    activations are one DMA; the K loop runs from VMEM with static offsets;
  * nibbles are half-split-packed per quant group (ops/quant.py), so the
    in-VMEM unpack is a contiguous row concat (an even/odd interleave is a
    slow cross-sublane shuffle), and each K tile (== group) uses one
    scale/zero row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gmm_kernel(
    # scalar prefetch
    offs_ref,  # [E + 1] int32 tm-aligned row offsets
    # inputs (ANY = HBM, manually DMA'd)
    lhs_hbm,  # [M_pad, K]
    qw_hbm,  # [E, K/2, N] uint8 (half-split nibble pairs per group)
    zp_hbm,  # [E, K/G, N] uint8
    scale_hbm,  # [E, K/G, N] f32
    # output
    out_hbm,  # [M_pad, N] (ANY)
    # scratch (single-buffered, statically indexed)
    x_scr,  # [TM, K]
    w_scr,  # [K/2, TN] uint8
    zp_scr,  # [KG, TN] uint8
    sc_scr,  # [KG, TN] f32
    o_scr,  # [TM, TN]
    sems,  # [5]
    *,
    tm: int,
    tn: int,
    kt: int,  # == quant group size
    nk: int,
):
    e = pl.program_id(0)
    n = pl.program_id(1)
    start = offs_ref[e]
    cnt = offs_ref[e + 1] - start
    nchunks = cnt // tm  # offsets are tm-aligned

    @pl.when(nchunks > 0)
    def _():
        col = pl.multiple_of(n * tn, tn)
        wcp = pltpu.make_async_copy(
            qw_hbm.at[e, :, pl.ds(col, tn)], w_scr, sems.at[0]
        )
        zcp = pltpu.make_async_copy(
            zp_hbm.at[e, :, pl.ds(col, tn)], zp_scr, sems.at[1]
        )
        scp = pltpu.make_async_copy(
            scale_hbm.at[e, :, pl.ds(col, tn)], sc_scr, sems.at[2]
        )
        wcp.start()
        zcp.start()
        scp.start()
        wcp.wait()
        zcp.wait()
        scp.wait()

        def chunk_body(r, _):
            row = pl.multiple_of(start + r * tm, tm)
            xcp = pltpu.make_async_copy(
                lhs_hbm.at[pl.ds(row, tm), :], x_scr, sems.at[3]
            )
            xcp.start()
            xcp.wait()

            acc = jnp.zeros((tm, tn), jnp.float32)
            for ki in range(nk):  # static offsets, all VMEM
                x = x_scr[:, ki * kt:(ki + 1) * kt]
                q32 = w_scr[ki * (kt // 2):(ki + 1) * (kt // 2)].astype(jnp.int32)
                lo = q32 & 0x0F
                hi = (q32 >> 4) & 0x0F
                qun = jnp.concatenate([lo, hi], axis=0)  # [KT, TN]
                zp = zp_scr[ki: ki + 1].astype(jnp.int32)
                scale = sc_scr[ki: ki + 1]
                w = ((qun - zp).astype(jnp.float32) * scale).astype(x.dtype)
                acc = acc + jnp.dot(x, w, preferred_element_type=jnp.float32)

            o_scr[...] = acc.astype(o_scr.dtype)
            ocp = pltpu.make_async_copy(
                o_scr, out_hbm.at[pl.ds(row, tm), pl.ds(n * tn, tn)], sems.at[4]
            )
            ocp.start()
            ocp.wait()
            return ()

        jax.lax.fori_loop(0, nchunks, chunk_body, ())


def _gmm_pair_kernel(
    offs_ref,
    lhs_hbm,  # [M_pad, K]
    qwa_hbm, zpa_hbm, sca_hbm,  # weight set A [E, K/2, N] / [E, KG, N]
    qwb_hbm, zpb_hbm, scb_hbm,  # weight set B
    outa_hbm, outb_hbm,  # [M_pad, N]
    x_scr, wa_scr, za_scr, sa_scr, wb_scr, zb_scr, sb_scr,
    oa_scr, ob_scr, sems,
    *,
    tm: int,
    tn: int,
    kt: int,
    nk: int,
):
    """Two GMMs sharing lhs (MoE gate+up): one pass over activations."""
    e = pl.program_id(0)
    n = pl.program_id(1)
    start = offs_ref[e]
    cnt = offs_ref[e + 1] - start
    nchunks = cnt // tm

    @pl.when(nchunks > 0)
    def _():
        col = pl.multiple_of(n * tn, tn)
        copies = [
            pltpu.make_async_copy(qwa_hbm.at[e, :, pl.ds(col, tn)], wa_scr, sems.at[0]),
            pltpu.make_async_copy(zpa_hbm.at[e, :, pl.ds(col, tn)], za_scr, sems.at[1]),
            pltpu.make_async_copy(sca_hbm.at[e, :, pl.ds(col, tn)], sa_scr, sems.at[2]),
            pltpu.make_async_copy(qwb_hbm.at[e, :, pl.ds(col, tn)], wb_scr, sems.at[3]),
            pltpu.make_async_copy(zpb_hbm.at[e, :, pl.ds(col, tn)], zb_scr, sems.at[4]),
            pltpu.make_async_copy(scb_hbm.at[e, :, pl.ds(col, tn)], sb_scr, sems.at[5]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        def chunk_body(r, _):
            row = pl.multiple_of(start + r * tm, tm)
            xcp = pltpu.make_async_copy(
                lhs_hbm.at[pl.ds(row, tm), :], x_scr, sems.at[6]
            )
            xcp.start()
            xcp.wait()

            acc_a = jnp.zeros((tm, tn), jnp.float32)
            acc_b = jnp.zeros((tm, tn), jnp.float32)
            for ki in range(nk):
                x = x_scr[:, ki * kt:(ki + 1) * kt]
                for w_scr_, zp_scr_, sc_scr_, which in (
                    (wa_scr, za_scr, sa_scr, 0),
                    (wb_scr, zb_scr, sb_scr, 1),
                ):
                    q32 = w_scr_[ki * (kt // 2):(ki + 1) * (kt // 2)].astype(jnp.int32)
                    lo = q32 & 0x0F
                    hi = (q32 >> 4) & 0x0F
                    qun = jnp.concatenate([lo, hi], axis=0)
                    zp = zp_scr_[ki: ki + 1].astype(jnp.int32)
                    scale = sc_scr_[ki: ki + 1]
                    w = ((qun - zp).astype(jnp.float32) * scale).astype(x.dtype)
                    d = jnp.dot(x, w, preferred_element_type=jnp.float32)
                    if which == 0:
                        acc_a = acc_a + d
                    else:
                        acc_b = acc_b + d

            oa_scr[...] = acc_a.astype(oa_scr.dtype)
            ob_scr[...] = acc_b.astype(ob_scr.dtype)
            ca = pltpu.make_async_copy(
                oa_scr, outa_hbm.at[pl.ds(row, tm), pl.ds(n * tn, tn)], sems.at[7]
            )
            cb = pltpu.make_async_copy(
                ob_scr, outb_hbm.at[pl.ds(row, tm), pl.ds(n * tn, tn)], sems.at[8]
            )
            ca.start()
            cb.start()
            ca.wait()
            cb.wait()
            return ()

        jax.lax.fori_loop(0, nchunks, chunk_body, ())


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def quant_gmm_pair_padded(
    lhs_padded, offs, qwa, zpa, sca, qwb, zpb, scb, tm: int, interpret=False
):
    m_pad, k = lhs_padded.shape
    e, k2, n = qwa.shape
    assert qwb.shape == qwa.shape
    kg = zpa.shape[1]
    kt = k // kg
    tn = n if n <= 512 or n % 512 != 0 else 512
    assert n % tn == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, n // tn),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((tm, k), lhs_padded.dtype),
            pltpu.VMEM((k2, tn), jnp.uint8),
            pltpu.VMEM((kg, tn), jnp.uint8),
            pltpu.VMEM((kg, tn), jnp.float32),
            pltpu.VMEM((k2, tn), jnp.uint8),
            pltpu.VMEM((kg, tn), jnp.uint8),
            pltpu.VMEM((kg, tn), jnp.float32),
            pltpu.VMEM((tm, tn), lhs_padded.dtype),
            pltpu.VMEM((tm, tn), lhs_padded.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gmm_pair_kernel, tm=tm, tn=tn, kt=kt, nk=k // kt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_pad, n), lhs_padded.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(offs, lhs_padded, qwa, zpa, sca, qwb, zpb, scb)


def quant_gmm_pair(lhs, qwa, zpa, sca, qwb, zpb, scb, group_sizes,
                   interpret: bool = False):
    """Paired grouped quantized matmul (same lhs, two weight sets)."""
    m, k = lhs.shape
    tm = _choose_tm(m)
    offs, dst, m_pad = pad_group_layout(group_sizes, m, tm)
    lhs_p = jnp.zeros((m_pad, k), lhs.dtype).at[dst].set(lhs)
    oa, ob = quant_gmm_pair_padded(
        lhs_p, offs, qwa, zpa, sca, qwb, zpb, scb, tm, interpret=interpret
    )
    return oa[dst], ob[dst]


def _choose_tm(m: int) -> int:
    if m >= 4096:
        return 512
    if m >= 1024:
        return 128
    if m >= 256:
        return 32
    return 8


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def quant_gmm_padded(
    lhs_padded: jax.Array,  # [M_pad, K], group g's rows at offs[g] (tm-aligned)
    offs: jax.Array,  # [E + 1] int32 tm-aligned offsets
    qw: jax.Array,  # [E, K/2, N] uint8 half-split packed
    zp: jax.Array,  # [E, K/G, N] uint8
    scale: jax.Array,  # [E, K/G, N] float32
    tm: int,
    interpret: bool = False,
) -> jax.Array:
    m_pad, k = lhs_padded.shape
    e, k2, n = qw.shape
    assert k2 * 2 == k, (qw.shape, lhs_padded.shape)
    kg = zp.shape[1]
    kt = k // kg  # K tile == quant group size
    assert kt % 2 == 0 and k % kt == 0
    tn = n if n <= 512 or n % 512 != 0 else 512
    assert n % tn == 0, (n, tn)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, n // tn),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tm, k), lhs_padded.dtype),
            pltpu.VMEM((k2, tn), jnp.uint8),
            pltpu.VMEM((kg, tn), jnp.uint8),
            pltpu.VMEM((kg, tn), jnp.float32),
            pltpu.VMEM((tm, tn), lhs_padded.dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gmm_kernel, tm=tm, tn=tn, kt=kt, nk=k // kt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), lhs_padded.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(offs, lhs_padded, qw, zp, scale)


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


def quant_gmm(
    lhs: jax.Array,  # [M, K] rows sorted by group
    qw: jax.Array,
    zp: jax.Array,
    scale: jax.Array,
    group_sizes: jax.Array,  # [E] int32
    interpret: bool = False,
) -> jax.Array:
    """Grouped quantized matmul over unaligned group sizes: scatters rows
    into a tm-aligned layout, runs the kernel, gathers back."""
    m, k = lhs.shape
    tm = _choose_tm(m)
    if qw.shape[0] == 1:
        # dense fast path (E = 1): plain row padding, no scatter/gather
        m_pad = ((m + tm - 1) // tm) * tm
        lhs_p = jnp.zeros((m_pad, k), lhs.dtype).at[:m].set(lhs)
        offs = jnp.asarray([0, m_pad], jnp.int32)
        out_p = quant_gmm_padded(lhs_p, offs, qw, zp, scale, tm,
                                 interpret=interpret)
        return out_p[:m]
    offs, dst, m_pad = pad_group_layout(group_sizes, m, tm)
    lhs_p = jnp.zeros((m_pad, k), lhs.dtype).at[dst].set(lhs)
    out_p = quant_gmm_padded(lhs_p, offs, qw, zp, scale, tm, interpret=interpret)
    return out_p[dst]
