"""Pallas TPU grouped quantized matmul, v2 (prefill-oriented).

Fixes the two structural flaws of ops/quant_gmm_pallas.py that made it lose
to XLA dequant-then-``ragged_dot`` at prefill shapes (5.7k vs 8.4k tok/s
fresh prefill at 7.6B):
  * weight blocks ride the standard Pallas pipeline (BlockSpecs over an
    (expert, N-tile) grid → automatic double buffering) instead of serial
    manual DMAs awaited inside each grid instance;
  * dequantization is hoisted to once per (expert, N-tile) — v1 re-ran it
    for every row chunk.

Row handling (the part BlockSpecs cannot express because group sizes are
dynamic): rows live in ONE 8-aligned padded layout shared by inputs and
outputs — expert e's rows occupy ``[offs8[e], offs8[e] + cnt8)`` where cnt8
rounds the group size up to 8 (the TPU sublane DMA alignment). Each grid
instance DMAs [tm, K] row chunks from ``offs8[e] + r*tm`` and writes the
matching output rows. A trailing chunk may read into / write over the NEXT
expert's span: reads are harmless, and writes are safe because every
instance drains its output DMAs before finishing (grid instances run
sequentially), so the next expert's real writes land last. The caller
gathers real rows out of the padded layout once at the end — and because
inputs and outputs share the layout, a gate/up → silu → down chain runs
entirely in padded space with zero intermediate copies.

Storage as ops/quant.py (int4: qw u8 [E, K/2, N] group-half-split nibbles +
zp/scale [E, KG, N]; int8: qw i8 [E, K, N] + scale). Reference context: this
replaces the reference's per-expert Python loop + Triton dequant
(`/root/reference/nanovllm/models/glm4_moe/moe.py:135-151`,
`linear_awq_new.py:17-122`) for the large-token (prefill) path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glm4_moe_nano_vllm_tpu.ops.moe_dense_fused_pallas import _dequant_tiles

import os

# row-chunk tile: 256 amortizes chunk DMA latency while bounding the
# cross-expert overlap waste; N tile 512 bounds the weight block at ~0.5 MB
# (double-buffered by the pipeline). When NVT_GMM2_TM is unset the call
# adapts tm to the rows-per-expert of the actual shape (decode-sized calls
# want small chunks: a [256, K] chunk DMA per 8-16-row expert re-reads 16x
# the rows — measured 11.8 -> 4.7 ms/layer at Air decode widths).
_TM_ENV = os.environ.get("NVT_GMM2_TM")
_TM = int(_TM_ENV or "256")
_TN = int(os.environ.get("NVT_GMM2_TN", "512"))


def _make_kernel(n_sets: int, n_w: int, kt: int, nk: int, tm: int, tn: int):
    def kernel(offs_ref, li_ref, lhs_hbm, *refs):
        del li_ref  # consumed by the BlockSpec index maps only
        w_refs = refs[: n_w * n_sets]  # pipelined VMEM blocks
        outs = refs[n_w * n_sets: n_w * n_sets + n_sets]  # ANY (HBM)
        x_scr, o_scr, xsem, osem = refs[-4:]
        e = pl.program_id(0)
        col = pl.multiple_of(pl.program_id(1) * tn, tn)
        start = pl.multiple_of(offs_ref[e], 8)
        cnt8 = offs_ref[e + 1] - offs_ref[e]
        nchunks = pl.cdiv(cnt8, tm)

        def xcopy(r, slot):
            return pltpu.make_async_copy(
                lhs_hbm.at[pl.ds(start + r * tm, tm), :],
                x_scr.at[slot], xsem.at[slot],
            )

        def ocopy(s, r, slot):
            return pltpu.make_async_copy(
                o_scr.at[s, slot],
                outs[s].at[pl.ds(start + r * tm, tm), pl.ds(col, tn)],
                osem.at[s, slot],
            )

        # Decode-shape fast path: with one row chunk per expert
        # (nchunks == 1, the typical decode case — each expert owns only a
        # few sorted rows), the N-tile instances of the SAME expert would
        # re-DMA identical lhs rows once per tile. The x scratch persists
        # across grid instances and the N-tile dim is the minor grid axis,
        # so every instance after the first reuses x_scr[0] — cutting both
        # the exposed per-instance DMA latency (E*N_tiles -> E copies per
        # call) and the lhs HBM re-read.
        skip_x = jnp.logical_and(nchunks == 1, pl.program_id(1) > 0)

        @pl.when(nchunks > 0)
        def _():
            # dequant once per (expert, N-tile); tiles live in VMEM across
            # the whole row loop
            tiles = []
            for s in range(n_sets):
                set_refs = [w_refs[n_w * s + j].at[0, 0] for j in range(n_w)]
                tiles.append(
                    list(_dequant_tiles(set_refs, n_w, kt, nk, x_scr.dtype))
                )

            def process(r, slot):
                # the r==0 copy is skipped entirely under skip_x (its start
                # below is guarded by the same predicate)
                @pl.when(jnp.logical_not(
                    jnp.logical_and(skip_x, r == 0)))
                def _():
                    xcopy(r, slot).wait()
                x = x_scr[slot]  # static slot → no slab copy
                for s in range(n_sets):
                    acc = None
                    for ki, w in enumerate(tiles[s]):
                        if isinstance(w, tuple):  # split nibbles (mode 2)
                            w_lo, w_hi = w
                            half = kt // 2
                            p = jnp.dot(x[:, ki * kt:ki * kt + half], w_lo,
                                        preferred_element_type=jnp.float32)
                            p = p + jnp.dot(
                                x[:, ki * kt + half:(ki + 1) * kt], w_hi,
                                preferred_element_type=jnp.float32)
                        else:
                            p = jnp.dot(x[:, ki * kt:(ki + 1) * kt], w,
                                        preferred_element_type=jnp.float32)
                        acc = p if acc is None else acc + p

                    @pl.when(r >= 2)
                    def _(s=s, slot=slot):  # noqa: B023
                        ocopy(s, r - 2, slot).wait()

                    o_scr[s, slot] = acc.astype(o_scr.dtype)
                    ocopy(s, r, slot).start()

            @pl.when(jnp.logical_not(skip_x))
            def _():
                xcopy(0, 0).start()

            def pair_body(rr, _):
                r0 = rr * 2

                @pl.when(r0 + 1 < nchunks)
                def _():
                    xcopy(r0 + 1, 1).start()

                process(r0, 0)

                @pl.when(r0 + 2 < nchunks)
                def _():
                    xcopy(r0 + 2, 0).start()

                @pl.when(r0 + 1 < nchunks)
                def _():
                    process(r0 + 1, 1)

                return 0

            jax.lax.fori_loop(0, pl.cdiv(nchunks, 2), pair_body, 0)

            # drain before the instance ends: at most one write per slot is
            # outstanding (process waits r-2 before reuse). MANDATORY for
            # correctness, not just hygiene — the next expert's first rows
            # may overlap this expert's trailing chunk, and its real writes
            # must land after our garbage ones.
            last = nchunks - 1

            @pl.when(jax.lax.rem(last, 2) == 0)
            def _():
                for s in range(n_sets):
                    ocopy(s, last, 0).wait()

            @pl.when(jax.lax.rem(last, 2) == 1)
            def _():
                for s in range(n_sets):
                    ocopy(s, last, 1).wait()

            @pl.when(nchunks >= 2)
            def _():
                prev = nchunks - 2

                @pl.when(jax.lax.rem(prev, 2) == 0)
                def _():
                    for s in range(n_sets):
                        ocopy(s, prev, 0).wait()

                @pl.when(jax.lax.rem(prev, 2) == 1)
                def _():
                    for s in range(n_sets):
                        ocopy(s, prev, 1).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("m_ext", "m_real",
                                             "quant_group", "interpret"))
def _gmm2_call(lhs8, offs8, layer_idx, *wsets_flat, m_ext: int,
               m_real: int = 0, quant_group: int | None = None,
               interpret: bool = False):
    """Weight stacks are [L, E, ...]; ``layer_idx`` (traced int32) selects
    the layer inside the BlockSpec index maps — slicing the stack in XLA
    would materialize a full per-layer copy in front of the custom call
    (same finding as the fused decode kernel, see moe_dense_fused_pallas)."""
    int4 = wsets_flat[0].dtype == jnp.uint8
    n_w = 3 if int4 else 2
    n_sets = len(wsets_flat) // n_w
    k = lhs8.shape[1]
    _, e, kw, n = wsets_flat[0].shape
    # explicit group when zp/scale rows are pre-padded (engine init)
    kt = quant_group or k // wsets_flat[n_w - 1].shape[2]
    kg = k // kt
    # N tile: Mosaic block shapes need the lane dim %128 (or == the whole
    # dim). GLM-4.5-Air's Im=1408 = 11*128 picks 128 here (352 divides but
    # is not lane-aligned).
    tn = next(d for d in range(min(n, _TN), 0, -1)
              if n % d == 0 and (d % 128 == 0 or d == n))
    tm = _TM
    if _TM_ENV is None:
        # adapt the row chunk to the average rows per expert (m_real is the
        # caller's true row count, carried on GmmLayout — decode-sized calls
        # want small chunks, see module docstring)
        avg = max(1, (m_real or m_ext) // max(e, 1))
        tm = min(_TM, max(16, -(-avg // 8) * 8))

    # Mosaic requires BlockSpec dims aligned to the dtype's sublane tiling
    # (u8: 4, f32: 8). zp/scale have KG rows = K/group, which real models
    # break (GLM-4.5-Air Im=1408 → KG=11): pad to 8. The pad is
    # scan-invariant for layer-stacked params, so XLA hoists it out of the
    # decoder scan; the kernel reads only the first kg rows.
    kg_stored = wsets_flat[n_w - 1].shape[2]
    if kg_stored % 8 != 0:
        kg_pad = -(-kg_stored // 8) * 8
        padded = []
        for i, w in enumerate(wsets_flat):
            if i % n_w == 0:  # qw rows are K/2 (int4) or K — already aligned
                padded.append(w)
            else:
                padded.append(jnp.pad(
                    w, [(0, 0), (0, 0), (0, kg_pad - kg_stored), (0, 0)]
                ))
        wsets_flat = tuple(padded)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for w in wsets_flat:
        in_specs.append(
            pl.BlockSpec((1, 1, w.shape[2], tn),
                         lambda ei, ni, o, li: (li[0], ei, 0, ni))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e, n // tn),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_sets,
        scratch_shapes=[
            pltpu.VMEM((2, tm, k), lhs8.dtype),
            pltpu.VMEM((n_sets, 2, tm, tn), lhs8.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((n_sets, 2)),
        ],
    )
    outs = pl.pallas_call(
        _make_kernel(n_sets, n_w, kt, k // kt, tm, tn),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_ext, n), lhs8.dtype)] * n_sets,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6),
        ),
        interpret=interpret,
    )(offs8, jnp.asarray(layer_idx, jnp.int32).reshape(1), lhs8, *wsets_flat)
    return outs


@dataclass
class GmmLayout:
    """8-aligned padded row layout for a chain of grouped matmuls.

    ``offs8`` [E+1]: each expert's padded span start; ``dst8`` [m]: padded
    row of each real sorted row; ``m_ext`` (static): padded rows + _TM
    scratch rows for trailing chunk overflow.
    """

    offs8: jax.Array
    dst8: jax.Array
    m_ext: int
    m_real: int = 0  # the caller's true (unpadded) row count


def make_layout(group_sizes: jax.Array, m: int) -> GmmLayout:
    e = group_sizes.shape[0]
    padded = ((group_sizes + 7) // 8) * 8
    offs8 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded, dtype=jnp.int32)]
    )
    real = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes, dtype=jnp.int32)]
    )
    row = jnp.arange(m, dtype=jnp.int32)
    grp = jnp.searchsorted(real[1:], row, side="right").astype(jnp.int32)
    dst8 = jnp.take(offs8, grp) + (row - jnp.take(real, grp))
    return GmmLayout(offs8, dst8, m + 8 * e + _TM, m)


def scatter_rows(rows: jax.Array, layout: GmmLayout) -> jax.Array:
    """Map per-real-row values (e.g. dispatch token indices) into the padded
    layout via an int32 set-scatter; padding rows get value 0."""
    return jnp.zeros((layout.m_ext,), rows.dtype).at[layout.dst8].set(rows)


def quant_gmm2_chain(lhs8, wsets: list, layout: GmmLayout, layer_idx=None,
                     quant_group: int | None = None,
                     interpret: bool = False):
    """One grouped matmul over padded-layout rows for each quant dict in
    ``wsets`` (sharing the lhs pass); outputs stay in the padded layout.

    With ``layer_idx`` (traced int32), quant dicts are layer-stacked
    [L, E, ...] and the layer is selected in-kernel."""
    flat = []
    for qp in wsets:
        if "zp" in qp:
            parts = (qp["qw"], qp["zp"], qp["scale"])
        else:
            parts = (qp["qw"], qp["scale"])
        if layer_idx is None:
            parts = tuple(p[None] for p in parts)  # L = 1 view (no copy)
        flat += list(parts)
    li = 0 if layer_idx is None else layer_idx
    return _gmm2_call(lhs8, layout.offs8, li, *flat, m_ext=layout.m_ext,
                      m_real=layout.m_real, quant_group=quant_group,
                      interpret=interpret)


def quant_gmm2(lhs, qp: dict, group_sizes, layer_idx=None,
               quant_group: int | None = None, interpret: bool = False):
    """Grouped quantized matmul over expert-sorted rows (v2 kernel).

    Standalone convenience wrapper: pads the sorted lhs into the 8-aligned
    layout and gathers real rows back out. MoE chains should use
    make_layout + scatter_rows + quant_gmm2_chain to skip the copies.
    With ``layer_idx``, ``qp`` is layer-stacked [L, E, ...] and the layer is
    selected in-kernel (no slice copy)."""
    m = lhs.shape[0]
    layout = make_layout(group_sizes, m)
    src = scatter_rows(jnp.arange(m, dtype=jnp.int32), layout)
    lhs8 = jnp.take(lhs, src, axis=0)
    (out,) = quant_gmm2_chain(lhs8, [qp], layout, layer_idx=layer_idx,
                              quant_group=quant_group, interpret=interpret)
    return jnp.take(out, layout.dst8, axis=0)


def quant_gmm2_pair(lhs, qp_a: dict, qp_b: dict, group_sizes,
                    layer_idx=None, quant_group: int | None = None,
                    interpret: bool = False):
    """Two grouped matmuls sharing one pass over the sorted rows."""
    m = lhs.shape[0]
    layout = make_layout(group_sizes, m)
    src = scatter_rows(jnp.arange(m, dtype=jnp.int32), layout)
    lhs8 = jnp.take(lhs, src, axis=0)
    oa, ob = quant_gmm2_chain(lhs8, [qp_a, qp_b], layout,
                              layer_idx=layer_idx, quant_group=quant_group,
                              interpret=interpret)
    return jnp.take(oa, layout.dst8, axis=0), jnp.take(ob, layout.dst8, axis=0)
