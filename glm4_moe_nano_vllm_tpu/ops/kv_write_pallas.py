"""Pallas TPU KV-cache write kernel (in-place paged scatter).

TPU-native replacement for the reference's ``store_kvcache_kernel`` Triton
scatter (`/root/reference/nanovllm/layers/attention.py:10-42`), and the
performance-critical piece the XLA scatter path cannot deliver: XLA's TPU
scatter prefers a token-major physical layout (`{3,0,2,1}`) for the cache
operand while the Pallas attention kernels require the default head-major
layout — composing them forces a *full-cache* layout-conversion copy per
layer per step (measured: ~19 ms per decode micro-step for a 1.6 GB cache,
~40x off roofline). This kernel writes new rows in place via
``input_output_aliases``, so the cache keeps one layout and zero copies.

Write plan. A step's new tokens per sequence are a contiguous position run
``[start, start+q)`` (decode: q = 1; chunked/SP prefill: q = chunk), so the
rows they occupy in the paged cache form at most ``ceil((q+bs-2)/bs)+1``
(block, row-range) runs. The host-side jnp ``plan_kv_writes`` turns
(positions, context_lens) into fixed-shape [B, J] tables (block column,
row lo/hi, source row); the kernel read-modify-writes each referenced block:

    DMA in   cache[:, blk]  -> [H, bs, D] VMEM
    DMA in   src_slab[e]    -> [H, bs, D] VMEM (per-entry slab pre-gathered
             in XLA so block row r pairs with slab row r — static shapes;
             Mosaic can't DMA-slice a tiled dim at an unaligned offset)
    select   rows in [lo, hi) take the new values
    DMA out  back to cache[:, blk]

RMW keeps rows outside [lo, hi) (earlier tokens of the same block) intact.
``group`` blocks are processed per grid step so their DMAs overlap; grid
steps are sequential ("arbitrary") and write-backs complete in-step, which
serializes RMW of the same block across steps.

PRECONDITION: two entries of one call may target the same block only from
different grid steps — within a DMA group the RMWs race. Distinct sequences
never write-share a block (block ownership is unique; prefix-cache-shared
blocks are full and read-only), and the engine keeps same-step sibling rows
of one prompt block-aligned (config.py's prefill_sp_degree assert +
scheduler emit_rows rounding), so runs never straddle rows.

The ``slot == -1`` no-op padding convention (reference attention.py:23,
model_runner.py:207) maps to plan entries with ``blk == -1`` (q == 0 rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def plan_kv_writes(
    positions0: jax.Array,  # [B] start position of each row's token run
    context_lens: jax.Array,  # [B] start + q_len (0 for padded rows)
    s: int,  # query-length bucket (tokens per row, static)
    block_size: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """[B, J] write-run tables: (block column g, row lo, row hi, source row).

    ``g`` indexes the sequence's block table (-1 = skip); ``src0`` is the row
    in the [B*s]-flattened new-KV tensor that lands at block row ``lo``.
    Layer-independent: callers add the layer offset to the resolved block ids.
    """
    bs = block_size
    b = positions0.shape[0]
    start = positions0
    q = jnp.maximum(context_lens - start, 0)
    j = jnp.arange(1 if s <= 1 else (s + bs - 2) // bs + 1, dtype=jnp.int32)
    g = start[:, None] // bs + j[None, :]  # [B, J]
    run_lo = jnp.maximum(start[:, None], g * bs)
    run_hi = jnp.minimum((start + q)[:, None], (g + 1) * bs)
    valid = run_lo < run_hi
    lo = jnp.where(valid, run_lo - g * bs, 0).astype(jnp.int32)
    hi = jnp.where(valid, run_hi - g * bs, 0).astype(jnp.int32)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None] * s
    src0 = jnp.where(valid, rows + run_lo - start[:, None], 0).astype(jnp.int32)
    g = jnp.where(valid, g, -1).astype(jnp.int32)
    return g, lo, hi, src0


def _kv_write_kernel(
    # scalar prefetch (SMEM), all [E] flat
    blk_ref,  # target block id, -1 = skip
    lo_ref,  # first block row to overwrite
    hi_ref,  # one-past-last block row
    # inputs
    knew,  # [E, H, bs, D] ANY: per-entry source slab (row r of entry e is
    vnew,  # the new value for block row r — pre-gathered in XLA, since
    #        Mosaic can't DMA-slice a tiled dim at an unaligned dynamic start)
    kc_in,  # [H, NB, bs, D] ANY, aliased to output 0
    vc_in,  # aliased to output 1
    # outputs (same HBM buffers as kc_in/vc_in)
    kc_out,
    vc_out,
    # scratch
    kblk,  # [G, H, bs, D] VMEM
    vblk,
    ksrc,
    vsrc,
    sems,  # [4, G] DMA semaphores
    *,
    bs: int,
    group: int,
):
    step = pl.program_id(0)

    def in_copies(idx, e, blk):
        return (
            pltpu.make_async_copy(kc_in.at[:, blk], kblk.at[idx], sems.at[0, idx]),
            pltpu.make_async_copy(vc_in.at[:, blk], vblk.at[idx], sems.at[1, idx]),
            pltpu.make_async_copy(knew.at[e], ksrc.at[idx], sems.at[2, idx]),
            pltpu.make_async_copy(vnew.at[e], vsrc.at[idx], sems.at[3, idx]),
        )

    # start every group member's reads first so the DMAs overlap
    for idx in range(group):
        e = step * group + idx
        blk = blk_ref[e]

        @pl.when(blk >= 0)
        def _(idx=idx, blk=blk, e=e):
            for c in in_copies(idx, e, blk):
                c.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, bs, 1), 1)
    for idx in range(group):
        e = step * group + idx
        blk = blk_ref[e]

        @pl.when(blk >= 0)
        def _(idx=idx, blk=blk, e=e):
            for c in in_copies(idx, e, blk):
                c.wait()
            m = (rows >= lo_ref[e]) & (rows < hi_ref[e])
            kblk[idx] = jnp.where(m, ksrc[idx], kblk[idx])
            vblk[idx] = jnp.where(m, vsrc[idx], vblk[idx])
            pltpu.make_async_copy(
                kblk.at[idx], kc_out.at[:, blk], sems.at[0, idx]
            ).start()
            pltpu.make_async_copy(
                vblk.at[idx], vc_out.at[:, blk], sems.at[1, idx]
            ).start()

    # write-backs must complete inside this grid step (a later *step* may RMW
    # the same block) but can overlap each other — same-step entries never
    # share a block (see PRECONDITION above)
    for idx in range(group):
        e = step * group + idx
        blk = blk_ref[e]

        @pl.when(blk >= 0)
        def _(idx=idx, blk=blk):
            pltpu.make_async_copy(
                kblk.at[idx], kc_out.at[:, blk], sems.at[0, idx]
            ).wait()
            pltpu.make_async_copy(
                vblk.at[idx], vc_out.at[:, blk], sems.at[1, idx]
            ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_kv_pallas(
    k_cache: jax.Array,  # [H, NB, bs, D] (layer-flat paged cache)
    v_cache: jax.Array,
    k_new: jax.Array,  # [T, H, D], T = B*S new rows
    v_new: jax.Array,
    block_tables: jax.Array,  # [B, MAXB] (layer offsets already applied)
    positions0: jax.Array,  # [B] start position per row
    context_lens: jax.Array,  # [B]
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    h, nb, bs, d = k_cache.shape
    b = block_tables.shape[0]
    t = k_new.shape[0]
    s = t // b

    g, lo, hi, src0 = plan_kv_writes(positions0, context_lens, s, bs)
    blk = jnp.where(
        g >= 0,
        jnp.take_along_axis(block_tables, jnp.maximum(g, 0), axis=1),
        -1,
    ).astype(jnp.int32)

    entries = blk.size
    # group size bounded by VMEM: 4 slab buffers per group member (k/v block
    # + k/v source), ~12 MB budget leaves headroom under the ~16 MB limit
    # (groups >8 measured no better — the grid-step count isn't the binding
    # cost at decode shapes)
    slab_bytes = h * bs * d * jnp.dtype(k_cache.dtype).itemsize
    group = max(1, min(8, entries, (12 << 20) // (4 * slab_bytes)))
    pad = -entries % group
    flat = lambda a: jnp.pad(a.reshape(-1), (0, pad), constant_values=-1)
    blk_f, lo_f, hi_f = flat(blk), flat(lo), flat(hi)

    # Per-entry [H, bs, D] source slabs, gathered in XLA: block row r of
    # entry e pairs with padded source row (bs + src0 - lo) + r. The gather
    # produces a fresh default-layout tensor the kernel can index on its
    # (untiled) leading dim.
    row_idx = (bs + src0 - lo)[:, :, None] + jnp.arange(bs, dtype=jnp.int32)

    def stage(x):
        xp = jnp.pad(x.astype(k_cache.dtype), ((bs, bs), (0, 0), (0, 0)))
        sl = xp[row_idx.reshape(-1)]  # [B*J*bs, H, D]
        sl = sl.reshape(entries, bs, h, d).transpose(0, 2, 1, 3)
        return jnp.pad(sl, ((0, pad), (0, 0), (0, 0), (0, 0)))

    knew, vnew = stage(k_new), stage(v_new)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((entries + pad) // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((group, h, bs, d), k_cache.dtype),
            pltpu.VMEM((group, h, bs, d), k_cache.dtype),
            pltpu.VMEM((group, h, bs, d), k_cache.dtype),
            pltpu.VMEM((group, h, bs, d), k_cache.dtype),
            pltpu.SemaphoreType.DMA((4, group)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kv_write_kernel, bs=bs, group=group),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(blk_f, lo_f, hi_f, knew, vnew, k_cache, v_cache)
