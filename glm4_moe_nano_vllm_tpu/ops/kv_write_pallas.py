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
    # inputs (with scaled=True, per-row fp8 scale planes ride along):
    #   knew, vnew [E, H, bs, D]; [ksnew, vsnew [E, H, bs]];
    #   kc_in, vc_in [H, NB, bs, D] (aliased); [ksc_in, vsc_in [H, NB, bs]]
    # outputs mirror the aliased cache inputs
    # scratch: kblk/vblk/ksrc/vsrc [G, H, bs, D]; scale variants [G, H, bs];
    #   sems [n_bufs, G]
    *refs,
    bs: int,
    group: int,
    scaled: bool,
    decode_src: bool,
):
    n_t = 4 if scaled else 2  # tensors per direction (k, v[, ks, vs])
    ins = refs[:n_t]  # knew, vnew[, ksnew, vsnew]
    caches_in = refs[n_t: 2 * n_t]
    caches_out = refs[2 * n_t: 3 * n_t]
    bufs = refs[3 * n_t: 4 * n_t]
    srcs = refs[4 * n_t: 5 * n_t]
    sems = refs[-1]
    step = pl.program_id(0)

    def cache_page(c, t, blk):
        # data caches are head-major [H, NB, bs, D]; scale planes are
        # page-major [NB, H, 1, SL] (one contiguous slab per page)
        return c.at[:, blk] if t < 2 else c.at[blk]

    def in_copies(idx, e, blk):
        cs = []
        for t in range(n_t):
            cs.append(pltpu.make_async_copy(
                cache_page(caches_in[t], t, blk), bufs[t].at[idx],
                sems.at[t, idx]
            ))
            cs.append(pltpu.make_async_copy(
                ins[t].at[e], srcs[t].at[idx], sems.at[n_t + t, idx]
            ))
        return cs

    # start every group member's reads first so the DMAs overlap
    for idx in range(group):
        e = step * group + idx
        blk = blk_ref[e]

        @pl.when(blk >= 0)
        def _(idx=idx, blk=blk, e=e):
            for c in in_copies(idx, e, blk):
                c.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, bs, 1), 1)
    if scaled:  # scale planes: block row r sits at lane r (lane-padded)
        lanes = bufs[2].shape[-1]
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
    for idx in range(group):
        e = step * group + idx
        blk = blk_ref[e]

        @pl.when(blk >= 0)
        def _(idx=idx, blk=blk, e=e):
            for c in in_copies(idx, e, blk):
                c.wait()
            m = (rows >= lo_ref[e]) & (rows < hi_ref[e])
            m2 = ((rows2 >= lo_ref[e]) & (rows2 < hi_ref[e])
                  if scaled else None)
            for t in range(n_t):
                mask = m if t < 2 else m2  # k/v data, then scale planes
                src = srcs[t][idx]
                if decode_src and t < 2:
                    # decode 1-row source (sublane-padded): row 0 is the
                    # new token; broadcast over block rows, mask picks lo.
                    # Static flag from the caller (s == 1), NOT inferred
                    # from scratch shapes (ADVICE r4: a dtype whose sublane
                    # pad equals bs would silently alias).
                    src = src[:, :1]
                bufs[t][idx] = jnp.where(mask, src, bufs[t][idx])
                pltpu.make_async_copy(
                    bufs[t].at[idx], cache_page(caches_out[t], t, blk),
                    sems.at[t, idx]
                ).start()

    # write-backs must complete inside this grid step (a later *step* may RMW
    # the same block) but can overlap each other — same-step entries never
    # share a block (see PRECONDITION above)
    for idx in range(group):
        e = step * group + idx
        blk = blk_ref[e]

        @pl.when(blk >= 0)
        def _(idx=idx, blk=blk):
            for t in range(n_t):
                pltpu.make_async_copy(
                    bufs[t].at[idx], cache_page(caches_out[t], t, blk),
                    sems.at[t, idx]
                ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_kv_pallas(
    k_cache,  # [H, NB, bs, D] (layer-flat paged cache) or fp8 {data, scale}
    v_cache,
    k_new: jax.Array,  # [T, H, D], T = B*S new rows
    v_new: jax.Array,
    block_tables: jax.Array,  # [B, MAXB] (layer offsets already applied)
    positions0: jax.Array,  # [B] start position per row
    context_lens: jax.Array,  # [B]
    interpret: bool = False,
):
    from glm4_moe_nano_vllm_tpu.ops.kv_cache import (
        is_scaled_cache,
        quantize_kv_rows,
    )

    scaled = is_scaled_cache(k_cache)
    if scaled:
        kc_arr, vc_arr = k_cache["data"], v_cache["data"]
        k_new, ks_new = quantize_kv_rows(k_new, k_cache["data"].dtype)
        v_new, vs_new = quantize_kv_rows(v_new, v_cache["data"].dtype)
    else:
        kc_arr, vc_arr = k_cache, v_cache
    h, nb, bs, d = kc_arr.shape
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
    slab_bytes = h * bs * d * jnp.dtype(kc_arr.dtype).itemsize
    group = max(1, min(8, entries, (12 << 20) // (4 * slab_bytes)))
    pad = -entries % group
    flat = lambda a: jnp.pad(a.reshape(-1), (0, pad), constant_values=-1)
    blk_f, lo_f, hi_f = flat(blk), flat(lo), flat(hi)

    # Per-entry [H, bs, D] source slabs, gathered in XLA: block row r of
    # entry e pairs with padded source row (bs + src0 - lo) + r. The gather
    # produces a fresh default-layout tensor the kernel can index on its
    # (untiled) leading dim.
    row_idx = (bs + src0 - lo)[:, :, None] + jnp.arange(bs, dtype=jnp.int32)

    def stage(x, dt):
        xp = jnp.pad(x.astype(dt), ((bs, bs), (0, 0), (0, 0)))
        sl = xp[row_idx.reshape(-1)]  # [B*J*bs, H, D]
        sl = sl.reshape(entries, bs, h, -1).transpose(0, 2, 1, 3)
        return jnp.pad(sl, ((0, pad), (0, 0), (0, 0), (0, 0)))

    if s == 1:
        # decode fast path: one token per sequence -> entry e's source IS
        # row e of k_new/v_new; a [E, H, 1, D] reshape replaces the [E, H,
        # bs, D] slab gather (8 MB gather + transpose per layer per step at
        # Air decode shapes — pure glue). The kernel's select broadcasts
        # the 1-row source across block rows; only row lo (== hi-1) takes
        # it.
        def stage_data(x, dt):
            # row dim padded to the dtype's sublane packing (bf16 2, 8-bit
            # 4) — Mosaic rejects DMA slices unaligned to the tiling
            sub = {2: 2, 1: 4}.get(jnp.dtype(dt).itemsize, 1)
            sl = x.astype(dt)[:, :, None, :]  # [T, H, 1, D]
            return jnp.pad(sl, ((0, pad), (0, 0), (0, sub - 1), (0, 0)))
    else:
        stage_data = stage

    ins = [stage_data(k_new, kc_arr.dtype), stage_data(v_new, vc_arr.dtype)]
    caches = [kc_arr, vc_arr]
    if scaled:
        # scale planes [T, H] stage to [E, H, 1, bs_pad] (one f32 scale per
        # row; singleton keeps the block dim untiled and the lane dim is
        # 128-tile padded, see make_kv_cache)
        lanes = k_cache["scale"].shape[-1]

        def stage_scale(x):
            sl = stage(x[..., None], jnp.float32).transpose(0, 1, 3, 2)
            return jnp.pad(sl, ((0, 0), (0, 0), (0, 0), (0, lanes - bs)))

        ins += [stage_scale(ks_new), stage_scale(vs_new)]
        caches += [k_cache["scale"], v_cache["scale"]]

    n_t = len(caches)
    # scale planes get an EXPLICIT HBM space: their lane dim is bs (< 128 for
    # small blocks), and when ANY resolves small arrays to VMEM, Mosaic
    # rejects sub-128-lane DMA slices of the tiled operand; HBM arrays are
    # untiled and slice freely
    def space(c):
        return pl.BlockSpec(
            memory_space=pltpu.HBM if c.dtype == jnp.float32 and scaled
            else pl.ANY
        )

    # one block buffer per tensor [G, H, bs(, D)] + one source buffer
    # shaped like the staged input (decode stages [E, H, 1, D] — the
    # kernel's select broadcasts the single source row across block rows)
    scratch = (
        # one per-block slab buffer per tensor: data [G, H, bs, D]
        # (page = [:, blk]); scale [G, H, 1, SL] (page-major, page = [blk])
        [pltpu.VMEM((group,) + (c.shape[:1] + c.shape[2:] if t < 2
                                else c.shape[1:]), c.dtype)
         for t, c in enumerate(caches)]
        + [pltpu.VMEM((group,) + i.shape[1:], i.dtype) for i in ins]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((entries + pad) // group,),
        in_specs=[space(i) for i in ins] + [space(c) for c in caches],
        out_specs=[space(c) for c in caches],
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((2 * n_t, group))],
    )
    outs = pl.pallas_call(
        functools.partial(_kv_write_kernel, bs=bs, group=group, scaled=scaled,
                          decode_src=(s == 1)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches],
        input_output_aliases={3 + n_t + i: i for i in range(n_t)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(blk_f, lo_f, hi_f, *ins, *caches)
    if scaled:
        return (
            {"data": outs[0], "scale": outs[2]},
            {"data": outs[1], "scale": outs[3]},
        )
    return outs[0], outs[1]
