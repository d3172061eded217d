"""Pallas TPU paged-attention decode kernel.

TPU-native replacement for the reference's ``flash_attn_with_kvcache`` CUDA
call (`/root/reference/nanovllm/layers/attention.py:105-107`): one query token
per sequence attends over its paged KV context addressed by a block table.

Design (per SURVEY §7 "hard parts" #2). Decode is HBM-latency bound at serving
batch sizes — each sequence touches only a few KV pages — so the kernel is
organized to amortize per-grid-step and per-DMA overhead:

  * grid = (batch, kv_chunk): **all KV heads of a sequence are processed in
    one instance** — the head-major cache layout [Hkv, NB, bs, D] lets one
    *strided* DMA fetch a page across every head (``k_hbm.at[:, page]`` →
    [Hkv, bs, D]), cutting both DMA count and grid size Hkv-fold vs a
    per-head grid;
  * the flash loop over KV chunks is a grid dimension; running softmax state
    (m, l, unnormalized acc per head) lives in VMEM scratch, re-initialized
    at chunk == 0, normalized output written at each sequence's last chunk;
    chunks past a sequence's context length are skipped, so short sequences
    read only ceil(len / chunk) pages, not the padded table capacity (the
    XLA gather fallback always reads full capacity);
  * every step prefetches the *next schedulable* (seq, chunk)'s pages into
    the alternate buffer — across sequence boundaries, skipping empty
    (padded) sequences — so the DMA engine never drains between grid steps
    (the lookahead-skip structure follows the public JAX paged-attention
    kernel's pipelining scheme);
  * block tables + context lengths are scalar-prefetched into SMEM;
    buffer-index and first-step flags are tiny mutable SMEM inputs;
  * padded sequences (context_len == 0) produce zeroed output rows.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# decode compute-chunk size in tokens. Config.pa_chunk_tokens sets it per
# engine (ModelRunner calls set_pa_chunk before tracing); NVT_PA_CHUNK is a
# tuning-session override.
_PA_CHUNK = int(os.environ.get("NVT_PA_CHUNK", "256"))


def set_pa_chunk(tokens: int) -> None:
    global _PA_CHUNK
    if not os.environ.get("NVT_PA_CHUNK"):
        _PA_CHUNK = tokens


class _ChunkCopy:
    """Async copy of ``bpc`` KV pages (all heads per page) into VMEM.

    Pages at or past ``pages_needed`` (the sequence's real context) are
    skipped — start and wait use the same predicate — so large chunks
    (deep DMA queues) don't over-read short contexts."""

    def __init__(self, hbm_ref, buf, sem, pi_ref, page_offset, bpc,
                 first_page, pages_needed):
        self.entries = []
        for j in range(bpc):
            page = pi_ref[page_offset + j]
            cond = first_page + j < pages_needed
            # [Hkv, bs, D] strided slab: one descriptor covers every head
            self.entries.append(
                (pltpu.make_async_copy(hbm_ref.at[:, page], buf.at[:, j], sem),
                 cond)
            )

    def start(self):
        for c, cond in self.entries:
            pl.when(cond)(c.start)

    def wait(self):
        for c, cond in self.entries:
            pl.when(cond)(c.wait)


class _ScaleChunkCopy(_ChunkCopy):
    """fp8/int8 per-row scale planes, PAGE-MAJOR [NB, Hkv, 1, SL] (SL =
    128-lane-padded bs, ops/kv_cache.py::scale_lanes): one page's scales
    for every head are a single contiguous slab, so each page costs ONE
    DMA descriptor (the head-major layout split it into Hkv strided 512 B
    pieces — measured ~0.5 ms/layer of DMA-issue cost at ctx 4096). Pages
    land at ``buf[j]`` of a [bpc, Hkv, 1, SL] buffer; the kernel compacts
    the first bs lanes of each page into the [Hkv, 1, chunk] score
    multiplier with bpc static lane-concats (full-tile at bs == 128)."""

    def __init__(self, hbm_ref, buf, sem, pi_ref, page_offset, bpc,
                 first_page, pages_needed):
        self.entries = []
        for j in range(bpc):
            page = pi_ref[page_offset + j]
            cond = first_page + j < pages_needed
            self.entries.append(
                (pltpu.make_async_copy(
                    hbm_ref.at[page], buf.at[j], sem),
                 cond)
            )


def _decode_kernel(
    # scalar prefetch (SMEM)
    len_ref,  # [B] int32 context lengths
    pi_ref,  # [B * MAXB] int32 flattened block tables
    buf_ref,  # [1] int32 current buffer slot (mutable)
    init_ref,  # [1] int32 first-executed-step flag (mutable)
    # inputs: q [1, Hkv, G, D] VMEM; k/v caches [Hkv, NB, bs, D] ANY;
    #   scaled=True adds ks/vs [Hkv, NB, 1, bs] f32 ANY (fp8 per-row scales)
    # output: o [1, Hkv, G, D]
    # scratch: m/l [Hkv, G, 1] f32; acc [Hkv, G, D] f32;
    #   k/v bufs [2, Hkv, bpc, bs, D]; (+ ks/vs bufs [2, Hkv, bpc, 1, bs]);
    #   sems [2 or 4, 2]
    *refs,
    block_size: int,
    sm_scale: float,
    bpc: int,
    maxb: int,
    batch: int,
    scaled: bool,
):
    if scaled:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
         m_scr, l_scr, acc_scr, k_buf, v_buf, ks_buf, vs_buf, sems) = refs
    else:
        (q_ref, k_hbm, v_hbm, o_ref,
         m_scr, l_scr, acc_scr, k_buf, v_buf, sems) = refs
        ks_buf = vs_buf = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    chunk = block_size * bpc
    length = len_ref[b]

    def copies_for(b_, i_, slot):
        off = b_ * maxb + i_ * bpc
        first = i_ * bpc
        needed = (len_ref[jax.lax.clamp(0, b_, batch - 1)]
                  + block_size - 1) // block_size
        cs = [
            _ChunkCopy(k_hbm, k_buf.at[slot], sems.at[0, slot], pi_ref, off,
                       bpc, first, needed),
            _ChunkCopy(v_hbm, v_buf.at[slot], sems.at[1, slot], pi_ref, off,
                       bpc, first, needed),
        ]
        if scaled:
            cs.append(_ScaleChunkCopy(ks_hbm, ks_buf.at[slot],
                                      sems.at[2, slot], pi_ref, off, bpc,
                                      first, needed))
            cs.append(_ScaleChunkCopy(vs_hbm, vs_buf.at[slot],
                                      sems.at[3, slot], pi_ref, off, bpc,
                                      first, needed))
        return cs

    def next_indices(b_, i_):
        """First schedulable (b, i) at or after the given one (scan i→b,
        skipping finished and empty/padded sequences)."""

        def adv_b():
            nb = jax.lax.while_loop(
                lambda x: jnp.logical_and(
                    x < batch, len_ref[jax.lax.clamp(0, x, batch - 1)] == 0
                ),
                lambda x: x + 1,
                b_ + 1,
            )
            return nb, 0

        return jax.lax.cond(
            i_ * chunk < len_ref[jax.lax.clamp(0, b_, batch - 1)],
            lambda: (b_, i_),
            adv_b,
        )

    @pl.when(i == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        o_ref[...] = jnp.zeros_like(o_ref)  # padded seqs stay zero

    @pl.when(i * chunk < length)
    def _():
        buf = buf_ref[0]

        @pl.when(init_ref[0] == 1)
        def _():
            # zero both buffer slots once: pages past a sequence's context
            # are never DMA'd, and uninitialized VMEM could hold NaNs that
            # poison the masked p=0 * v accumulation (0 * NaN = NaN)
            k_buf[...] = jnp.zeros_like(k_buf)
            v_buf[...] = jnp.zeros_like(v_buf)
            if scaled:
                ks_buf[...] = jnp.zeros_like(ks_buf)
                vs_buf[...] = jnp.zeros_like(vs_buf)
            for c in copies_for(b, i, buf):
                c.start()

        init_ref[0] = 0

        nb, ni = next_indices(b, i + 1)

        @pl.when(nb < batch)
        def _():
            for c in copies_for(nb, ni, 1 - buf):
                c.start()

        # flip only when a prefetch was actually issued
        buf_ref[0] = jnp.where(nb < batch, 1 - buf, buf)

        cs = copies_for(b, i, buf)
        q = q_ref[0].astype(jnp.float32) * sm_scale  # [Hkv, G, D]
        cs[0].wait()
        hkv = q.shape[0]
        k = k_buf[buf].reshape(hkv, chunk, -1).astype(jnp.float32)
        # [Hkv, G, chunk] batched over heads
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        def compact_scales(sbuf):
            # [bpc, hkv, 1, SL] -> [hkv, 1, chunk]: first bs lanes per page
            return jnp.concatenate(
                [sbuf[j, :, :, :block_size] for j in range(bpc)], axis=-1
            )

        if scaled:
            # fp8 dequant folds into the scores: one multiply per kv row
            cs[2].wait()
            s = s * compact_scales(ks_buf[buf])  # [hkv, 1, chunk] over G
        # causal/length masking is only needed on a sequence's LAST chunk
        # (earlier chunks are fully inside the context); branching on the
        # scalar saves the iota+compare+select VPU passes on every full
        # chunk — the kernel is per-chunk-VPU-bound at KV-read-heavy
        # contexts (BENCHMARKS.md round 5)
        def _mask(sv):
            pos = i * chunk + jax.lax.broadcasted_iota(jnp.int32, sv.shape, 2)
            return jnp.where(pos < length, sv, NEG_INF)

        s = jax.lax.cond((i + 1) * chunk > length, _mask, lambda sv: sv, s)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        # the softmax denominator is accumulated as a PER-LANE partial-sum
        # vector [Hkv, G, 128] (full-lane-tile adds, chunk//128 of them)
        # instead of a per-chunk lane-tree reduction to a scalar; the single
        # scalar reduce happens once at the output step
        if chunk % 128 == 0:
            lp = p[:, :, :128]
            for t in range(1, chunk // 128):
                lp = lp + p[:, :, t * 128:(t + 1) * 128]
        else:  # odd tail chunk (maxb not divisible): plain lane reduce
            lp = jnp.sum(p, axis=-1, keepdims=True)
        l_new = l_prev * alpha + lp
        cs[1].wait()
        v = v_buf[buf].reshape(hkv, chunk, -1).astype(jnp.float32)
        if scaled:
            # v's per-row scale folds into p (p @ (v*s) == (p*s) @ v)
            cs[3].wait()
            p = p * compact_scales(vs_buf[buf])  # [hkv, 1, chunk]
        acc_new = acc_scr[...] * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        m_scr[...], l_scr[...], acc_scr[...] = m_new, l_new, acc_new

        @pl.when((i + 1) * chunk >= length)
        def _():
            l_tot = jnp.sum(l_new, axis=-1, keepdims=True)
            o_ref[0] = (
                acc_new / jnp.maximum(l_tot, 1e-30)
            ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def paged_attention_decode(
    q: jax.Array,  # [B, Hq, D]
    k_cache,  # [Hkv, NB, bs, D] or fp8 {data, scale [Hkv, NB, 1, bs]}
    v_cache,
    block_tables: jax.Array,  # [B, MAXB] int32
    context_lens: jax.Array,  # [B] int32
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    from glm4_moe_nano_vllm_tpu.ops.kv_cache import is_scaled_cache

    scaled = is_scaled_cache(k_cache)
    kc = k_cache["data"] if scaled else k_cache
    vc = v_cache["data"] if scaled else v_cache
    b, hq, d = q.shape
    hkv, nb, bs, _ = kc.shape
    assert hq % hkv == 0
    g = hq // hkv
    maxb = block_tables.shape[1]
    # pages per compute chunk: ~256-token chunks bound wasted reads past each
    # sequence's length while keeping the page DMAs per grid step batched
    bpc = max(1, min(maxb, _PA_CHUNK // bs))
    while maxb % bpc:  # partial tail chunks would read past the block table
        bpc -= 1
    cmax = pl.cdiv(maxb, bpc)

    q4 = q.reshape(b, hkv, g, d)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    # scale planes pinned to HBM (sub-128-lane slices; see kv_write_pallas)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    caches = [kc, vc] + ([k_cache["scale"], v_cache["scale"]] if scaled else [])
    cache_specs = [any_spec, any_spec] + [hbm_spec] * (len(caches) - 2)
    chunk = bs * bpc
    scratch = [
        pltpu.VMEM((hkv, g, 1), jnp.float32),
        # l is a [*, 128] per-lane partial-sum vector when the chunk is a
        # whole number of lane tiles (the usual case); scalar otherwise
        pltpu.VMEM((hkv, g, 128 if chunk % 128 == 0 else 1), jnp.float32),
        pltpu.VMEM((hkv, g, d), jnp.float32),
        pltpu.VMEM((2, hkv, bpc, bs, d), kc.dtype),
        pltpu.VMEM((2, hkv, bpc, bs, d), vc.dtype),
    ]
    if scaled:
        sl = k_cache["scale"].shape[-1]  # 128-lane-padded bs
        scratch += [pltpu.VMEM((2, bpc, hkv, 1, sl), jnp.float32)] * 2
    scratch.append(pltpu.SemaphoreType.DMA((len(caches), 2)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, cmax),
        in_specs=[pl.BlockSpec((1, hkv, g, d), lambda i, c, *_: (i, 0, 0, 0))]
        + cache_specs,
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda i, c, *_: (i, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            block_size=bs,
            sm_scale=sm_scale,
            bpc=bpc,
            maxb=maxb,
            batch=b,
            scaled=scaled,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        context_lens,
        block_tables.reshape(-1),
        jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), jnp.int32),
        q4,
        *caches,
    )
    return out.reshape(b, hq, d)


def paged_attention_pallas(
    q: jax.Array,  # [B, S_q, Hq, D]
    k_cache: jax.Array,
    v_cache: jax.Array,
    block_tables: jax.Array,
    context_lens: jax.Array,
    positions: jax.Array,
    sm_scale: float,
) -> jax.Array:
    """Dispatch wrapper matching the unified paged-attention signature."""
    b, sq, hq, d = q.shape
    if sq == 1:
        out = paged_attention_decode(
            q[:, 0], k_cache, v_cache, block_tables, context_lens, sm_scale
        )
        return out[:, None]
    from glm4_moe_nano_vllm_tpu.ops.prefill_pallas import paged_prefill_pallas

    return paged_prefill_pallas(
        q, k_cache, v_cache, block_tables, context_lens, positions, sm_scale
    )
