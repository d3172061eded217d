"""Pallas TPU flash-prefill kernel over the paged KV cache.

TPU-native replacement for the reference's ``flash_attn_varlen_func`` prefill
(`/root/reference/nanovllm/layers/attention.py:97-100`, including the
block_table path used on prefix-cache hits). Queries are the step's new
tokens (2D-padded [B, S_q]); keys/values are each sequence's *full* context
read from the paged cache — so prefix-cache hits and chunked prefill are the
same code path (a chunk's queries attend to everything already cached plus
the chunk itself, with a causal offset of q_start = ctx_len - q_len).

Grid = (batch, kv_head, q_tile). Each instance flash-iterates over the KV
blocks visible to its query tile (causal upper bound), double-buffering block
DMAs like the decode kernel. GQA handled by flattening the G query heads of
the kv head into rows of the score matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _prefill_kernel(
    ctx_ref,  # [B, 1] int32 SMEM (full)
    qlen_ref,  # [B, 1] int32 SMEM (full)
    bt_ref,  # [B, MAXB] int32 SMEM (full)
    *refs,  # q [1, TQ, 1, G, D]; k/v [Hkv, NB, bs, D] ANY (+ fp8 scale
    #         planes ks/vs [Hkv, NB, 1, bs] ANY); o; scratch k/v [2, bs, D]
    #         (+ ks/vs [2, 1, bs]); sems [2 or 4, 2]
    block_size: int,
    sm_scale: float,
    tq: int,
    g: int,
    scaled: bool,
):
    if scaled:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
         k_scr, v_scr, ks_scr, vs_scr, sems) = refs
        tensors = ((k_hbm, k_scr), (v_hbm, v_scr),
                   (ks_hbm, ks_scr), (vs_hbm, vs_scr))
    else:
        q_ref, k_hbm, v_hbm, o_ref, k_scr, v_scr, sems = refs
        tensors = ((k_hbm, k_scr), (v_hbm, v_scr))
    b = pl.program_id(0)
    h = pl.program_id(1)
    t = pl.program_id(2)
    ctx = ctx_ref[b, 0]
    qlen = qlen_ref[b, 0]
    q_start = ctx - qlen
    tile_start = t * tq
    rows = tq * g
    d = q_ref.shape[-1]

    def dma(tensor_idx, slot, blk_idx):
        hbm, scr = tensors[tensor_idx]
        blk = bt_ref[b, blk_idx]
        # data caches head-major [Hkv, NB, bs, D]; scale planes page-major
        # [NB, Hkv, 1, SL] (see ops/kv_cache.py::make_kv_cache)
        src = hbm.at[h, blk] if tensor_idx < 2 else hbm.at[blk, h]
        return pltpu.make_async_copy(src, scr.at[slot],
                                     sems.at[tensor_idx, slot])

    @pl.when(tile_start >= qlen)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(tile_start < qlen)
    def _():
        # causal upper bound (exclusive) on kv positions for this tile
        hi = q_start + jnp.minimum(qlen, tile_start + tq)
        nblks = pl.cdiv(hi, block_size)

        for ti in range(len(tensors)):
            dma(ti, 0, 0).start()

        q = q_ref[0, :, 0].astype(jnp.float32) * sm_scale  # [TQ, G, D]
        q2 = q.reshape(rows, d)
        # query row r ↔ (token tile_start + r // G, head g = r % G)
        row_tok = tile_start + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // g
        row_pos = q_start + row_tok  # global position of each query row
        row_valid = row_tok < qlen

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < nblks)
            def _():
                nxt = jax.lax.rem(i + 1, 2)
                for ti in range(len(tensors)):
                    dma(ti, nxt, i + 1).start()

            for ti in range(len(tensors)):
                dma(ti, slot, i).wait()
            k = k_scr[slot].astype(jnp.float32)  # [bs, D]
            v = v_scr[slot].astype(jnp.float32)

            s = jax.lax.dot_general(
                q2, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rows, bs]
            if scaled:  # fp8: per-row k scale folds into the scores
                s = s * ks_scr[slot][0, :block_size][None, :]
            kv_pos = i * block_size + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_size), 1
            )
            mask = (kv_pos <= row_pos) & (kv_pos < ctx) & row_valid
            s = jnp.where(mask, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            # explicit re-mask: a fully-masked row has m_new == NEG_INF and
            # exp(s - m_new) == 1 would poison l/acc
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = (p * vs_scr[slot][0, :block_size][None, :]
                  if scaled else p)
            acc_new = acc * alpha + jnp.dot(
                pv, v, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((rows, 1), jnp.float32)
        acc0 = jnp.zeros((rows, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        out = jnp.where(l > 0, acc / jnp.maximum(l, 1e-30), 0.0)
        o_ref[0, :, 0] = out.reshape(tq, g, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def paged_prefill(
    q: jax.Array,  # [B, S_q, Hq, D]
    k_cache,  # [Hkv, NB, bs, D] or fp8 {data, scale [Hkv, NB, 1, bs]}
    v_cache,
    block_tables: jax.Array,  # [B, MAXB]
    context_lens: jax.Array,  # [B]
    q_lens: jax.Array,  # [B] number of real query tokens per sequence
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    from glm4_moe_nano_vllm_tpu.ops.kv_cache import is_scaled_cache

    scaled = is_scaled_cache(k_cache)
    caches = (
        [k_cache["data"], v_cache["data"], k_cache["scale"], v_cache["scale"]]
        if scaled else [k_cache, v_cache]
    )
    kc, vc = caches[0], caches[1]
    b, sq, hq, d = q.shape
    hkv, nb, bs, _ = kc.shape
    assert hq % hkv == 0
    g = hq // hkv
    maxb = block_tables.shape[1]

    # Each q tile flash-iterates its full causal context, so total KV traffic
    # scales with n_tiles x ctx — larger tiles amortize context re-reads
    # (decisive at 32K: 2x fewer tiles = 2x less HBM read). 1024 score rows
    # is the largest tile that keeps the f32 scores/p/acc/q + pipeline
    # buffers under the 16 MB VMEM scoped-allocation limit.
    tq = max(8, min(sq, 1024 // g))
    n_tiles = pl.cdiv(sq, tq)
    q5 = q.reshape(b, sq, hkv, g, d)

    scratch = [
        pltpu.VMEM((2, bs, d), kc.dtype),
        pltpu.VMEM((2, bs, d), vc.dtype),
    ]
    if scaled:
        lanes = k_cache["scale"].shape[-1]  # 128-lane-padded bs
        scratch += [pltpu.VMEM((2, 1, lanes), jnp.float32)] * 2
    scratch.append(pltpu.SemaphoreType.DMA((len(caches), 2)))
    out = pl.pallas_call(
        functools.partial(
            _prefill_kernel, block_size=bs, sm_scale=sm_scale, tq=tq, g=g,
            scaled=scaled,
        ),
        grid=(b, hkv, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, 1, g, d), lambda i, j, t: (i, t, j, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            # scale planes pinned to HBM (sub-128-lane slices)
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * (len(caches) - 2),
        out_specs=pl.BlockSpec((1, tq, 1, g, d), lambda i, j, t: (i, t, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hkv, g, d), q.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * maxb * bs * d // 2,
            bytes_accessed=2 * b * hkv * maxb * bs * d * kc.dtype.itemsize,
            transcendentals=b * hq * sq * maxb * bs // 2,
        ),
        interpret=interpret,
    )(
        context_lens.reshape(b, 1),
        q_lens.reshape(b, 1),
        block_tables,
        q5,
        *caches,
    )
    return out.reshape(b, sq, hq, d)


def paged_prefill_pallas(
    q, k_cache, v_cache, block_tables, context_lens, positions, sm_scale
):
    """Adapter from the unified signature (positions array → q_lens).

    The runner builds positions as [q_start, q_start+1, ...] with 0-padding
    and context_lens = q_start + q_len, so q_len = ctx - positions[:, 0]
    for real sequences (padded sequences have ctx == 0 → q_len 0).
    """
    q_lens = jnp.maximum(context_lens - positions[:, 0], 0)
    return paged_prefill(
        q, k_cache, v_cache, block_tables, context_lens, q_lens, sm_scale
    )
