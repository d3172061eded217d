"""Paged KV-cache device ops: scatter of new K/V rows, gather of context.

TPU-native replacement for the reference's Triton scatter kernel
(`/root/reference/nanovllm/layers/attention.py:10-42` ``store_kvcache_kernel``):
an XLA scatter with ``mode="drop"`` preserves the reference's ``slot == -1 =
no-op`` padding convention (attention.py:23, model_runner.py:207) — negative
indices are out of bounds and dropped, so fixed-shape padded batches never
write to the cache.

Cache layout: ``[num_kv_heads, L*num_blocks, block_size, head_dim]`` — one
*layer-flat* array per model stack (layer l's blocks live at
[l*num_blocks, (l+1)*num_blocks)), *head-major*, so one (head, block) tile is
a contiguous [block_size, 128] slab in HBM: exactly the unit the Pallas
paged-attention kernel DMAs into VMEM. (The reference's token-major
[blocks, bs, heads, dim] layout would make every kernel read strided.)
head_dim=128 lands on the TPU lane dimension. Flattening layers into the
block dim (instead of a stacked [L, ...] axis scanned as xs/ys) lets the
model carry the whole cache through its layer scan and update it with an
in-place scatter — layer offsets are applied to slot_mapping/block_tables,
and the kernels are layout-agnostic (they only chase block-table values).
"""

import jax
import jax.numpy as jnp

# Quantized (fp8-e4m3 or int8) KV storage is scaled per (token-row, head): a
# cache leaf becomes {"data": e4m3/i8 [H, NB, bs, D], "scale": f32
# [H, NB, bs]}. Per-row scales are write-incremental (a block filling over
# several steps never needs its old rows re-quantized — a true per-block
# scale would) and strictly tighter than per-block. Dequant folds into the
# attention math: scores *= k_scale_row and p *= v_scale_row, so quantized
# data is never materialized as bf16 tiles (SURVEY §7 plan: "e4m3 +
# per-block scale", refined). INT8 exists because v5e has a native int8->f32
# vector convert while e4m3->f32 does not (fp8 decode measured 1.6x bf16,
# BENCHMARKS.md round-3): same capacity halving, near-native decode cost.
FP8_MAX = 448.0  # float8_e4m3fn finite max
INT8_MAX = 127.0

# dtype -> per-row quantization ceiling for scaled KV caches
SCALED_KV_QMAX = {
    jnp.dtype(jnp.float8_e4m3fn): FP8_MAX,
    jnp.dtype(jnp.int8): INT8_MAX,
}


def is_scaled_cache(cache) -> bool:
    return isinstance(cache, dict) and "scale" in cache


def make_kv_cache(shape, dtype):
    """One cache leaf: a plain array, or a {data, scale} dict for fp8/int8.

    Scales are PAGE-MAJOR [NB, H, 1, bs_pad]: one page's scales for every
    head form a single contiguous f32 slab, so the attention kernels fetch
    them with ONE DMA descriptor per page (the round-4 head-major layout
    [H, NB, 1, SL] split each page fetch into H strided 512 B pieces —
    measured ~0.5 ms/layer of pure DMA-issue cost at ctx 4096, batch 128).
    The block dim stays UNTILED (Mosaic can only DMA-slice untiled dims at
    dynamic offsets) and the lane dim is padded to the 128-lane tile
    (Mosaic rejects sub-tile lane slices)."""
    if jnp.dtype(dtype) in SCALED_KV_QMAX:
        h, nb, bs, _ = shape
        return {
            "data": jnp.zeros(shape, dtype),
            "scale": jnp.zeros((nb, h, 1, scale_lanes(bs)), jnp.float32),
        }
    return jnp.zeros(shape, dtype)


def scale_lanes(bs: int) -> int:
    """Lane-padded width of the per-row scale plane (128-lane tiles)."""
    return -(-bs // 128) * 128


def quantize_kv_rows(x: jax.Array, dtype=jnp.float8_e4m3fn
                     ) -> tuple[jax.Array, jax.Array]:
    """[T, H, D] → (e4m3/i8 values, f32 scales [T, H])."""
    qmax = SCALED_KV_QMAX[jnp.dtype(dtype)]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / qmax, 1e-12)
    q = x.astype(jnp.float32) / scale[..., None]
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        q = jnp.clip(jnp.round(q), -INT8_MAX, INT8_MAX)
    return q.astype(dtype), scale


def write_kv(
    k_cache,  # [H_kv, num_blocks, block_size, D] array or fp8 {data, scale}
    v_cache,
    k_new: jax.Array,  # [T, H_kv, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [T] int32; flat slot = block_id*block_size + off; -1 = skip
):
    if is_scaled_cache(k_cache):
        kq, ks = quantize_kv_rows(k_new, k_cache["data"].dtype)
        vq, vs = quantize_kv_rows(v_new, v_cache["data"].dtype)
        nb, bs = k_cache["data"].shape[1], k_cache["data"].shape[2]
        invalid = slot_mapping < 0
        bidx = jnp.where(invalid, nb, slot_mapping // bs)
        boff = jnp.where(invalid, 0, slot_mapping % bs)

        def scatter(cache, vals, scales):
            return {
                "data": cache["data"].at[:, bidx, boff].set(
                    vals.transpose(1, 0, 2), mode="drop"
                ),
                # page-major scale plane [NB, H, 1, SL]: row (bidx, boff)
                # of every head takes its [T, H] scale
                "scale": cache["scale"].at[bidx, :, 0, boff].set(
                    scales, mode="drop"
                ),
            }

        return scatter(k_cache, kq, ks), scatter(v_cache, vq, vs)
    h, nb, bs, d = k_cache.shape
    # Scatter in the native 4-D layout: reshaping [H, NB, bs, D] to merge the
    # (block, offset) dims re-tiles the array on TPU — a physical full-cache
    # copy per call, which defeats in-place carry updates. -1 pad slots must
    # NOT wrap (numpy negative-index semantics); remap to an out-of-bounds
    # block, which mode="drop" discards.
    invalid = slot_mapping < 0
    bidx = jnp.where(invalid, nb, slot_mapping // bs)
    boff = jnp.where(invalid, 0, slot_mapping % bs)
    k_cache = k_cache.at[:, bidx, boff].set(
        k_new.transpose(1, 0, 2).astype(k_cache.dtype), mode="drop"
    )
    v_cache = v_cache.at[:, bidx, boff].set(
        v_new.transpose(1, 0, 2).astype(v_cache.dtype), mode="drop"
    )
    return k_cache, v_cache


def gather_kv(
    k_cache,  # [H_kv, num_blocks, block_size, D] array or fp8 {data, scale}
    v_cache,
    block_tables: jax.Array,  # [B, max_blocks] int32 (pad with 0; masked later)
) -> tuple[jax.Array, jax.Array]:
    """Gather each sequence's paged context into dense [H, B, max_blocks*bs, D].

    Reference (XLA) implementation of the context read; the Pallas attention
    kernels read blocks directly from HBM instead of materializing this.
    FP8 caches are dequantized here (scale per row).
    """
    bt = jnp.maximum(block_tables, 0)

    def one(cache):
        if is_scaled_cache(cache):
            x = cache["data"][:, bt].astype(jnp.float32)
            bs = x.shape[-2]
            # page-major scale plane: [NB, H, 1, SL] -> [H, B, mb, bs]
            s = cache["scale"][bt, :, 0, :bs].astype(jnp.float32)
            s = jnp.moveaxis(s, 2, 0)
            x = x * s[..., None]
        else:
            x = cache[:, bt]  # [H, B, max_blocks, bs, D]
        h, b, mb, bs, d = x.shape
        return x.reshape(h, b, mb * bs, d)

    return one(k_cache), one(v_cache)
