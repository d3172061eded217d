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


def write_kv(
    k_cache: jax.Array,  # [H_kv, num_blocks, block_size, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [T, H_kv, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [T] int32; flat slot = block_id*block_size + off; -1 = skip
) -> tuple[jax.Array, jax.Array]:
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
    k_cache: jax.Array,  # [H_kv, num_blocks, block_size, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks] int32 (pad with 0; masked later)
) -> tuple[jax.Array, jax.Array]:
    """Gather each sequence's paged context into dense [H, B, max_blocks*bs, D].

    Reference (XLA) implementation of the context read; the Pallas attention
    kernels read blocks directly from HBM instead of materializing this.
    """
    bt = jnp.maximum(block_tables, 0)
    k = k_cache[:, bt]  # [H, B, max_blocks, bs, D]
    v = v_cache[:, bt]
    h, b, mb, bs, d = k.shape
    return k.reshape(h, b, mb * bs, d), v.reshape(h, b, mb * bs, d)
