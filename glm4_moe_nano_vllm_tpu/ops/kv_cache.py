"""Paged KV-cache device ops: scatter of new K/V rows, gather of context.

TPU-native replacement for the reference's Triton scatter kernel
(`/root/reference/nanovllm/layers/attention.py:10-42` ``store_kvcache_kernel``):
an XLA scatter with ``mode="drop"`` preserves the reference's ``slot == -1 =
no-op`` padding convention (attention.py:23, model_runner.py:207) — negative
indices are out of bounds and dropped, so fixed-shape padded batches never
write to the cache.

Cache layout per layer: ``[num_kv_heads, num_blocks, block_size, head_dim]``
— *head-major*, so one (head, block) tile is a contiguous [block_size, 128]
slab in HBM: exactly the unit the Pallas paged-attention kernel DMAs into
VMEM. (The reference's token-major [blocks, bs, heads, dim] layout would make
every kernel read strided.) head_dim=128 lands on the TPU lane dimension.
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
    # -1 pad slots must NOT wrap to the last row (numpy negative-index
    # semantics); remap to one-past-end, which mode="drop" discards.
    slots = jnp.where(slot_mapping < 0, nb * bs, slot_mapping)
    kf = k_cache.reshape(h, nb * bs, d)
    vf = v_cache.reshape(h, nb * bs, d)
    kf = kf.at[:, slots].set(
        k_new.transpose(1, 0, 2).astype(kf.dtype), mode="drop"
    )
    vf = vf.at[:, slots].set(
        v_new.transpose(1, 0, 2).astype(vf.dtype), mode="drop"
    )
    return kf.reshape(h, nb, bs, d), vf.reshape(h, nb, bs, d)


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
