"""Paged KV-cache device ops: scatter of new K/V rows, gather of context.

TPU-native replacement for the reference's Triton scatter kernel
(`/root/reference/nanovllm/layers/attention.py:10-42` ``store_kvcache_kernel``):
an XLA scatter with ``mode="drop"`` preserves the reference's ``slot == -1 =
no-op`` padding convention (attention.py:23, model_runner.py:207) — negative
indices are out of bounds and dropped, so fixed-shape padded batches never
write to the cache.

Cache layout per layer: ``[num_blocks, block_size, num_kv_heads, head_dim]``.
A flat view ``[num_blocks * block_size, H, D]`` makes slot mapping a single
index. head_dim=128 lands on the TPU lane dimension.
"""

import jax
import jax.numpy as jnp


def write_kv(
    k_cache: jax.Array,  # [num_blocks, block_size, H_kv, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [T, H_kv, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [T] int32; flat slot = block_id*block_size + off; -1 = skip
) -> tuple[jax.Array, jax.Array]:
    nb, bs, h, d = k_cache.shape
    kf = k_cache.reshape(nb * bs, h, d)
    vf = v_cache.reshape(nb * bs, h, d)
    kf = kf.at[slot_mapping].set(k_new.astype(kf.dtype), mode="drop")
    vf = vf.at[slot_mapping].set(v_new.astype(vf.dtype), mode="drop")
    return kf.reshape(nb, bs, h, d), vf.reshape(nb, bs, h, d)


def gather_kv(
    k_cache: jax.Array,  # [num_blocks, block_size, H_kv, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks] int32 (pad with 0; masked later)
) -> tuple[jax.Array, jax.Array]:
    """Gather each sequence's paged context into dense [B, max_blocks*bs, H, D].

    Reference (XLA) implementation of the context read; the Pallas attention
    kernels read blocks directly from HBM instead of materializing this.
    """
    bt = jnp.maximum(block_tables, 0)
    k = k_cache[bt]  # [B, max_blocks, bs, H, D]
    v = v_cache[bt]
    b, mb, bs, h, d = k.shape
    return k.reshape(b, mb * bs, h, d), v.reshape(b, mb * bs, h, d)
