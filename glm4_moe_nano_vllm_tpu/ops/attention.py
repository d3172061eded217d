"""Paged attention dispatch: Pallas kernels on TPU, XLA reference elsewhere.

Replaces the reference's FlashAttention calls
(`/root/reference/nanovllm/layers/attention.py:97-107`). The interface is one
unified (prefill+decode) paged attention over HBM KV blocks; decode is the
q_len == 1 special case.
"""

from __future__ import annotations

import functools
import os

import jax

from glm4_moe_nano_vllm_tpu.ops.attention_ref import paged_attention_ref


@functools.cache
def _use_pallas() -> bool:
    if os.environ.get("NVT_FORCE_REF_ATTENTION"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
        import glm4_moe_nano_vllm_tpu.ops.paged_attention_pallas  # noqa: F401

        return True
    except Exception:
        return False


def paged_attention(
    q: jax.Array,  # [B, S_q, H_q, D]
    k_cache: jax.Array,  # [num_blocks, block_size, H_kv, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks]
    context_lens: jax.Array,  # [B]
    positions: jax.Array,  # [B, S_q]
    sm_scale: float,
) -> jax.Array:
    # Mosaic DMA slices need the trailing dim 128-aligned; production head
    # dims are 128 (GLM-4.5 / Qwen3), tiny test models fall back to XLA.
    # The all-heads-per-instance decode kernel beats the XLA gather at every
    # measured capacity (0.53ms vs 0.83ms per layer-step at 512-token
    # capacity, B=64); NVT_PA_MIN_CAPACITY retains an escape hatch.
    kc = k_cache["data"] if isinstance(k_cache, dict) else k_cache
    kv_capacity = block_tables.shape[1] * kc.shape[2]
    min_cap = int(os.environ.get("NVT_PA_MIN_CAPACITY", "0"))
    # fp8 scale planes land one page per sublane in the decode kernel
    # (round 3), so any block size works — no bs % 128 gate anymore
    if (_use_pallas() and q.shape[-1] % 128 == 0 and kv_capacity > min_cap):
        from glm4_moe_nano_vllm_tpu.ops.paged_attention_pallas import (
            paged_attention_pallas,
        )

        return paged_attention_pallas(
            q, k_cache, v_cache, block_tables, context_lens, positions, sm_scale
        )
    return paged_attention_ref(
        q, k_cache, v_cache, block_tables, context_lens, positions, sm_scale
    )
