"""Reference (pure-XLA) paged attention, both prefill and decode.

This is the numerics oracle for the Pallas kernels and the fallback path on
non-TPU backends. It replaces the reference's FlashAttention-2 calls
(`/root/reference/nanovllm/layers/attention.py:97-107`:
``flash_attn_varlen_func`` for prefill with block tables,
``flash_attn_with_kvcache`` for decode) with one unified computation:

    Q: the step's new tokens, padded 2D [B, S_q, H_q, D]
    K/V: the full per-sequence context gathered from the paged cache
    mask: kv_pos <= q_pos (causal over global positions) and kv_pos < ctx_len

Because K/V always come from the cache (after the step's scatter), prefix-
cache hits and chunked prefill need no special casing: a chunk's queries
attend to every previously cached token plus the chunk itself.
"""

import jax
import jax.numpy as jnp

from glm4_moe_nano_vllm_tpu.ops.kv_cache import gather_kv

NEG_INF = -1e30


def paged_attention_ref(
    q: jax.Array,  # [B, S_q, H_q, D]
    k_cache: jax.Array,  # [H_kv, num_blocks, bs, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks]
    context_lens: jax.Array,  # [B] total KV length (incl. this step's tokens)
    positions: jax.Array,  # [B, S_q] global position of each query token
    sm_scale: float,
) -> jax.Array:
    b, sq, hq, d = q.shape
    k, v = gather_kv(k_cache, v_cache, block_tables)  # [H_kv, B, S_kv, D]
    hkv = k.shape[0]
    skv = k.shape[2]
    assert hq % hkv == 0
    g = hq // hkv

    qf = q.astype(jnp.float32) * sm_scale
    qf = qf.reshape(b, sq, hkv, g, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # scores: [B, H_kv, G, S_q, S_kv]
    scores = jnp.einsum("bqhgd,hbkd->bhgqk", qf, kf)
    kv_pos = jnp.arange(skv, dtype=jnp.int32)[None, :]  # [1, S_kv]
    causal = kv_pos[None, :, :] <= positions[:, :, None]  # [B, S_q, S_kv]
    valid = kv_pos < context_lens[:, None]  # [B, S_kv]
    mask = causal & valid[:, None, :]
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,hbkd->bqhgd", probs, vf)
    return out.reshape(b, sq, hq, d).astype(q.dtype)
