"""Rotary position embeddings (non-interleaved half-split, partial-rotary).

Semantics match the reference (`/root/reference/nanovllm/layers/rotary_embedding.py`):
  * half-split application: x1/x2 are the two halves of the rotary span,
    y1 = x1*cos - x2*sin, y2 = x2*cos + x1*sin (rotary_embedding.py:6-14);
  * partial rotary: only the first ``head_dim * partial_rotary_factor`` lanes
    rotate, the rest pass through (GLM-4 MoE uses 0.5,
    rotary_embedding.py:68-70);
  * fp32 math, cast back to the input dtype.

TPU-first difference: no precomputed [max_pos, rot] cos/sin cache + gather —
cos/sin are computed from positions inside the jitted step (an outer product
the VPU handles for free, and it keeps HBM traffic at zero).
"""

import jax
import jax.numpy as jnp


def rope_inv_freq(rotary_dim: int, base: float) -> jax.Array:
    exponent = jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim
    return 1.0 / (base ** exponent)  # [rotary_dim // 2]


def rope_cos_sin(
    positions: jax.Array,  # [...] int32
    inv_freq: jax.Array,  # [rotary_dim // 2]
) -> tuple[jax.Array, jax.Array]:
    """Positions -> (cos, sin) [..., 1, rot/2], shared by every layer of a
    step (positions are layer-invariant: computing this inside the layer
    scan re-ran the outer product + cos/sin per layer per micro-step)."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., rot/2]
    return jnp.cos(freqs)[..., None, :], jnp.sin(freqs)[..., None, :]


def apply_rope(
    q: jax.Array,  # [..., num_q_heads, head_dim]
    k: jax.Array,  # [..., num_kv_heads, head_dim]
    positions: jax.Array,  # [...] int32, broadcastable over the token dims
    inv_freq: jax.Array,  # [rotary_dim // 2]
    rotary_dim: int,
    cos_sin: tuple[jax.Array, jax.Array] | None = None,  # precomputed
) -> tuple[jax.Array, jax.Array]:
    cos, sin = (rope_cos_sin(positions, inv_freq) if cos_sin is None
                else cos_sin)

    def rot(x):
        x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
        x1, x2 = jnp.split(x_rot.astype(jnp.float32), 2, axis=-1)
        y1 = x1 * cos - x2 * sin
        y2 = x2 * cos + x1 * sin
        return jnp.concatenate(
            [y1.astype(x.dtype), y2.astype(x.dtype), x_pass], axis=-1
        )

    return rot(q), rot(k)
