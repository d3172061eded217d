"""RMS normalization, computed in fp32 like both reference variants
(`/root/reference/nanovllm/layers/layernorm.py:17-40` fused add+norm,
`RMSNorm.py:19-33` plain per-head norm).

In JAX the "fused" residual variant is just two expressions — XLA fuses the
add into the norm — so there is one function plus the per-head q/k-norm.
"""

import jax.numpy as jnp
import jax


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def add_rms_norm(
    x: jax.Array, residual: jax.Array | None, weight: jax.Array, eps: float
) -> tuple[jax.Array, jax.Array]:
    """Returns (normed, new_residual); mirrors the reference's fused
    residual-add RMSNorm contract (layernorm.py:29-40)."""
    if residual is not None:
        x = x + residual
    return rms_norm(x, weight, eps), x
