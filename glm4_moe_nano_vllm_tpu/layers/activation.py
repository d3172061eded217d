"""Gated activations (reference: `/root/reference/nanovllm/layers/activation.py:12-14`)."""

import jax
import jax.numpy as jnp


def silu_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate) * up
