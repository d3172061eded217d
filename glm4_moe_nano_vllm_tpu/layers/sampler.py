"""Token sampling on device.

Matches the reference sampler's semantics
(`/root/reference/nanovllm/layers/sampler.py:11-20`): temperature 0 = greedy
argmax; otherwise temperature-scaled softmax sampled via the Gumbel-max trick
(the reference uses the equivalent Exponential-race formulation,
``probs / Exp(1) → argmax``). Improvement over the reference: a batch mixing
greedy and sampled rows is handled with a per-row select instead of relying on
the all-zero shortcut (the reference would divide by zero on mixed batches).

Runs inside the jitted step with an explicit PRNG key, so sampling is
deterministic and reproducible across hosts given the same key (a requirement
for the replicated multi-host control plane, SURVEY §7).
"""

import jax
import jax.numpy as jnp


def sample(
    logits: jax.Array,  # [B, V] float32
    temperatures: jax.Array,  # [B] float32
    key: jax.Array,
) -> jax.Array:
    temp = jnp.maximum(temperatures, 1e-6)[:, None]
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    # one argmax pass for both modes (the select fuses into its input):
    # greedy rows argmax raw logits, sampled rows the Gumbel-perturbed ones
    # — bit-identical tokens to the separate two-argmax formulation
    z = jnp.where(temperatures[:, None] > 0, logits / temp + gumbel, logits)
    return jnp.argmax(z, axis=-1).astype(jnp.int32)
