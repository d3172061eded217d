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
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(temperatures, 1e-6)[:, None]
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    sampled = jnp.argmax(logits / temp + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperatures > 0, sampled, greedy)
