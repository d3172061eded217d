"""Compiled-mode Pallas kernel check on real TPU hardware.

Compares the decode and prefill kernels against the XLA reference oracle in
bf16 on-chip, then micro-benchmarks the decode kernel vs the gather-based
reference path.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from glm4_moe_nano_vllm_tpu.ops.attention_ref import paged_attention_ref
from glm4_moe_nano_vllm_tpu.ops.paged_attention_pallas import paged_attention_decode
from glm4_moe_nano_vllm_tpu.ops.prefill_pallas import paged_prefill

assert jax.default_backend() == "tpu", jax.default_backend()

BS, D = 64, 128
HQ, HKV = 16, 8
B, NB, MAXB = 32, 2048, 16  # contexts up to 1024 tokens

rng = np.random.default_rng(0)
k_cache = jnp.asarray(rng.normal(size=(HKV, NB, BS, D)), jnp.bfloat16)
v_cache = jnp.asarray(rng.normal(size=(HKV, NB, BS, D)), jnp.bfloat16)
bt = jnp.asarray(rng.permutation(NB)[: B * MAXB].reshape(B, MAXB), jnp.int32)
ctx = jnp.asarray(rng.integers(1, MAXB * BS, size=B), jnp.int32)

# ---- decode ----------------------------------------------------------------
q = jnp.asarray(rng.normal(size=(B, 1, HQ, D)), jnp.bfloat16)
positions = (ctx - 1)[:, None]
ref = paged_attention_ref(q, k_cache, v_cache, bt, ctx, positions, 0.088)
out = paged_attention_decode(q[:, 0], k_cache, v_cache, bt, ctx, 0.088)
err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref[:, 0], np.float32)))
print(f"decode max abs err vs ref (bf16): {err:.4f}")
assert err < 0.04, err

# ---- prefill ---------------------------------------------------------------
SQ = 128
q_lens = jnp.asarray(rng.integers(1, SQ + 1, size=B), jnp.int32)
q_start = jnp.maximum(ctx - q_lens, 0)
q_lens = ctx - q_start
qp = jnp.asarray(rng.normal(size=(B, SQ, HQ, D)), jnp.bfloat16)
pos_idx = jnp.arange(SQ, dtype=jnp.int32)[None, :]
positions_p = jnp.where(pos_idx < q_lens[:, None], q_start[:, None] + pos_idx, 0)
refp = paged_attention_ref(qp, k_cache, v_cache, bt, ctx, positions_p, 0.088)
outp = paged_prefill(qp, k_cache, v_cache, bt, ctx, q_lens, 0.088)
errs = []
for i in range(B):
    ql = int(q_lens[i])
    errs.append(np.max(np.abs(
        np.asarray(outp[i, :ql], np.float32) - np.asarray(refp[i, :ql], np.float32)
    )))
print(f"prefill max abs err vs ref (bf16): {max(errs):.4f}")
assert max(errs) < 0.04, max(errs)

# ---- micro-bench decode ----------------------------------------------------
def bench(f, *args, iters=50):
    args = [jnp.asarray(a) for a in args]  # materialize views
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


ref_fn = jax.jit(lambda *a: paged_attention_ref(*a, 0.088))
pal_fn = jax.jit(lambda q, k, v, b_, c: paged_attention_decode(q, k, v, b_, c, 0.088))
t_pal = bench(pal_fn, q[:, 0], k_cache, v_cache, bt, ctx)
t_ref = bench(ref_fn, q, k_cache, v_cache, bt, ctx, positions)
kv_bytes = 2 * B * float(jnp.mean(ctx)) * HKV * D * 2
print(f"decode: ref {t_ref*1e6:.0f}us  pallas {t_pal*1e6:.0f}us  "
      f"speedup {t_ref/t_pal:.2f}x  ~{kv_bytes/t_pal/1e9:.1f} GB/s effective")

# prefill micro-bench (vs ref)
refp_fn = jax.jit(lambda *a: paged_attention_ref(*a, 0.088))
palp_fn = jax.jit(lambda q_, k, v, b_, c, ql: paged_prefill(q_, k, v, b_, c, ql, 0.088))
t_palp = bench(palp_fn, qp, k_cache, v_cache, bt, ctx, q_lens)
t_refp = bench(refp_fn, qp, k_cache, v_cache, bt, ctx, positions_p)
print(f"prefill(SQ={SQ}): ref {t_refp*1e6:.0f}us  pallas {t_palp*1e6:.0f}us  "
      f"speedup {t_refp/t_palp:.2f}x")

# ---- KV write kernel (compiled, bit-exact vs XLA scatter) -------------------
from glm4_moe_nano_vllm_tpu.ops.kv_cache import write_kv
from glm4_moe_nano_vllm_tpu.ops.kv_write_pallas import write_kv_pallas

S_W = 100
starts_w = rng.integers(0, 300, size=B).astype(np.int32)
qs_w = rng.integers(0, S_W + 1, size=B).astype(np.int32)
starts_w[0], qs_w[0] = 0, 0  # padded row
kn = jnp.asarray(rng.normal(size=(B * S_W, HKV, D)), jnp.bfloat16)
vn = jnp.asarray(rng.normal(size=(B * S_W, HKV, D)), jnp.bfloat16)
slots_w = np.full((B, S_W), -1, np.int64)
for i in range(B):
    for r_ in range(qs_w[i]):
        p = starts_w[i] + r_
        slots_w[i, r_] = int(bt[i, p // BS]) * BS + p % BS
k1, v1 = write_kv(k_cache, v_cache, kn, vn, jnp.asarray(slots_w.reshape(-1), jnp.int32))
k2, v2 = write_kv_pallas(k_cache, v_cache, kn, vn, bt,
                         jnp.asarray(starts_w), jnp.asarray(starts_w + qs_w))
assert bool(jnp.all(k1 == k2)) and bool(jnp.all(v1 == v2)), "kv write mismatch"
print("kv write kernel: bit-exact vs XLA scatter")

wr_pal = jax.jit(lambda kc, vc: write_kv_pallas(
    kc, vc, kn, vn, bt, jnp.asarray(starts_w), jnp.asarray(starts_w + qs_w)))
t_wr = bench(wr_pal, k_cache, v_cache)
print(f"kv write ({int(qs_w.sum())} rows): pallas {t_wr*1e6:.0f}us")
