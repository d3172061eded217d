"""Decode paged-attention microbench in the KV-read-bound regime.

VERDICT r4 item 1: the flagship decode numbers were measured at
max_model_len=512 (avg ctx ~160), where the attention term (1.88 ms of a
21.8 ms step) is latency- not bandwidth-bound. Config-4 serving at 2-8K
contexts multiplies the KV-read volume 10-30x; this bench measures the
decode kernel alone at those contexts and reports effective KV-read GB/s
against the chip's practical streaming ceiling (~572 GB/s, the NVT_DEBUG_NK1
pipeline measurement in BENCHMARKS.md).

Shapes are the Air decode config: batch 128, 96q/8kv x 128, bs=32 blocks.

Run: PYTHONPATH=/root/repo python examples/pa_decode_bench.py
Env: PAB_BATCH (128), PAB_CTXS ("512,1024,2048,4096"), PAB_KV
     (bfloat16,int8), PAB_CHUNK list ("256"), PAB_BS (32), PAB_ITERS (20).
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from glm4_moe_nano_vllm_tpu.ops.kv_cache import make_kv_cache
    import glm4_moe_nano_vllm_tpu.ops.paged_attention_pallas as pa

    b = int(os.environ.get("PAB_BATCH", "128"))
    hq, hkv, d = (int(os.environ.get("PAB_HQ", "96")),
                  int(os.environ.get("PAB_HKV", "8")),
                  int(os.environ.get("PAB_D", "128")))
    bs = int(os.environ.get("PAB_BS", "32"))
    ctxs = [int(x) for x in os.environ.get(
        "PAB_CTXS", "512,1024,2048,4096").split(",")]
    kvs = os.environ.get("PAB_KV", "bfloat16,int8").split(",")
    chunks = [int(x) for x in os.environ.get("PAB_CHUNK", "256").split(",")]
    iters = int(os.environ.get("PAB_ITERS", "20"))
    rng = np.random.default_rng(0)

    print(f"# batch={b} {hq}q/{hkv}kv x {d}, block_size={bs}")
    print(f"{'kv':>9} {'ctx':>6} {'chunk':>6} {'ms/call':>8} {'KV GiB':>7} "
          f"{'GB/s':>7} {'vs 572':>7}")
    for kv_name in kvs:
        kv_dtype = {"bfloat16": jnp.bfloat16, "int8": jnp.int8,
                    "float8_e4m3fn": jnp.float8_e4m3fn}[kv_name]
        for ctx in ctxs:
            maxb = ctx // bs
            nb = b * maxb
            shape = (hkv, nb, bs, d)
            k_cache = make_kv_cache(shape, kv_dtype)
            v_cache = make_kv_cache(shape, kv_dtype)
            # fill with real-ish values (int8 path reads scales too)
            if isinstance(k_cache, dict) and os.environ.get("PAB_PLAIN"):
                # diagnostic: raw int8 cache without scale planes (the
                # kernel's unscaled path casts in-compute) — isolates the
                # scale-DMA cost from the int8 convert cost
                k_cache = jax.random.randint(
                    jax.random.PRNGKey(0), shape, -127, 127, jnp.int8)
                v_cache = k_cache
            elif isinstance(k_cache, dict):
                key = jax.random.PRNGKey(0)
                k_cache = {
                    "data": jax.random.randint(
                        key, shape, -127, 127, jnp.int8).astype(kv_dtype)
                    if kv_dtype == jnp.int8 else
                    jax.random.normal(key, shape, jnp.bfloat16).astype(kv_dtype),
                    "scale": jnp.abs(jax.random.normal(
                        key, k_cache["scale"].shape, jnp.float32)) * 0.01,
                }
                v_cache = jax.tree.map(lambda x: x, k_cache)
            else:
                k_cache = jax.random.normal(
                    jax.random.PRNGKey(0), shape, jnp.bfloat16)
                v_cache = k_cache * 0.5
            # each seq owns maxb consecutive blocks; all at full context
            bt = jnp.arange(nb, dtype=jnp.int32).reshape(b, maxb)
            ctx_lens = jnp.full((b,), ctx, jnp.int32)
            q = jax.random.normal(jax.random.PRNGKey(1), (b, hq, d),
                                  jnp.bfloat16)
            for chunk in chunks:
                pa._PA_CHUNK = chunk

                def call(qq):
                    return pa.paged_attention_decode(
                        qq, k_cache, v_cache, bt, ctx_lens, 0.0883883)

                # chain: each call's q depends on the previous output, so the
                # device can't overlap/elide anything across iterations
                import jax as _jax

                @_jax.jit
                def chained(qq, kc, vc):
                    def body(qc, _):
                        o = pa.paged_attention_decode(
                            qc, kc, vc, bt, ctx_lens, 0.0883883)
                        return (qc + o.astype(qc.dtype) * 1e-6), None
                    qf, _ = _jax.lax.scan(body, qq, None, length=iters)
                    return qf

                chained(q, k_cache, v_cache).block_until_ready()  # compile
                t0 = time.perf_counter()
                chained(q, k_cache, v_cache).block_until_ready()
                ms = (time.perf_counter() - t0) / iters * 1e3
                itemsize = jnp.dtype(kv_dtype).itemsize
                kv_bytes = 2 * b * ctx * hkv * d * itemsize
                if isinstance(k_cache, dict):
                    kv_bytes += 2 * b * (ctx // bs) * hkv * 128 * 4
                gbs = kv_bytes / (ms * 1e-3) / 1e9
                print(f"{kv_name:>9} {ctx:>6} {chunk:>6} {ms:>8.3f} "
                      f"{kv_bytes / 2**30:>7.2f} {gbs:>7.0f} "
                      f"{gbs / 572:>7.2f}")
            del k_cache, v_cache
            jax.clear_caches()


if __name__ == "__main__":
    main()
