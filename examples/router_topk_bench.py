"""Router top-k A/B at prefill scale (VERDICT item 9 reconnaissance).

`route_topk` uses `jax.lax.top_k` over [T, E] fp32 scores; ARCHITECTURE.md
measured 2.3 ms/layer at T=16K, E=64. Candidates:
  * lax.top_k (baseline)
  * jax.lax.approx_max_k with recall_target=1.0 (TPU-native partial
    reduction; exact for recall 1.0)
  * iterative argmax+mask (K passes over [T, E] — pure VPU)

Chained-rep methodology per ARCHITECTURE.md "Benchmarking over the axon
tunnel": >=64 data-dependent reps inside one scan, scalar readback.
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

    t_tokens = int(os.environ.get("TOPK_T", "16384"))
    e = int(os.environ.get("TOPK_E", "128"))
    k = int(os.environ.get("TOPK_K", "8"))
    reps = 64

    x = jax.random.normal(jax.random.PRNGKey(0), (t_tokens, e), jnp.float32)

    def with_topk(fn):
        def step(c, _):
            w, i = fn(c)
            # data dependence: fold the result back into the scores
            c = c + 1e-6 * w.sum(axis=-1, keepdims=True) + 1e-9 * i.sum()
            return c, None

        def run(x):
            out, _ = jax.lax.scan(step, x, None, length=reps)
            return out.sum()

        return jax.jit(run)

    def t_lax(c):
        w, i = jax.lax.top_k(c, k)
        return w, i.astype(jnp.float32)

    def t_approx(c):
        w, i = jax.lax.approx_max_k(c, k, recall_target=1.0)
        return w, i.astype(jnp.float32)

    def t_iter(c):
        ws, is_ = [], []
        cur = c
        for _ in range(k):
            i = jnp.argmax(cur, axis=-1)
            w = jnp.take_along_axis(cur, i[:, None], axis=-1)
            ws.append(w)
            is_.append(i[:, None].astype(jnp.float32))
            cur = cur.at[jnp.arange(c.shape[0]), i].set(-jnp.inf)
        return jnp.concatenate(ws, -1), jnp.concatenate(is_, -1)

    for name, fn in (("lax.top_k", t_lax), ("approx_max_k", t_approx),
                     ("argmax_x8", t_iter)):
        run = with_topk(fn)
        r = run(x)
        r.block_until_ready()
        t0 = time.perf_counter()
        r = run(x)
        float(r)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:14s}: {dt:7.3f} ms per [{t_tokens}, {e}] top-{k}")

    # exactness check: approx_max_k(recall=1.0) vs lax.top_k selections
    w1, i1 = jax.lax.top_k(x, k)
    w2, i2 = jax.lax.approx_max_k(x, k, recall_target=1.0)
    same = bool(jnp.all(jnp.sort(i1, -1) == jnp.sort(i2, -1)))
    print(f"approx(recall=1.0) selection == top_k: {same}")


if __name__ == "__main__":
    main()
