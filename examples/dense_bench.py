"""Microbench quant_dense_matmul at Qwen3-8B / Air decode projection shapes.

VERDICT r4 item 6: Qwen3-8B INT8 decode runs at 48% of its weight-stream
floor; this isolates the per-call cost of each projection shape (chained
inside one jit so tunnel dispatch can't hide device time) and A/Bs the
N-tile ceiling (NVT_QD_TN).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/dense_bench.py
Env: DB_ROWS (128), DB_BITS (8|4), DB_REPS (100), NVT_QD_TN (512).
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

    from glm4_moe_nano_vllm_tpu.ops import quant
    from glm4_moe_nano_vllm_tpu.ops.quant_dense_pallas import (
        quant_dense_matmul,
    )

    rows = int(os.environ.get("DB_ROWS", "128"))
    bits = int(os.environ.get("DB_BITS", "8"))
    reps = int(os.environ.get("DB_REPS", "100"))
    g = 128
    rng = np.random.default_rng(0)

    # Qwen3-8B decode projections (36 layers each) + the vocab head
    shapes = [
        ("qkv", 4096, 6144),
        ("o", 4096, 4096),
        ("gate|up", 4096, 24576),  # N-concat fused pair
        ("down", 12288, 4096),
        ("lm_head", 4096, 151936),
    ]
    print(f"# rows={rows} int{bits} g{g} NVT_QD_TN="
          f"{os.environ.get('NVT_QD_TN', '512')}")
    print(f"{'name':>8} {'K':>6} {'N':>7} {'MB':>6} {'ms/call':>8} "
          f"{'GB/s':>6} {'floor_ms':>8}")
    total = 0.0
    floor_total = 0.0
    for name, k, n in shapes:
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        if bits == 4:
            qw, qz, sc = quant.quantize_awq(w, g)
            qw2, zp2, sc2 = quant.repack_awq_for_tpu(qw, qz, sc)
            qp = {"qw": jnp.asarray(qw2), "zp": jnp.asarray(zp2),
                  "scale": jnp.asarray(sc2).astype(jnp.bfloat16)}
        else:
            qw, sc = quant.quantize_int8(w, g)
            qp = {"qw": jnp.asarray(qw),
                  "scale": jnp.asarray(sc).astype(jnp.bfloat16)}
        nbytes = sum(int(x.size) * x.dtype.itemsize for x in qp.values())
        x = jnp.asarray(rng.normal(size=(rows, k)), jnp.bfloat16)

        @jax.jit
        def run(x0, qp):
            def body(c, _):
                o = quant_dense_matmul(c, qp)
                # fold output back to input width so the chain is
                # data-dependent regardless of N != K
                c2 = c + o[:, : c.shape[1]] * 1e-6 if o.shape[1] >= c.shape[1] \
                    else c.at[:, : o.shape[1]].add(o * 1e-6)
                return c2.astype(c.dtype), None
            c, _ = jax.lax.scan(body, x0, None, length=reps)
            return c

        run(x, qp).block_until_ready()
        t0 = time.perf_counter()
        run(x, qp).block_until_ready()
        ms = (time.perf_counter() - t0) / reps * 1e3
        floor = nbytes / 572e9 * 1e3
        total += ms
        floor_total += floor
        print(f"{name:>8} {k:>6} {n:>7} {nbytes >> 20:>6} {ms:>8.3f} "
              f"{nbytes / ms / 1e6:>6.0f} {floor:>8.3f}")
    print(f"# sum per set: {total:.3f} ms vs floor {floor_total:.3f} "
          f"({100 * floor_total / total:.0f}%)")


if __name__ == "__main__":
    main()
