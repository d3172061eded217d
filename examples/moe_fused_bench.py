"""Microbench the fused dense-mode MoE kernel at production shapes.

Chains REPS data-dependent kernel calls inside one jitted lax.scan (see
ARCHITECTURE.md "Benchmarking over the axon tunnel") and reports true
ms/call and effective HBM bandwidth for the expert-weight stream.

Env:
  NVT_DEBUG_NK1=1        unpack/dot only 1 quant group (DMA-isolated run)
  NVT_INT4_UNPACK_MODE   0|1|2 (see ops/moe_dense_fused_pallas.py)
  MB_T, MB_E, MB_H, MB_I, MB_L, MB_REPS shape overrides
Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/moe_fused_bench.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from glm4_moe_nano_vllm_tpu.ops.moe_dense_fused_pallas import moe_dense_fused
from glm4_moe_nano_vllm_tpu.ops import quant

T = int(os.environ.get("MB_T", 64))
E = int(os.environ.get("MB_E", 64))
H = int(os.environ.get("MB_H", 2048))
IM = int(os.environ.get("MB_I", 1024))
L = int(os.environ.get("MB_L", 2))
REPS = int(os.environ.get("MB_REPS", 200))
G = 128

rng = np.random.default_rng(0)


def qset(k, n):
    qws, zps, scs = [], [], []
    for _ in range(L * E):
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        qw, qz, sc = quant.quantize_awq(w, G)
        qw2, zp2, sc2 = quant.repack_awq_for_tpu(qw, qz, sc)
        qws.append(qw2), zps.append(zp2), scs.append(sc2)

    def st(a):
        return jnp.asarray(np.stack(a).reshape(L, E, *a[0].shape))

    return {"qw": st(qws), "zp": st(zps), "scale": st(scs)}


w_gate = qset(H, IM)
w_up = qset(H, IM)
w_down = qset(IM, H)

per_layer_bytes = sum(
    int(np.prod(w.shape[2:])) * w.dtype.itemsize
    for s in (w_gate, w_up, w_down) for w in s.values()
) * E
print(f"expert stream per call: {per_layer_bytes/1e6:.0f} MB")

x0 = jnp.asarray(rng.normal(size=(T, H)), jnp.bfloat16)
sel = rng.permuted(np.tile(np.arange(E), (T, 1)), axis=1)[:, :8]
wc_np = np.zeros((T, E), np.float32)
np.put_along_axis(wc_np, sel, 0.125, axis=1)
wc = jnp.asarray(wc_np)


@jax.jit
def run(x, wg, wu, wd, wc):
    def body(x, li):
        o = moe_dense_fused(x, wg, wu, wd, wc, layer_idx=li % L)
        return (x * 0.999 + o.astype(x.dtype) * 1e-3), ()

    x, _ = jax.lax.scan(body, x, jnp.arange(REPS, dtype=jnp.int32))
    return jnp.sum(x.astype(jnp.float32))


args = (x0, w_gate, w_up, w_down, wc)
print("compiling...")
float(run(*args))
t0 = time.perf_counter()
s = float(run(*args))
dt = time.perf_counter() - t0
ms = dt / REPS * 1e3
print(f"checksum {s:.3f}")
print(f"{ms:.3f} ms/call  ->  {per_layer_bytes/ (ms/1e3) / 1e9:.0f} GB/s "
      f"effective expert-weight stream (v5e nominal ~819)")
