"""Microbench the decode-shape MoE expert kernels at production shapes.

Chains REPS data-dependent kernel calls inside one jitted lax.scan (see
ARCHITECTURE.md "Benchmarking over the axon tunnel") and reports true
ms/call and effective HBM bandwidth for the expert-weight stream.

Env:
  MB_MODE=dense|sorted   dense: fully-fused dense-mode kernel (all experts x
                         all tokens). sorted: the sort-dispatch gmm2 path
                         (argsort/bincount/scatter included in the timed
                         body) — at large E x width, dense mode's T*E FLOPs
                         exceed the weight-stream floor and sorted wins.
  NVT_GMM2_TM            gmm2 row-chunk tile (decode wants small, e.g. 32)
  NVT_DEBUG_NK1=1        unpack/dot only 1 quant group (DMA-isolated run)
  NVT_INT4_UNPACK_MODE   0|1|2 (see ops/moe_dense_fused_pallas.py)
  MB_T, MB_E, MB_H, MB_I, MB_L, MB_K, MB_REPS shape overrides
  MB_REAL_WEIGHTS=1      quantize every expert separately (slow; default
                         quantizes one expert and tiles — timing-identical)
Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/moe_fused_bench.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from glm4_moe_nano_vllm_tpu.ops.moe_dense_fused_pallas import moe_dense_fused
from glm4_moe_nano_vllm_tpu.ops import moe as moe_mod
from glm4_moe_nano_vllm_tpu.ops import quant

T = int(os.environ.get("MB_T", 64))
E = int(os.environ.get("MB_E", 64))
H = int(os.environ.get("MB_H", 2048))
IM = int(os.environ.get("MB_I", 1024))
L = int(os.environ.get("MB_L", 2))
K_TOP = int(os.environ.get("MB_K", 8))
REPS = int(os.environ.get("MB_REPS", 200))
MODE = os.environ.get("MB_MODE", "dense")
G = 128

rng = np.random.default_rng(0)


def qset(k, n):
    qws, zps, scs = [], [], []
    n_unique = L * E if os.environ.get("MB_REAL_WEIGHTS") else 1
    for _ in range(n_unique):
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        qw, qz, sc = quant.quantize_awq(w, G)
        qw2, zp2, sc2 = quant.repack_awq_for_tpu(qw, qz, sc)
        qws.append(qw2), zps.append(zp2), scs.append(sc2)

    def st(a):
        s = np.stack(a)
        if n_unique == 1:  # tile one expert's arrays (timing-identical)
            s = np.broadcast_to(s, (L * E, *a[0].shape))
        return jnp.asarray(np.ascontiguousarray(s.reshape(L, E, *a[0].shape)))

    scale_dt = (jnp.bfloat16 if os.environ.get("MB_SCALE_BF16", "1") != "0"
                else jnp.float32)  # serving default: bf16 scale storage
    return {"qw": st(qws), "zp": st(zps),
            "scale": st(scs).astype(scale_dt)}


w_gate = qset(H, IM)
w_up = qset(H, IM)
w_down = qset(IM, H)

per_layer_bytes = sum(
    int(np.prod(w.shape[2:])) * w.dtype.itemsize
    for s in (w_gate, w_up, w_down) for w in s.values()
) * E
print(f"expert stream per call: {per_layer_bytes/1e6:.0f} MB")

x0 = jnp.asarray(rng.normal(size=(T, H)), jnp.bfloat16)
if os.environ.get("MB_SKEW"):
    # Zipf-weighted expert prior (Gumbel-top-k per token, distinct ids):
    # replicates the CONCENTRATED routing a random-weight router produces
    # in serving — hot experts span multiple TM row chunks, and the kernel
    # re-dequantizes the expert's weight tiles once per chunk
    s = float(os.environ.get("MB_SKEW"))
    logp = -s * np.log(1.0 + np.arange(E))
    g = rng.gumbel(size=(T, E))
    sel = np.argsort(-(logp[None] + g), axis=1)[:, :K_TOP]
    spans = np.bincount(sel.ravel(), minlength=E)
    tm_dbg = 16
    print(f"skew s={s}: chunks={int(np.ceil(spans / tm_dbg).sum())} "
          f"(uniform would be ~{E}), max expert rows={spans.max()}")
else:
    sel = rng.permuted(np.tile(np.arange(E), (T, 1)), axis=1)[:, :K_TOP]
wc_np = np.zeros((T, E), np.float32)
np.put_along_axis(wc_np, sel, 1.0 / K_TOP, axis=1)
wc = jnp.asarray(wc_np)

if MODE in ("fd", "fd_ep"):
    from glm4_moe_nano_vllm_tpu.ops.moe_fd_pallas import moe_fused_dispatch

    if MODE == "fd_ep":
        # EP-shard proxy: the E experts here are one chip's LOCAL shard of
        # a larger global expert set (MB_EP_GLOBAL, default 128); tokens
        # route over the global set, so only ~T*K*E/E_global assignments
        # hit this shard — the rest are sentinels with weight 0
        e_glob = int(os.environ.get("MB_EP_GLOBAL", 128))
        sel_g = rng.permuted(np.tile(np.arange(e_glob), (T, 1)),
                             axis=1)[:, :K_TOP]
        local = sel_g < E
        topk_idx = jnp.asarray(np.where(local, sel_g, E), jnp.int32)
        topk_w = jnp.asarray(
            np.where(local, 1.0 / K_TOP, 0.0).astype(np.float32))
        exp_rows = max(1, T * K_TOP * E // e_glob)
    else:
        topk_idx = jnp.asarray(sel, jnp.int32)
        topk_w = jnp.full((T, K_TOP), 1.0 / K_TOP, jnp.float32)
        exp_rows = None

    # MB_SHARED=1 fuses a shared expert (as serving does); MB_L=7 +
    # MB_SHARED=1 replicates the Air decode step's kernel conditions
    shared = None
    if os.environ.get("MB_SHARED"):
        def shared_set(k, n):  # [L, ...] stacks (tile one quantized expert)
            w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
            qw, qz, sc = quant.quantize_awq(w, G)
            qw2, zp2, sc2 = quant.repack_awq_for_tpu(qw, qz, sc)
            scale_dt = (jnp.bfloat16
                        if os.environ.get("MB_SCALE_BF16", "1") != "0"
                        else jnp.float32)
            tile = lambda a: jnp.asarray(  # noqa: E731
                np.broadcast_to(a, (L, *a.shape)).copy())
            return {"qw": tile(qw2), "zp": tile(zp2),
                    "scale": tile(sc2).astype(scale_dt)}

        shared = (shared_set(H, IM), shared_set(H, IM), shared_set(IM, H))

    @jax.jit
    def run(x, wg, wu, wd, wc):
        def body(x, li):
            o = moe_fused_dispatch(x, topk_idx, topk_w, wg, wu, wd,
                                   layer_idx=li % L, shared=shared,
                                   expected_rows=exp_rows)
            return (x * 0.999 + o.astype(x.dtype) * 1e-3), ()

        x, _ = jax.lax.scan(body, x, jnp.arange(REPS, dtype=jnp.int32))
        return jnp.sum(x.astype(jnp.float32))
elif MODE == "sfused":
    from glm4_moe_nano_vllm_tpu.ops.moe_sorted_fused_pallas import (
        moe_sorted_fused,
    )

    topk_idx = jnp.asarray(sel, jnp.int32)
    topk_w = jnp.full((T, K_TOP), 1.0 / K_TOP, jnp.float32)

    @jax.jit
    def run(x, wg, wu, wd, wc):
        def body(x, li):
            o = moe_sorted_fused(x, topk_idx, topk_w, wg, wu, wd,
                                 layer_idx=li % L)
            return (x * 0.999 + o.astype(x.dtype) * 1e-3), ()

        x, _ = jax.lax.scan(body, x, jnp.arange(REPS, dtype=jnp.int32))
        return jnp.sum(x.astype(jnp.float32))
elif MODE == "sorted":
    topk_idx = jnp.asarray(sel, jnp.int32)
    topk_w = jnp.full((T, K_TOP), 1.0 / K_TOP, jnp.float32)
    moe_mod.DENSE_MODE_MAX_TOKENS = -1  # force the sort-dispatch gmm2 path

    @jax.jit
    def run(x, wg, wu, wd, wc):
        def body(x, li):
            o = moe_mod.moe_experts(x, topk_idx, topk_w, wg, wu, wd,
                                    layer_idx=li % L)
            return (x * 0.999 + o.astype(x.dtype) * 1e-3), ()

        x, _ = jax.lax.scan(body, x, jnp.arange(REPS, dtype=jnp.int32))
        return jnp.sum(x.astype(jnp.float32))
else:
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
