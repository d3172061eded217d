"""Quantized weight-only matmuls (XLA path; Pallas fused kernel in
ops/quant_matmul_pallas.py takes over on TPU for the hot shapes).

Replaces the reference's dequant-then-``F.linear`` flow
(`/root/reference/nanovllm/layers/linear_awq_new.py:254-255` — its biggest
inefficiency: the fp16 weight matrix is materialized in HBM on every call).
Under XLA the dequant arithmetic below is fused into the matmul's operand
read (weights stay int4/int8 in HBM; conversion happens in VMEM tiles).

Storage format (see ops/quant.py):
  * AWQ int4: qw uint4 [K, M], zp uint4 [K/G, M], scale f32/bf16 [K/G, M],
    w = (qw - zp) * scale
  * int8: qw int8 [K, M], scale [K/G, M], w = qw * scale
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unpack_rows(qw_packed: jax.Array, group_size: int) -> jax.Array:
    """[..., K/2, M] uint8 (group-half-split nibble pairs, see
    ops/quant.py pack_rows_u8) → [..., K, M] uint8."""
    k2, m = qw_packed.shape[-2], qw_packed.shape[-1]
    p = qw_packed.reshape(*qw_packed.shape[:-2], 2 * k2 // group_size,
                          group_size // 2, m)
    lo = p & 0x0F
    hi = p >> 4
    u = jnp.concatenate([lo, hi], axis=-2)  # [..., KG, G, M]
    return u.reshape(*qw_packed.shape[:-2], k2 * 2, m)


def dequantize(qp: dict, dtype=jnp.bfloat16,
               group_size: int | None = None) -> jax.Array:
    """Materialize the full-precision weight [..., K, M] from a quant dict.

    ``group_size``: pass explicitly when the zp/scale KG rows are
    pre-padded to the sublane tiling (engine init does this for expert
    stacks); otherwise it is derived from the scale row count."""
    qw = qp["qw"]
    scale = qp["scale"]
    k = qw.shape[-2] * (2 if "zp" in qp else 1)
    group = group_size or k // scale.shape[-2]
    kg = k // group
    if "zp" in qp:  # AWQ int4: row-packed uint8
        qw = unpack_rows(qw, group)
    m = qw.shape[-1]
    q = qw.astype(jnp.float32).reshape(*qw.shape[:-2], kg, group, m)
    if "zp" in qp:
        zp = qp["zp"][..., :kg, :]
        q = q - zp.astype(jnp.float32)[..., :, None, :]
    w = q * scale[..., :kg, :].astype(jnp.float32)[..., :, None, :]
    return w.reshape(*qw.shape[:-2], k, m).astype(dtype)


def quant_gather_rows(qp: dict, ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantized rows of the *logical* weight's transpose: for a quant dict
    of [K, M] (e.g. a [H, V] LM head), returns dequant(w).T[ids] = [N, K].

    Serves the tied-embedding gather when the LM head is quantized
    (QuantConfig.quantize_lm_head): only the gathered columns are
    dequantized, so the embedding read stays O(tokens), not O(vocab)."""
    qw, scale = qp["qw"], qp["scale"]
    cols_q = jnp.take(qw, ids, axis=1)  # [K/2 or K, N]
    cols_s = jnp.take(scale, ids, axis=1).astype(jnp.float32)  # [KG, N]
    kg = scale.shape[0]
    n = ids.shape[0]
    if "zp" in qp:
        group = 2 * qw.shape[0] // kg
        q = unpack_rows(cols_q, group).astype(jnp.float32)  # [K, N]
        z = jnp.take(qp["zp"], ids, axis=1).astype(jnp.float32)  # [KG, N]
        q = q.reshape(kg, group, n) - z[:, None, :]
    else:
        group = qw.shape[0] // kg
        q = cols_q.astype(jnp.float32).reshape(kg, group, n)
    w = (q * cols_s[:, None, :]).reshape(kg * group, n)
    return w.T.astype(dtype)


def quant_gather_rows_t(qp_t: dict, ids: jax.Array,
                        dtype=jnp.bfloat16) -> jax.Array:
    """Tied-embedding gather from the TRANSPOSED head storage.

    ``qp_t`` holds the [K, V] LM head's pieces transposed — qw [V, K/2],
    zp/scale [V, KG] — so the embedding is a plain row gather in the same
    memory layout the matmul kernels pin. The straight-layout gather
    (quant_gather_rows, axis=1 column take) made XLA keep a {0,1}-layout
    copy of the whole qw next to the pallas_call's {1,0} operand: a
    [2048, 65536] u8 relayout copy per decode micro-step (~0.5 ms,
    profiled). Returns [N, K] rows in ``dtype``."""
    qw = jnp.take(qp_t["qw"], ids, axis=0)  # [n, K/2] u8 (or [n, K] i8)
    sc = jnp.take(qp_t["scale"], ids, axis=0).astype(jnp.float32)  # [n, KG]
    n = ids.shape[0]
    kg = sc.shape[1]
    if "zp" in qp_t:
        half = qw.shape[1] // kg  # G/2 packed bytes per group
        q = qw.reshape(n, kg, half).astype(jnp.int32)
        q = jnp.concatenate([q & 0x0F, q >> 4], axis=-1)  # [n, KG, G]
        z = jnp.take(qp_t["zp"], ids, axis=0).astype(jnp.int32)
        w = (q - z[:, :, None]).astype(jnp.float32) * sc[:, :, None]
    else:
        g = qw.shape[1] // kg
        w = qw.astype(jnp.float32).reshape(n, kg, g) * sc[:, :, None]
    return w.reshape(n, -1).astype(dtype)


def transpose_quant_dict(qp: dict) -> dict:
    """[K, V]-layout quant dict -> the [V, K]-layout twin (one-time
    transpose at init/load; serves quant_gather_rows_t)."""
    return {k: v.T for k, v in qp.items()}


def quant_matmul(x: jax.Array, qp: dict, layer_idx=None,
                 quant_group: int | None = None) -> jax.Array:
    """y = x @ dequant(qp): fused Pallas kernel on TPU (weights stay int4
    packed / int8 in HBM), XLA fused dequant otherwise.

    With ``layer_idx`` (traced int32), qp is layer-stacked [L, K, N] and
    the dense Pallas kernel selects the layer in-kernel — per-layer scan-xs
    slices of attention projections materialized ~0.9 ms of copies per Air
    decode micro-step. Off the kernel path the stack is sliced (XLA)."""
    import math
    import os

    stacked = layer_idx is not None
    wdim = 3 if stacked else 2
    kq = qp["qw"].shape[-2] * (2 if "zp" in qp else 1)
    lane_ok = qp["qw"].shape[-1] % 128 == 0  # N lane alignment
    aligned = (
        qp["qw"].ndim == wdim
        and x.shape[-1] == kq
        and not os.environ.get("NVT_FORCE_XLA_QUANT")
        and _on_tpu()
    )
    if aligned:
        rows = math.prod(x.shape[:-1])
        db = _dequant_bytes(qp) // (qp["qw"].shape[0] if stacked else 1)
        # stacked weights take the kernel at much smaller sizes: the XLA
        # alternative pays a per-layer dynamic-slice copy + an unfused
        # dequant (wk/wv measured ~0.15 ms vs ~0.035 in-kernel per call at
        # Air widths)
        dense_min = (1 << 20) if stacked else (32 << 20)
        # the dense kernel also serves lane-UNALIGNED N via a ragged last
        # N tile (GLM-4.5-Air's dense-MLP N=10944: the XLA fallback's
        # materialized 90 MB bf16 dequant measured ~0.3 ms/projection per
        # decode step); the gmm kernels below still require N % 128
        if rows <= 256 and db > dense_min:
            # decode-shaped, big weight: whole lhs VMEM-resident, pipelined
            # weight-tile DMAs, one dequant per tile
            # (ops/quant_dense_pallas.py; below 32 MB the XLA dequant-dot's
            # lower per-call overhead wins — 0.120 vs 0.197 ms per
            # 4-projection decode layer at 7.6B shapes)
            from glm4_moe_nano_vllm_tpu.ops.quant_dense_pallas import (
                quant_dense_matmul,
            )

            return quant_dense_matmul(x, qp, layer_idx=layer_idx,
                                      quant_group=quant_group)
        if stacked:  # off the dense-kernel path: slice the layer (XLA)
            qp = {k: jax.lax.dynamic_index_in_dim(v, layer_idx, 0, False)
                  for k, v in qp.items()}
            stacked = False
        if lane_ok and _use_pallas_gmm(int4="zp" in qp, dequant_bytes=db):
            # many-row call too big for the XLA transient (~>1 GB)
            from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import (
                quant_gmm,
                quant_gmm_int8,
            )

            lead = x.shape[:-1]
            x2 = x.reshape(-1, x.shape[-1])
            gs = jnp.asarray([x2.shape[0]], jnp.int32)
            scale = qp["scale"].astype(jnp.float32)[None]
            if "zp" in qp:
                out = quant_gmm(x2, qp["qw"][None], qp["zp"][None], scale, gs)
            else:
                out = quant_gmm_int8(x2, qp["qw"][None], scale, gs)
            return out.reshape(*lead, -1).astype(x.dtype)
    if stacked:  # XLA fallback: slice the layer, then fused dequant-dot
        qp = {k: jax.lax.dynamic_index_in_dim(v, layer_idx, 0, False)
              for k, v in qp.items()}
    w = dequantize(qp, x.dtype, group_size=quant_group)
    return jnp.dot(x, w, preferred_element_type=x.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas_gmm(int4: bool = True, dequant_bytes: int = 0) -> bool:
    import os

    if os.environ.get("NVT_FORCE_XLA_QUANT"):
        return False
    if int4 and 0 < dequant_bytes < (1 << 30):
        # INT4 up to ~1 GB of dequant transient runs faster on the XLA
        # dequant-then-matmul path than the manual-DMA Pallas GMM: 0.120 vs
        # 0.197 ms per 4-projection decode layer at 7.6B shapes, and fresh
        # prefill 8.4k vs 5.7k tok/s at 7.6B (quant_gmm re-dequantizes its
        # resident weight tile per row chunk and serializes DMAs per grid
        # instance). Decode-shaped paths no longer consult this routing
        # (moe_dense_fused / quant_dense_matmul); above ~1 GB the XLA
        # transient risks HBM OOM (GLM-4.5-Air-scale expert stacks), so
        # those stay on the Pallas kernel.
        return False
    if (
        not int4
        and not os.environ.get("NVT_PALLAS_INT8")
        and dequant_bytes < (1 << 30)
    ):
        # INT8 stays on XLA by default at moderate sizes: int8→bf16 is a
        # native convert that XLA fuses into the (ragged) matmul, and
        # measured on v5e it beats the Pallas GMM at decode and prefill
        # shapes (e.g. E=32 m=256: 0.69ms vs 1.08ms). INT4 nibble unpack
        # does NOT fuse — the Pallas kernel wins there. Above ~1 GB the XLA
        # path's materialized bf16 expert stack risks HBM OOM (observed at
        # 7.6B INT8), so large stacks route to the Pallas kernel too.
        # NVT_PALLAS_INT8=1 forces the kernel for tuning.
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_gmm2(qp: dict) -> bool:
    """INT4 grouped matmuls default to the v2 Pallas kernel on TPU
    (pipelined weight blocks, hoisted dequant — see quant_gmm2_pallas.py).
    NVT_GMM=xla|1 overrides for A/B."""
    import os

    knob = os.environ.get("NVT_GMM", "2")
    if knob != "2" or os.environ.get("NVT_FORCE_XLA_QUANT"):
        return False
    return "zp" in qp and _on_tpu()


def quant_ragged_dot_pair(
    xs: jax.Array, qp_a: dict, qp_b: dict, group_sizes: jax.Array,
    layer_idx=None, quant_group: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Two grouped matmuls sharing the same lhs (MoE gate+up): on TPU one
    fused kernel pass shares activation DMAs and instance overhead.
    ``layer_idx``: quant dicts are layer-stacked [L, E, ...], layer selected
    in-kernel (gmm2 only; other paths receive pre-sliced weights).
    ``quant_group``: explicit group size (pre-padded zp/scale rows)."""
    if use_gmm2(qp_a):
        from glm4_moe_nano_vllm_tpu.ops.quant_gmm2_pallas import (
            quant_gmm2_pair,
        )

        return quant_gmm2_pair(xs, qp_a, qp_b, group_sizes,
                               layer_idx=layer_idx, quant_group=quant_group)
    assert layer_idx is None, "layer stacks need the gmm2 path"
    if _use_pallas_gmm(int4="zp" in qp_a, dequant_bytes=_dequant_bytes(qp_a)):
        if "zp" in qp_a:
            from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_gmm_pair

            return quant_gmm_pair(
                xs,
                qp_a["qw"], qp_a["zp"], qp_a["scale"].astype(jnp.float32),
                qp_b["qw"], qp_b["zp"], qp_b["scale"].astype(jnp.float32),
                group_sizes,
            )
        from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_gmm_int8_pair

        return quant_gmm_int8_pair(
            xs,
            qp_a["qw"], qp_a["scale"].astype(jnp.float32),
            qp_b["qw"], qp_b["scale"].astype(jnp.float32),
            group_sizes, quant_group=quant_group,
        )
    return (
        quant_ragged_dot(xs, qp_a, group_sizes, quant_group=quant_group),
        quant_ragged_dot(xs, qp_b, group_sizes, quant_group=quant_group),
    )


def _dequant_bytes(qp: dict) -> int:
    """bf16 bytes the XLA path would materialize for this weight stack."""
    qw = qp["qw"]
    k_mult = 2 if "zp" in qp else 1
    import numpy as np

    return int(np.prod(qw.shape)) * k_mult * 2


def quant_ragged_dot(xs: jax.Array, qp: dict, group_sizes: jax.Array,
                     layer_idx=None,
                     quant_group: int | None = None) -> jax.Array:
    """Grouped expert matmul with quantized per-expert weights [E, K, M].

    On TPU this runs the fused Pallas GMM (weights stay int4-packed / int8
    in HBM); otherwise dequantize + ragged_dot (XLA fuses what it can, but
    materializes the expert stack — fallback only). ``layer_idx``: stacks
    [L, E, ...], layer selected in-kernel (gmm2 only). ``quant_group``:
    explicit group size (pre-padded zp/scale rows).
    """
    if use_gmm2(qp):
        from glm4_moe_nano_vllm_tpu.ops.quant_gmm2_pallas import quant_gmm2

        return quant_gmm2(xs, qp, group_sizes, layer_idx=layer_idx,
                          quant_group=quant_group)
    assert layer_idx is None, "layer stacks need the gmm2 path"
    if _use_pallas_gmm(int4="zp" in qp, dequant_bytes=_dequant_bytes(qp)):
        scale = qp["scale"].astype(jnp.float32)
        if "zp" in qp:
            from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_gmm

            assert quant_group is None, "v1 GMM needs unpadded zp/scale"
            return quant_gmm(xs, qp["qw"], qp["zp"], scale, group_sizes)
        from glm4_moe_nano_vllm_tpu.ops.quant_gmm_pallas import quant_gmm_int8

        return quant_gmm_int8(xs, qp["qw"], scale, group_sizes,
                              quant_group=quant_group)
    w = dequantize(qp, xs.dtype, group_size=quant_group)
    return jax.lax.ragged_dot(xs, w, group_sizes)
