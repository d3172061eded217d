"""Weight-only quantization: AWQ INT4 pack/unpack + INT8, TPU-native storage.

Checkpoint compatibility targets the reference's *active* AWQ variant
(`/root/reference/nanovllm/layers/linear_awq_new.py`):
  * ``qweight`` int32 [K, M/8] — 8 nibbles per int32 along the output dim in
    AWQ interleaved order [0, 4, 1, 5, 2, 6, 3, 7] (shifts construction at
    linear_awq_new.py:66-78);
  * ``qzeros`` int32 [K/G, M/8] — same packing; ``scales`` fp16 [K/G, M];
  * dequant: w = (q - z) * s (linear_awq_new.py:117-118).

At load time, AWQ tensors are *repacked* into the TPU-native storage format:
  * ``qw``: jnp.uint4 [K, M] (XLA packs 2 nibbles/byte on TPU — same memory
    as the int32 packing, but directly consumable by convert-fused matmuls
    and Pallas kernels);
  * ``zp``: jnp.uint4 [K/G, M]; ``scale``: bf16 [K/G, M].

The unpack here is bit-exact with the reference kernel (verified by
tests/test_quant.py against an independent re-implementation of the Triton
semantics), so real AWQ checkpoints produce identical dequantized weights.
"""

from __future__ import annotations

import numpy as np

AWQ_ORDER = (0, 4, 1, 5, 2, 6, 3, 7)


def awq_unpack_cols(packed: np.ndarray) -> np.ndarray:
    """Unpack int32-packed nibbles along the last dim: [..., M/8] → [..., M].

    Column ``j*8 + c`` lives at bit position ``AWQ_ORDER[c] * 4`` of int32
    ``j`` (the inverse of the shifts at linear_awq_new.py:66-78).
    """
    shifts = np.array([o * 4 for o in AWQ_ORDER], dtype=np.uint32)
    u = packed.astype(np.uint32)
    out = (u[..., None] >> shifts) & 0xF
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(np.uint8)


def awq_pack_cols(nibbles: np.ndarray) -> np.ndarray:
    """Inverse of awq_unpack_cols: [..., M] uint4-values → [..., M/8] int32."""
    assert nibbles.shape[-1] % 8 == 0
    shifts = np.array([o * 4 for o in AWQ_ORDER], dtype=np.uint32)
    g = nibbles.reshape(*nibbles.shape[:-1], -1, 8).astype(np.uint32)
    packed = np.zeros(g.shape[:-1], dtype=np.uint32)
    for c in range(8):
        packed |= g[..., c] << shifts[c]
    return packed.astype(np.int32)


def awq_dequantize(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Reference dequant (numpy): [K, M/8]x[K/G, M/8]x[K/G, M] → [K, M] f32."""
    q = awq_unpack_cols(qweight).astype(np.float32)  # [K, M]
    z = awq_unpack_cols(qzeros).astype(np.float32)  # [K/G, M]
    k = q.shape[0]
    group_size = k // scales.shape[0]
    z = np.repeat(z, group_size, axis=0)
    s = np.repeat(scales.astype(np.float32), group_size, axis=0)
    return (q - z) * s


def quantize_awq(w: np.ndarray, group_size: int = 128):
    """Asymmetric 4-bit group quantization of [K, M] → AWQ checkpoint layout.

    Used to quantize bf16 checkpoints on the fly (the reference only consumes
    pre-quantized checkpoints) and to generate test data.
    """
    k, m = w.shape
    assert k % group_size == 0 and m % 8 == 0
    wf = w.astype(np.float32).reshape(k // group_size, group_size, m)
    wmin = wf.min(axis=1)  # [K/G, M]
    wmax = wf.max(axis=1)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-10)
    zp = np.clip(np.round(-wmin / scale), 0, 15)
    q = np.clip(np.round(wf / scale[:, None, :]) + zp[:, None, :], 0, 15)
    qweight = awq_pack_cols(q.reshape(k, m).astype(np.uint8))
    qzeros = awq_pack_cols(zp.astype(np.uint8))
    return qweight, qzeros, scale.astype(np.float16)


def quantize_int8(w: np.ndarray, group_size: int = 128):
    """Symmetric 8-bit group quantization of [K, M] → (qw int8 [K,M],
    scale f16 [K/G, M])."""
    k, m = w.shape
    assert k % group_size == 0
    wf = w.astype(np.float32).reshape(k // group_size, group_size, m)
    amax = np.abs(wf).max(axis=1)
    scale = np.maximum(amax / 127.0, 1e-10)
    q = np.clip(np.round(wf / scale[:, None, :]), -127, 127)
    return q.reshape(k, m).astype(np.int8), scale.astype(np.float16)


def pack_rows_u8(nibbles: np.ndarray, group_size: int | None = None) -> np.ndarray:
    """[..., K, M] uint4-values → [..., K/2, M] uint8, two nibbles per byte.

    Pairing is *half-split within each quantization group*: byte row i of
    group g holds original rows (g*G + i) in the low nibble and
    (g*G + i + G/2) in the high nibble. Unpacking is then a row-concat of
    the two nibble planes — a cheap contiguous copy on TPU, where an
    even/odd interleave would be a slow cross-sublane shuffle.

    This is the TPU-native storage: true 4-bit memory footprint in a dtype
    that crosses the jit boundary (the PJRT plugin here rejects u4 args),
    unpacked in-graph / in-kernel.
    """
    k = nibbles.shape[-2]
    g = group_size or k
    assert k % g == 0 and g % 2 == 0
    shp = nibbles.shape
    grouped = nibbles.reshape(*shp[:-2], k // g, g, shp[-1])
    lo = grouped[..., : g // 2, :].astype(np.uint8)
    hi = grouped[..., g // 2:, :].astype(np.uint8)
    packed = (lo | (hi << 4)).astype(np.uint8)
    return packed.reshape(*shp[:-2], k // 2, shp[-1])


def pack_rows_i32(nibbles: np.ndarray, group_size: int) -> np.ndarray:
    """[..., K, M] uint4-values → [..., K/8, M] int32, 8 nibbles per word.

    Group-eighth-split: word row r of group g holds original row
    (g*G + p*G/8 + r) at nibble position p. Unpacking is 8 shift/and plane
    extractions in native i32 lanes plus a contiguous plane concat — no
    8-bit load/convert (sub-32-bit VMEM layouts pay a lane-expansion
    relayout on TPU; i32 storage avoids it entirely).
    """
    k, m = nibbles.shape[-2], nibbles.shape[-1]
    g = group_size
    assert k % g == 0 and g % 8 == 0
    shp = nibbles.shape
    grouped = nibbles.reshape(*shp[:-2], k // g, 8, g // 8, m).astype(np.uint32)
    word = np.zeros((*shp[:-2], k // g, g // 8, m), dtype=np.uint32)
    for p in range(8):
        word |= grouped[..., p, :, :] << (4 * p)
    return word.reshape(*shp[:-2], k // 8, m).astype(np.int32)


def unpack_rows_i32_np(packed: np.ndarray, group_size: int) -> np.ndarray:
    """Inverse of pack_rows_i32: [..., K/8, M] int32 → [..., K, M] uint8."""
    k8, m = packed.shape[-2], packed.shape[-1]
    g = group_size
    shp = packed.shape
    w = packed.reshape(*shp[:-2], 8 * k8 // g, g // 8, m).astype(np.uint32)
    planes = [((w >> (4 * p)) & 0xF) for p in range(8)]
    out = np.stack(planes, axis=-3)  # [..., KG, 8, G/8, M]
    return out.reshape(*shp[:-2], k8 * 8, m).astype(np.uint8)


def unpack_rows_u8_np(packed: np.ndarray, group_size: int | None = None) -> np.ndarray:
    k2 = packed.shape[-2]
    g = group_size or 2 * k2
    shp = packed.shape
    p = packed.reshape(*shp[:-2], 2 * k2 // g, g // 2, shp[-1])
    lo = p & 0x0F
    hi = p >> 4
    out = np.concatenate([lo, hi], axis=-2)  # [..., KG, G, M]
    return out.reshape(*shp[:-2], k2 * 2, shp[-1])


def repack_awq_for_tpu(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray):
    """AWQ checkpoint tensors → TPU-native (qw u8 row-packed, zp u8, scale f32)."""
    group_size = qweight.shape[0] // scales.shape[0]
    qw = pack_rows_u8(awq_unpack_cols(qweight), group_size)  # [K/2, M] uint8
    zp = awq_unpack_cols(qzeros)  # [K/G, M] uint8 (small; kept unpacked)
    return qw, zp, scales.astype(np.float32)
