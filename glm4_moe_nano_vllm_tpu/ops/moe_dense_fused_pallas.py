"""Fully-fused dense-mode MoE Pallas kernel (decode / small-batch fast path).

One kernel computes, per expert, gate & up projections, silu·mul, the down
projection, and the weighted top-k combine — accumulating the final [T, H]
output in a VMEM-resident block across the expert grid. Compared with the
XLA dense-mode path (`ops/moe.py::moe_experts_dense`, ~6 fusions per MoE
layer) and the broadcast-lhs GMM (`ops/quant_gmm_pallas.py`, which still
materializes the [E, T, H] per-expert outputs in HBM and combines in XLA),
this removes every intermediate HBM round-trip: only x, the expert weights,
and the final [T, H] output touch HBM.

Decode steps at production scale are expert-weight-read bound (see
ARCHITECTURE.md's decode cost model; reference context: the reference runs a
Python loop over 128 expert modules, `/root/reference/nanovllm/models/
glm4_moe/moe.py:135-151`). This kernel uses the standard Pallas pipeline
(BlockSpecs over an expert grid) so weight DMAs for expert e+1 overlap the
compute of expert e — the manual-DMA GMM kernel issues and waits its copies
serially within each grid instance.

Weight variants share one builder (same storage as ops/quant.py):
  * bf16:  w [E, K, N]
  * int4:  qw u8 [E, K/2, N] (half-split nibble pairs per quant group),
           zp u8 [E, KG, N], scale f32 [E, KG, N]; w = (q - zp) * s
  * int8:  qw i8 [E, K, N], scale f32 [E, KG, N]; w = q * s
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# INT4 unpack variant (static, read at trace time; see _dequant_int4):
#   0 = int-domain: (concat(lo, hi) - zp) -> f32 -> * scale
#   1 = magic-number: OR nibbles into the f32 mantissa (bitcast), one FMA
#       with precomputed (2^23 + zp) * s — no int subtract, no int->f32
#   2 = magic-number + split dots (skip the lo/hi row concat; two half-K
#       matmuls per group against the separate nibble planes)
import os


def _unpack_mode() -> int:
    return int(os.environ.get("NVT_INT4_UNPACK_MODE", "0"))


_MAGIC_I32 = 0x4B000000  # f32 bit pattern of 2^23; mantissa low bits = nibble
_MAGIC_F32 = 8388608.0


def _magic_f32(q32):
    return jax.lax.bitcast_convert_type(q32 | _MAGIC_I32, jnp.float32)


def _dequant_int4(qw_ref, zp_ref, scale, ki: int, kt: int, dtype):
    """One group's nibble planes -> dequantized weights.

    Returns a [kt, N] tile (modes 0/1) or a (w_lo, w_hi) pair of
    [kt/2, N] tiles (mode 2).
    """
    mode = _unpack_mode()
    if qw_ref.dtype == jnp.int32:  # eighth-split i32 words (pack_rows_i32)
        w32 = qw_ref[ki * (kt // 8):(ki + 1) * (kt // 8), :]
        # magic-bias subtract first (exact integer f32 math), then scale
        zm = _MAGIC_F32 + zp_ref[ki:ki + 1, :].astype(jnp.int32).astype(jnp.float32)
        planes = [_magic_f32((w32 >> (4 * p)) & 0x0F) for p in range(8)]
        f = jnp.concatenate(planes, axis=0)
        return ((f - zm) * scale).astype(dtype)
    q32 = qw_ref[ki * (kt // 2):(ki + 1) * (kt // 2), :].astype(jnp.int32)
    if mode == 0:
        lo = q32 & 0x0F
        hi = q32 >> 4
        q = jnp.concatenate([lo, hi], axis=0) - zp_ref[
            ki:ki + 1, :
        ].astype(jnp.int32)
        return (q.astype(jnp.float32) * scale).astype(dtype)
    # w = (q - zp) * s == ((2^23 + q) - (2^23 + zp)) * s; the bias subtract
    # happens in exact integer-valued f32 before scaling
    zm = _MAGIC_F32 + zp_ref[ki:ki + 1, :].astype(jnp.int32).astype(jnp.float32)
    lo = _magic_f32(q32 & 0x0F)
    hi = _magic_f32(q32 >> 4)
    if mode == 1:
        f = jnp.concatenate([lo, hi], axis=0)
        return ((f - zm) * scale).astype(dtype)
    return (((lo - zm) * scale).astype(dtype),
            ((hi - zm) * scale).astype(dtype))


def _dequant_tiles(set_refs, n_w: int, kt: int, nk: int, dtype):
    """Yield [kt, N] weight tiles (or lo/hi half-tile pairs for int4
    unpack mode 2)."""
    for ki in range(nk):
        if n_w == 1:
            yield set_refs[0][ki * kt:(ki + 1) * kt, :]
            continue
        scale = set_refs[-1][ki:ki + 1, :].astype(jnp.float32)
        if n_w == 3:
            yield _dequant_int4(set_refs[0], set_refs[1], scale, ki, kt, dtype)
        else:  # int8, symmetric
            q = set_refs[0][ki * kt:(ki + 1) * kt, :]
            yield (q.astype(jnp.float32) * scale).astype(dtype)


def _proj(x, set_refs, n_w: int, kt: int, nk: int):
    """[T, K] @ dequant(set) -> [T, N] f32 (one f32 accumulation over K)."""
    acc = None
    if os.environ.get("NVT_DEBUG_NK1"):  # diagnostic: DMA all, unpack 1 group
        nk = 1
    merge = int(os.environ.get("NVT_INT4_MERGE", "1"))
    tiles = list(_dequant_tiles(set_refs, n_w, kt, nk, x.dtype))
    if merge > 1 and n_w == 3 and not isinstance(tiles[0], tuple):
        # concat `merge` dequantized group tiles -> one taller-K matmul
        # (fewer MXU dot issues; the concat is cheap VMEM copies)
        while len(tiles) % merge != 0:
            merge -= 1
        tiles = [jnp.concatenate(tiles[j:j + merge], axis=0)
                 for j in range(0, len(tiles), merge)]
        kt = kt * merge
    for ki, w in enumerate(tiles):
        if isinstance(w, tuple):  # split nibble planes (unpack mode 2)
            w_lo, w_hi = w
            half = kt // 2
            p = jnp.dot(x[:, ki * kt:ki * kt + half], w_lo,
                        preferred_element_type=jnp.float32)
            p = p + jnp.dot(x[:, ki * kt + half:(ki + 1) * kt], w_hi,
                            preferred_element_type=jnp.float32)
        else:
            p = jnp.dot(x[:, ki * kt:(ki + 1) * kt], w,
                        preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    return acc


def _mlp(x, gate, up, down, n_w, kt_h, nk_h, kt_i, nk_i):
    """gate/up -> silu·mul -> down over per-expert sub-refs; [T, H] f32."""
    # bf16-round g/u like the XLA path (einsum preferred_element_type)
    g = _proj(x, gate, n_w, kt_h, nk_h).astype(x.dtype)
    u = _proj(x, up, n_w, kt_h, nk_h).astype(x.dtype)
    # silu inlined (jax.nn.silu lowers via a closed_call primitive
    # that trips a lowering-cache KeyError for multi-variant traces)
    gf = g.astype(jnp.float32)
    h = ((gf * jax.lax.logistic(gf)).astype(x.dtype) * u)
    return _proj(h, down, n_w, kt_i, nk_i)


def _make_kernel(n_w: int, kt_h: int, nk_h: int, kt_i: int, nk_i: int,
                 eb: int, nk_sh: int, nk_si: int):
    """nk_sh/nk_si > 0: a shared-expert MLP (weight 1.0 for every token,
    reference `/root/reference/nanovllm/models/glm4_moe/moe.py:165-171`) is
    fused in, computed once at grid step 0 from 3*n_w trailing weight refs."""

    def kernel(li_ref, x_ref, *refs):
        del li_ref  # consumed by the BlockSpec index maps only
        gate = refs[0 * n_w: 1 * n_w]
        up = refs[1 * n_w: 2 * n_w]
        down = refs[2 * n_w: 3 * n_w]
        shared = refs[3 * n_w: 6 * n_w] if nk_sh else ()
        wc_ref = refs[-2]
        out_ref = refs[-1]

        x = x_ref[...]  # [T, H]
        acc = None
        for el in range(eb):  # static unroll over the eb resident experts
            sub = lambda rs: [r.at[0, el] for r in rs]  # noqa: E731
            o = _mlp(x, sub(gate), sub(up), sub(down),
                     n_w, kt_h, nk_h, kt_i, nk_i).astype(x.dtype)
            w = wc_ref[el, 0, :]  # [T] f32 combine weights for this expert
            contrib = o.astype(jnp.float32) * w[:, None]
            acc = contrib if acc is None else acc + contrib

        @pl.when(pl.program_id(0) == 0)
        def _():
            if nk_sh:
                sb = lambda rs: [r.at[0] for r in rs]  # noqa: E731
                out_ref[...] = _mlp(
                    x, sb(shared[0 * n_w: 1 * n_w]),
                    sb(shared[1 * n_w: 2 * n_w]),
                    sb(shared[2 * n_w: 3 * n_w]),
                    n_w, kt_h, nk_sh, kt_i, nk_si,
                )
            else:
                out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += acc

    return kernel


def _flat_set(w):
    if isinstance(w, dict):
        if "zp" in w:
            return (w["qw"], w["zp"], w["scale"])
        return (w["qw"], w["scale"])
    return (w,)


def _fused_call(x_p, wc, li, n_w, *wsets_flat, quant_group: int | None = None,
                interpret: bool = False):
    """wsets_flat: layer-stacked [L, E, ...] tensors (3*n_w routed sets,
    then optionally 3*n_w shared-expert sets [L, ...]); ``li`` (traced int32
    scalar) picks the layer inside the BlockSpec index maps. Passing the
    FULL stacks + index avoids the per-layer slice XLA would otherwise
    materialize in front of the kernel (a pallas_call can't fuse a
    dynamic-slice; measured ~0.53 ms/layer of pure copy at 7.6B INT4)."""
    # Mosaic requires BlockSpec dims aligned to the dtype sublane tiling
    # (u8: 4, f32: 8); zp/scale have KG = K/group rows, which real models
    # break (GLM-4.5-Air Im=1408 → KG=11). Pad to 8 — scan-invariant, XLA
    # hoists it; the kernel reads only the first KG rows (nk = K/kt).
    def _pad_kg(w, i):
        if n_w == 1 or i % n_w == 0:  # full-precision / qw rows: aligned
            return w
        kg = w.shape[-2]
        if kg % 8 == 0:
            return w
        pad = [(0, 0)] * w.ndim
        pad[-2] = (0, -(-kg // 8) * 8 - kg)
        return jnp.pad(w, pad)

    routed = wsets_flat[: 3 * n_w]
    shared = wsets_flat[3 * n_w:]
    e = routed[0].shape[1]
    t_pad, h = x_p.shape
    i = routed[0].shape[-1]

    def tiles(sets, set_start, k, kdim):
        if n_w == 1:
            kt = next(d for d in range(min(k, 512), 0, -1) if k % d == 0)
        elif quant_group:  # explicit group: zp/scale may be pre-padded
            kt = quant_group
        else:
            kg = sets[set_start + n_w - 1].shape[kdim]
            kt = k // kg  # K tile == quant group
        return kt, k // kt

    kt_h, nk_h = tiles(routed, 0, h, 2)
    kt_i, nk_i = tiles(routed, 2 * n_w, i, 2)
    nk_sh = nk_si = 0
    if shared:
        i_sh = shared[0].shape[-1]  # Is = n_shared * Im; kt_i divides it
        assert i_sh % kt_i == 0 and h % kt_h == 0
        nk_sh, nk_si = h // kt_h, i_sh // kt_i

    # pad AFTER kt/nk are derived from the true KG
    wsets_flat = tuple(_pad_kg(w, i2) for i2, w in enumerate(wsets_flat))
    routed = wsets_flat[: 3 * n_w]
    shared = wsets_flat[3 * n_w:]

    # experts resident per grid step: fewer, larger weight DMAs amortize
    # per-step pipeline overhead (each block is double-buffered)
    per_expert = sum(
        int(np.prod(w.shape[2:])) * w.dtype.itemsize for w in routed
    )
    budget = int(os.environ.get("NVT_FUSED_MOE_VMEM_MB", "48")) * (1 << 20)
    eb = max(1, min(e, budget // (2 * max(per_expert, 1))))
    while e % eb != 0:
        eb -= 1

    in_specs = [pl.BlockSpec((t_pad, h), lambda e, li: (0, 0))]
    for w in routed:
        in_specs.append(
            pl.BlockSpec((1, eb) + w.shape[2:],
                         lambda e, li, _nd=w.ndim: (li[0], e) + (0,) * (_nd - 2))
        )
    for w in shared:  # [L, ...]: layer-indexed, constant across the grid
        in_specs.append(
            pl.BlockSpec((1,) + w.shape[1:],
                         lambda e, li, _nd=w.ndim: (li[0],) + (0,) * (_nd - 1))
        )
    in_specs.append(pl.BlockSpec((eb, 1, t_pad), lambda e, li: (e, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // eb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_pad, h), lambda e, li: (0, 0)),
    )
    out = pl.pallas_call(
        _make_kernel(n_w, kt_h, nk_h, kt_i, nk_i, eb, nk_sh, nk_si),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, h), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6),
        ),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), x_p, *wsets_flat, wc)
    return out


def moe_dense_fused(x, w_gate, w_up, w_down, w_comb_te, layer_idx=None,
                    shared=None, quant_group: int | None = None,
                    interpret: bool = False):
    """Dense-mode MoE: every expert over all T tokens, fused combine.

    x [T, H]; w_* per-expert stacks (arrays or quant dicts, all same
    variant) — either single-layer [E, ...] (``layer_idx`` None) or
    layer-stacked [L, E, ...] with ``layer_idx`` a traced int32 selecting
    the layer in-kernel (no slice copy); w_comb_te [T, E] f32 combine
    weights (0 for unselected); ``shared`` an optional (gate, up, down)
    tuple of shared-expert weights (same layer convention) fused in with
    weight 1.0. Returns [T, H] in x.dtype.
    """
    t, h = x.shape
    sets = (*_flat_set(w_gate), *_flat_set(w_up), *_flat_set(w_down))
    assert len(sets) % 3 == 0
    n_w = len(sets) // 3
    sh_sets = ()
    if shared is not None:
        sh_sets = tuple(w for p in shared for w in _flat_set(p))
        assert len(sh_sets) == 3 * n_w
    if layer_idx is None:
        sets = tuple(w[None] for w in sets)  # L = 1
        sh_sets = tuple(w[None] for w in sh_sets)
        layer_idx = 0
    e = sets[0].shape[1]
    t_pad = -(-t // 8) * 8
    x_p = jnp.zeros((t_pad, h), x.dtype).at[:t].set(x)
    wc = jnp.zeros((e, 1, t_pad), jnp.float32).at[:, 0, :t].set(
        w_comb_te.astype(jnp.float32).T
    )
    out = _fused_call(x_p, wc, layer_idx, n_w, *sets, *sh_sets,
                      quant_group=quant_group, interpret=interpret)
    return out[:t].astype(x.dtype)
