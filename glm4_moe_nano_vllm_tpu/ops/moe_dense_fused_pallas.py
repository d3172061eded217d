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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _dequant_tiles(set_refs, n_w: int, kt: int, nk: int, dtype):
    """Yield [kt, N] weight tiles (dequantized for quant variants)."""
    for ki in range(nk):
        if n_w == 1:
            yield set_refs[0][0, ki * kt:(ki + 1) * kt, :]
            continue
        scale = set_refs[-1][0, ki:ki + 1, :]
        if n_w == 3:  # int4: row-concat nibble planes, shift by zero-point
            q32 = set_refs[0][
                0, ki * (kt // 2):(ki + 1) * (kt // 2), :
            ].astype(jnp.int32)
            lo = q32 & 0x0F
            hi = q32 >> 4
            q = jnp.concatenate([lo, hi], axis=0) - set_refs[1][
                0, ki:ki + 1, :
            ].astype(jnp.int32)
        else:  # int8, symmetric
            q = set_refs[0][0, ki * kt:(ki + 1) * kt, :]
        yield (q.astype(jnp.float32) * scale).astype(dtype)


def _proj(x, set_refs, n_w: int, kt: int, nk: int):
    """[T, K] @ dequant(set) -> [T, N] f32 (one f32 accumulation over K)."""
    acc = None
    for ki, w in enumerate(_dequant_tiles(set_refs, n_w, kt, nk, x.dtype)):
        p = jnp.dot(x[:, ki * kt:(ki + 1) * kt], w,
                    preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    return acc


def _make_kernel(n_w: int, kt_h: int, nk_h: int, kt_i: int, nk_i: int):
    def kernel(x_ref, *refs):
        gate = refs[0 * n_w: 1 * n_w]
        up = refs[1 * n_w: 2 * n_w]
        down = refs[2 * n_w: 3 * n_w]
        wc_ref = refs[3 * n_w]
        out_ref = refs[3 * n_w + 1]

        x = x_ref[...]  # [T, H]
        # bf16-round g/u like the XLA path (einsum preferred_element_type)
        g = _proj(x, gate, n_w, kt_h, nk_h).astype(x.dtype)
        u = _proj(x, up, n_w, kt_h, nk_h).astype(x.dtype)
        h = (jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u)
        o = _proj(h, down, n_w, kt_i, nk_i).astype(x.dtype)
        w = wc_ref[0, 0, :]  # [T] f32 combine weights for this expert
        contrib = o.astype(jnp.float32) * w[:, None]

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += contrib

    return kernel


def _flat_set(w):
    if isinstance(w, dict):
        if "zp" in w:
            return (w["qw"], w["zp"], w["scale"].astype(jnp.float32))
        return (w["qw"], w["scale"].astype(jnp.float32))
    return (w,)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_call(x_p, wc, *wsets_flat, interpret: bool = False):
    n_w = len(wsets_flat) // 3
    e = wsets_flat[0].shape[0]
    t_pad, h = x_p.shape
    i = wsets_flat[0].shape[-1]

    def tiles(set_start, k):
        if n_w == 1:
            kt = next(d for d in range(min(k, 512), 0, -1) if k % d == 0)
        else:
            kg = wsets_flat[set_start + n_w - 1].shape[1]
            kt = k // kg  # K tile == quant group
        return kt, k // kt

    kt_h, nk_h = tiles(0, h)
    kt_i, nk_i = tiles(2 * n_w, i)

    in_specs = [pl.BlockSpec((t_pad, h), lambda e: (0, 0))]
    for j, w in enumerate(wsets_flat):
        in_specs.append(
            pl.BlockSpec((1,) + w.shape[1:],
                         lambda e, _nd=w.ndim: (e,) + (0,) * (_nd - 1))
        )
    in_specs.append(pl.BlockSpec((1, 1, t_pad), lambda e: (e, 0, 0)))

    out = pl.pallas_call(
        _make_kernel(n_w, kt_h, nk_h, kt_i, nk_i),
        grid=(e,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_pad, h), lambda e: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, h), jnp.float32),
        interpret=interpret,
    )(x_p, *wsets_flat, wc)
    return out


def moe_dense_fused(x, w_gate, w_up, w_down, w_comb_te, interpret: bool = False):
    """Dense-mode MoE: every expert over all T tokens, fused combine.

    x [T, H]; w_* per-expert stacks (arrays or quant dicts, all same
    variant); w_comb_te [T, E] f32 combine weights (0 for unselected).
    Returns [T, H] in x.dtype.
    """
    t, h = x.shape
    e = _flat_set(w_gate)[0].shape[0]
    t_pad = -(-t // 8) * 8
    x_p = jnp.zeros((t_pad, h), x.dtype).at[:t].set(x)
    wc = jnp.zeros((e, 1, t_pad), jnp.float32).at[:, 0, :t].set(
        w_comb_te.astype(jnp.float32).T
    )
    sets = (*_flat_set(w_gate), *_flat_set(w_up), *_flat_set(w_down))
    assert len(sets) % 3 == 0
    out = _fused_call(x_p, wc, *sets, interpret=interpret)
    return out[:t].astype(x.dtype)
