"""Pallas TPU fused dequant+matmul for a single dense weight (E = 1).

``quant_gmm`` (ops/quant_gmm_pallas.py) is built for sorted MoE rows: its
row-chunk loop re-dequantizes the resident weight tile per chunk and its
manual DMAs are issued and awaited serially inside each grid instance —
pathological for a dense call with few rows and a huge N (the [2048, 65536]
INT4 LM head measured 2.8 ms vs 0.62 ms for the bf16 dot it replaces).

This kernel is the dense shape done right: grid over N tiles with standard
BlockSpecs, so weight-block DMAs for tile n+1 overlap tile n's compute
(automatic double buffering), the whole (row-padded) lhs stays VMEM-resident,
and each weight tile is dequantized exactly once. Replaces the reference's
dequant-then-``F.linear`` (`/root/reference/nanovllm/layers/
linear_awq_new.py:254-255`) for large single matmuls (LM head, wide
projections) where the XLA path's materialized bf16 dequant transient is too
large to be fusion-friendly.

Storage as ops/quant.py: int4 = (qw u8 [K/2, N] group-half-split nibbles,
zp u8 [KG, N], scale f32 [KG, N]); int8 = (qw i8 [K, N], scale f32 [KG, N]).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# N-tile ceiling (tuning knob): 512 keeps the weight block ~<= 0.5 MB int4;
# larger tiles amortize per-grid-step overhead at the cost of VMEM
_QD_TN = int(os.environ.get("NVT_QD_TN", "512"))



def _make_kernel(n_w: int, kt: int, nk: int):
    # NOTE (round 4): an output-side-dequant rewrite of this kernel (shared
    # _proj_outscale + u16 magic-number nibble unpack) was measured on chip
    # and REGRESSED 1.81 -> 3.80 ms/step at Air decode widths; the
    # input-side (q - zp) * s chain below is the measured optimum.
    def kernel(li_ref, x_ref, *refs):
        del li_ref  # consumed by the BlockSpec index maps only
        out_ref = refs[-1]
        w_refs = [r.at[0] for r in refs[:-1]]  # drop the layer block dim
        x = x_ref[...]  # [B_pad, K]
        acc = None
        for ki in range(nk):
            scale = w_refs[n_w - 1][ki:ki + 1, :].astype(jnp.float32)
            if n_w == 3:  # int4
                q32 = w_refs[0][
                    ki * (kt // 2):(ki + 1) * (kt // 2), :
                ].astype(jnp.int32)
                q = jnp.concatenate([q32 & 0x0F, q32 >> 4], axis=0)
                q = q - w_refs[1][ki:ki + 1, :].astype(jnp.int32)
                w = (q.astype(jnp.float32) * scale).astype(x.dtype)
            else:  # int8
                q = w_refs[0][ki * kt:(ki + 1) * kt, :].astype(jnp.float32)
                w = (q * scale).astype(x.dtype)
            p = jnp.dot(x[:, ki * kt:(ki + 1) * kt], w,
                        preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        out_ref[...] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("quant_group", "interpret"))
def _dense_call(x_p, li, *wset, quant_group: int | None = None,
                interpret: bool = False):
    """wset arrays are layer-stacked [L, rows, N]; ``li`` (traced int32)
    selects the layer inside the BlockSpec index maps — single weights pass
    L=1 views. Slicing a stack in XLA would materialize a per-layer copy in
    front of the custom call (the scan-xs problem, see
    moe_dense_fused_pallas)."""
    n_w = len(wset)
    b_pad, k = x_p.shape
    n = wset[0].shape[-1]
    kt = quant_group or k // wset[-1].shape[1]  # K tile == quant group
    # N tile: biggest divisor of N <= 512 keeps the weight block ~<= 0.5 MB
    # (double-buffered) while amortizing per-step pipeline overhead; must be
    # lane-aligned (%128) unless it covers the whole dim (Mosaic block rule)
    tn = next((d for d in range(min(n, _QD_TN), 0, -1)
               if n % d == 0 and (d % 128 == 0 or d == n)), None)
    if tn is None:
        # no lane-aligned divisor (e.g. GLM-4.5-Air's dense-MLP N=10944):
        # ragged last tile — lane j of tile i is column i*tn+j everywhere
        # (q/zp/scale/out all indexed by N on the lane dim), so the padded
        # lanes of the last block only ever produce the padded output lanes
        # Mosaic masks on write
        tn = min(_QD_TN, -(-n // 128) * 128)

    in_specs = [pl.BlockSpec((b_pad, k), lambda i, li: (0, 0))]
    for w in wset:
        in_specs.append(
            pl.BlockSpec((1, w.shape[1], tn), lambda i, li: (li[0], 0, i))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(-(-n // tn),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b_pad, tn), lambda i, li: (0, i)),
    )
    out = pl.pallas_call(
        _make_kernel(n_w, kt, k // kt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), x_p, *wset)
    return out


def quant_dense_matmul(x: jax.Array, qp: dict, layer_idx=None,
                       quant_group: int | None = None,
                       interpret: bool = False):
    """y = x @ dequant(qp) for a [K, N] quant dict — or, with ``layer_idx``
    (traced int32), a layer-stacked [L, K, N] dict with the layer selected
    in-kernel (no per-layer slice copy). Returns x.dtype."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    b = x2.shape[0]
    b_pad = -(-b // 8) * 8
    if b_pad != b:
        x2 = jnp.zeros((b_pad, k), x2.dtype).at[:b].set(x2)
    if "zp" in qp:
        wset = (qp["qw"], qp["zp"], qp["scale"])
    else:
        wset = (qp["qw"], qp["scale"])
    if layer_idx is None:
        wset = tuple(w[None] for w in wset)  # L = 1 view (no copy)
        layer_idx = 0
    out = _dense_call(x2, layer_idx, *wset, quant_group=quant_group,
                      interpret=interpret)
    return out[:b].reshape(*lead, -1).astype(x.dtype)
