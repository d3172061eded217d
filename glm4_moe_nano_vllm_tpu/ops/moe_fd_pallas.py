"""Fused-dispatch MoE Pallas kernel (decode): gather + experts + combine in one.

The decode regime: T small (a decode batch, <= ~256 rows), E up to 128,
INT4/INT8 expert weights. At these shapes the whole activation working set
fits VMEM — x [T, H] bf16 is ~1 MiB at Air widths, the f32 output
accumulator ~2 MiB — so the token dispatch does not need to move rows
through HBM at all:

  * `ops/moe_sorted_fused_pallas.py` (the previous decode kernel at large E)
    materializes the padded sorted rows `lhs [m_ext, H]` with an XLA gather,
    streams them back per expert chunk, writes per-assignment outputs
    `o_pad [m_ext, H]` to HBM, and gathers + weights + k-sums them in XLA —
    measured ~1.4 ms/step of gather/combine fusions outside the kernel at
    the Air decode shape (T=128, E=128, top-8);
  * this kernel keeps x resident in VMEM and dispatches with one-hot
    matmuls: per expert chunk, `sel [TM, T]` (one-hot bf16, built in XLA
    from the sorted assignment layout) gathers `x_chunk = sel @ x`, and the
    weighted combine accumulates `out += (sel * w)^T @ o` into a
    VMEM-resident f32 [T, H] block. sel/selw are tiny (~2.3 MiB total at
    Air decode) next to the ~1.1 GiB expert weight stream, and the gather/
    combine matmuls (~2 GFLOP/layer) hide entirely under the weight DMAs.

It also fixes the expert-parallel small-shard problem: a 16-expert EP shard
(Air over v5e-8) served by the dense-mode kernel computes every token for
every local expert (~70 GFLOP at T=128 — MXU-bound, measured 0.743 ms/layer
= ~201 GB/s effective); this kernel computes only the ~T*K/n locally routed
rows (~5 GFLOP), so the shard goes back to being weight-stream bound.

The expert MLP itself reuses the output-side dequantization of the sorted
kernel (`_proj_outscale`): nibble planes enter the MXU raw, zero-point and
scale apply per quant group on the [TM, N] output. A shared expert
(reference `/root/reference/nanovllm/models/glm4_moe/moe.py:165-171`) is
optionally fused in at grid step 0 with combine weight 1.0 for every token.

Reference context: replaces the reference's Python loop over 128 expert
modules + Triton dequant (`/root/reference/nanovllm/models/glm4_moe/
moe.py:135-151`, `linear_awq_new.py:254-255`) for decode steps.

Weight storage as ops/quant.py (same as the sibling kernels):
  * int4: qw u8 [L, E, K/2, N], zp u8 [L, E, KG, N], scale f32 [L, E, KG, N]
  * int8: qw i8 [L, E, K, N], scale f32 [L, E, KG, N]
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glm4_moe_nano_vllm_tpu.ops.moe_sorted_fused_pallas import (
    _group_rowsums,
    _proj_outscale,
)


def _mlp(x, g_refs, u_refs, d_refs, int4, kt_h, nk_h, kt_i, nk_i):
    """gate/up -> silu*mul -> down via output-side dequant; [rows, H] f32."""
    if int4:
        rs_h = _group_rowsums(x, kt_h, nk_h)
        g = _proj_outscale(x, g_refs[0], g_refs[1], g_refs[2],
                           kt_h, nk_h, rs_h)
        u = _proj_outscale(x, u_refs[0], u_refs[1], u_refs[2],
                           kt_h, nk_h, rs_h)
    else:
        g = _proj_outscale(x, g_refs[0], None, g_refs[1], kt_h, nk_h)
        u = _proj_outscale(x, u_refs[0], None, u_refs[1], kt_h, nk_h)
    hid = ((g * jax.lax.logistic(g)) * u).astype(jnp.bfloat16)
    if int4:
        return _proj_outscale(hid, d_refs[0], d_refs[1], d_refs[2],
                              kt_i, nk_i)
    return _proj_outscale(hid, d_refs[0], None, d_refs[1], kt_i, nk_i)


def _make_kernel(n_w: int, kt_h: int, nk_h: int, kt_i: int, nk_i: int,
                 tm: int, nk_sh: int, nk_si: int, epb: int = 1):
    int4 = n_w == 3

    def kernel(offs_ref, li_ref, x_ref, sel_ref, selw_ref, *refs):
        del li_ref  # consumed by the BlockSpec index maps only
        gate = refs[0 * n_w: 1 * n_w]
        up = refs[1 * n_w: 2 * n_w]
        down = refs[2 * n_w: 3 * n_w]
        shared = refs[3 * n_w: 6 * n_w] if nk_sh else ()
        out_ref = refs[-1]

        e = pl.program_id(0)

        # grid step 0: seed the resident accumulator (shared expert at
        # combine weight 1.0, or zeros)
        @pl.when(e == 0)
        def _():
            if nk_sh:
                sb = lambda rs: [r.at[0] for r in rs]  # noqa: E731
                xs = x_ref[...]
                out_ref[...] = _mlp(
                    xs, sb(shared[0 * n_w: 1 * n_w]),
                    sb(shared[1 * n_w: 2 * n_w]),
                    sb(shared[2 * n_w: 3 * n_w]),
                    int4, kt_h, nk_sh, kt_i, nk_si,
                )
            else:
                out_ref[...] = jnp.zeros_like(out_ref)

        # epb experts share one grid step (one 2x-sized weight DMA block);
        # each keeps its own offs span
        for sub_e in range(epb):
            eg = e * epb + sub_e if epb > 1 else e
            start = pl.multiple_of(offs_ref[eg], tm)
            nchunks = (offs_ref[eg + 1] - offs_ref[eg]) // tm

            sub = lambda rs, s=sub_e: [r.at[0, s] for r in rs]  # noqa: E731
            g_refs, u_refs, d_refs = sub(gate), sub(up), sub(down)

            def chunk_body(c, _, start=start, g_refs=g_refs, u_refs=u_refs,
                           d_refs=d_refs):
                row0 = pl.multiple_of(start + c * tm, tm)
                sel = sel_ref[pl.ds(row0, tm), :]  # [TM, T] one-hot bf16
                # in-VMEM gather: exact bf16 row copies (1.0 * x, f32 accum)
                x = jax.lax.dot_general(
                    sel, x_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x_ref.dtype)  # [TM, H]
                o = _mlp(x, g_refs, u_refs, d_refs, int4,
                         kt_h, nk_h, kt_i, nk_i)  # [TM, H] f32
                # weighted combine: selw rows are onehot * combine-weight,
                # so each token receives at most one contribution per chunk
                sw = selw_ref[pl.ds(row0, tm), :]  # [TM, T] f32
                out_ref[...] += jax.lax.dot_general(
                    sw, o, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return 0

            @pl.when(nchunks > 0)
            def _(chunk_body=chunk_body, nchunks=nchunks):
                jax.lax.fori_loop(0, nchunks, chunk_body, 0, unroll=False)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("m_ext", "tm", "quant_group",
                                    "interpret"))
def _fd_call(x_p, sel, selw, offs, layer_idx, *wsets_flat, m_ext: int,
             tm: int, quant_group: int | None = None,
             interpret: bool = False):
    """x_p [T_pad, H] bf16; sel [m_ext, T_pad] bf16 one-hot; selw same in
    f32 with combine weights folded in; offs [E+1] TM-aligned span starts.
    Routed weight stacks [L, E, ...] (layer picked in-kernel), then
    optionally 3*n_w shared-expert stacks [L, ...]."""
    int4 = wsets_flat[0].dtype == jnp.uint8
    n_w = 3 if int4 else 2
    routed = wsets_flat[: 3 * n_w]
    sh_sets = wsets_flat[3 * n_w:]
    t_pad, h = x_p.shape
    e = routed[0].shape[1]
    im = routed[0].shape[3]

    if quant_group:
        kt_h = kt_i = quant_group
    else:
        kt_h = h // routed[n_w - 1].shape[2]
        kt_i = im // routed[3 * n_w - 1].shape[2]
    nk_h, nk_i = h // kt_h, im // kt_i
    nk_sh = nk_si = 0
    if sh_sets:
        i_sh = sh_sets[0].shape[-1]  # Is = n_shared * Im
        assert i_sh % kt_i == 0 and h % kt_h == 0
        nk_sh, nk_si = h // kt_h, i_sh // kt_i

    # Mosaic sublane alignment for the KG dims (see the sibling kernels)
    def _pad_kg(w, i):
        if i % n_w == 0:  # qw rows are already aligned
            return w
        kg = w.shape[-2]
        if kg % 8 == 0:
            return w
        pad = [(0, 0)] * w.ndim
        pad[-2] = (0, -(-kg // 8) * 8 - kg)
        return jnp.pad(w, pad)

    wsets_flat = tuple(_pad_kg(w, i) for i, w in enumerate(wsets_flat))
    routed = wsets_flat[: 3 * n_w]
    sh_sets = wsets_flat[3 * n_w:]

    # experts per grid step: >1 doubles the per-step weight DMA block (A/B
    # knob for the streaming-ceiling question, BENCHMARKS.md round 4)
    epb = int(os.environ.get("NVT_FD_EPB", "1"))
    if epb <= 1 or e % epb != 0:
        epb = 1

    in_specs = [
        pl.BlockSpec((t_pad, h), lambda e, offs, li: (0, 0)),  # x: resident
        pl.BlockSpec((m_ext, t_pad), lambda e, offs, li: (0, 0)),  # sel: resident
        pl.BlockSpec((m_ext, t_pad), lambda e, offs, li: (0, 0)),  # selw: resident
    ]
    for w in routed:
        in_specs.append(
            pl.BlockSpec((1, epb) + w.shape[2:],
                         lambda ei, offs, li: (li[0], ei, 0, 0))
        )
    for w in sh_sets:  # [L, ...]: layer-indexed, constant across the grid
        in_specs.append(
            pl.BlockSpec((1,) + w.shape[1:],
                         lambda ei, offs, li, _nd=w.ndim: (li[0],) + (0,) * (_nd - 1))
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e // epb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_pad, h), lambda e, offs, li: (0, 0)),
    )
    out = pl.pallas_call(
        _make_kernel(n_w, kt_h, nk_h, kt_i, nk_i, tm, nk_sh, nk_si, epb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, h), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6),
        ),
        interpret=interpret,
    )(offs, jnp.asarray(layer_idx, jnp.int32).reshape(1),
      x_p, sel, selw, *wsets_flat)
    return out


def pick_tm_fd(t: int, k: int, e: int, expected_rows: int | None = None
               ) -> int:
    """Row-chunk tile: ~2x the average rows per expert, 16-aligned (the
    bf16 sel rows are sliced at TM granularity on the sublane dim), in
    [16, 128]. ``expected_rows``: expected REAL (non-sentinel) assignment
    count — under EP only ~T*K/n of the global assignments hit the local
    shard, and sizing TM from T*K would make every chunk mostly padding."""
    env = os.environ.get("NVT_FD_TM")
    if env:
        return int(env)
    rows = t * k if expected_rows is None else expected_rows
    avg = max(1, rows // max(e, 1))
    return min(128, max(16, -(-2 * avg // 16) * 16))


def fd_vmem_bytes(t: int, k: int, e: int, h: int,
                  expected_rows: int | None = None) -> int:
    """Estimated resident VMEM for the dispatch operands (x, out, sel,
    selw) — the policy bound that keeps the kernel in its decode regime."""
    t_pad = -(-t // 8) * 8
    tm = pick_tm_fd(t, k, e, expected_rows)
    m_ext = -(-(t * k + e * tm) // tm) * tm
    return t_pad * h * 6 + m_ext * max(t_pad, 128) * 6


def moe_fused_dispatch(x, topk_idx, topk_w, w_gate, w_up, w_down,
                       layer_idx=None, shared=None,
                       quant_group: int | None = None,
                       expected_rows: int | None = None,
                       interpret: bool = False):
    """Fully-fused MoE decode step: dispatch, experts, weighted combine
    (and optionally the shared expert) in one pallas_call.

    x [T, H]; topk_idx [T, K] int32 — entries equal to E are sentinels
    (dropped assignments, e.g. non-local experts under EP); topk_w [T, K]
    f32 (must be 0 where the index is a sentinel); w_* quant dicts, either
    [E, ...] (layer_idx None) or layer-stacked [L, E, ...] with a traced
    int32 ``layer_idx``; ``shared`` an optional (gate, up, down) tuple of
    shared-expert quant dicts fused in with weight 1.0. Returns [T, H] in
    x.dtype.
    """
    t, h = x.shape
    k = topk_idx.shape[1]

    def flat(w):
        parts = ((w["qw"], w["zp"], w["scale"])
                 if "zp" in w else (w["qw"], w["scale"]))
        if layer_idx is None:
            parts = tuple(p[None] for p in parts)  # L = 1 view (no copy)
        return parts

    sets = (*flat(w_gate), *flat(w_up), *flat(w_down))
    sh_sets = ()
    if shared is not None:
        sh_sets = tuple(w for p in shared for w in flat(p))
        assert len(sh_sets) == len(sets)
    li = 0 if layer_idx is None else layer_idx
    e = sets[0].shape[1]

    # ---- scatter-free dispatch build ----------------------------------
    # The sorted-layout build (argsort + bincount + three .at[dst].set
    # scatters) cost ~0.47 ms/step at Air decode — XLA serializes small
    # int scatters on TPU (profiled round 4, "fusion.327 bound=VMEM
    # Write"). Everything below is dense compares / cumsums / row GATHERS,
    # which vectorize. Row order within an expert is token-major, same as
    # the stable argsort it replaces. Sentinel ids (== E) never match
    # iota_e, so they drop out with no special-casing.
    tk = t * k
    tm = pick_tm_fd(t, k, e, expected_rows)
    t_pad = -(-t // 8) * 8
    m_ext = -(-(tk + e * tm) // tm) * tm  # static span bound (any skew)

    iota_e = jnp.arange(e, dtype=topk_idx.dtype)
    eye = topk_idx[:, :, None] == iota_e[None, None, :]  # [T, K, E]
    assigned = jnp.any(eye, axis=1)  # [T, E] (expert ids distinct per row)
    w_te = jnp.sum(jnp.where(eye, topk_w[:, :, None].astype(jnp.float32),
                             0.0), axis=1)  # [T, E]
    group_sizes = jnp.sum(assigned, axis=0, dtype=jnp.int32)  # [E]
    # rank of token t within expert col e = # earlier assigned tokens
    csum = jnp.cumsum(assigned.astype(jnp.int32), axis=0)
    rank = csum - assigned.astype(jnp.int32)  # exclusive
    spans = ((group_sizes + tm - 1) // tm) * tm
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(spans, dtype=jnp.int32)]
    )
    # per padded row r: which expert span owns it, via a dense interval
    # compare (searchsorted profiled 196 us/layer serialized on TPU, and
    # even [m_ext]-from-[E] gathers cost ~25 us/layer — everything below
    # is vector compares + tiny one-hot matmuls instead)
    iota_m = jnp.arange(m_ext, dtype=jnp.int32)[:, None]
    oh_e = ((offs[:-1][None, :] <= iota_m)
            & (iota_m < offs[1:][None, :]))  # [m_ext, E]; all-false past end
    ohf = oh_e.astype(jnp.float32)
    start_r = jnp.dot(ohf, offs[:-1].astype(jnp.float32),
                      preferred_element_type=jnp.float32)  # exact (one-hot)
    c_r = iota_m[:, 0].astype(jnp.float32) - start_r  # slot within the span
    # sel[r, t] = assigned[t, e_r] and rank[t, e_r] == c_r — realized as
    # ONE one-hot matmul against the [T, E] routing matrices stacked on
    # the T axis (values are small ints / weights; one-hot rows make every
    # product exact in f32; stacking merges three dots + their fusion
    # packaging per layer into one)
    stacked = jnp.concatenate(
        [assigned.T.astype(jnp.float32), rank.T.astype(jnp.float32),
         w_te.T], axis=1)  # [E, 3T]
    rows3 = jnp.dot(ohf, stacked, preferred_element_type=jnp.float32)
    a_rows, r_rows, w_rows = (rows3[:, :t], rows3[:, t:2 * t],
                              rows3[:, 2 * t:])
    onehot = (a_rows > 0.5) & (r_rows == c_r[:, None])
    if t_pad != t:
        onehot = jnp.pad(onehot, ((0, 0), (0, t_pad - t)))
        w_rows = jnp.pad(w_rows, ((0, 0), (0, t_pad - t)))
    sel = onehot.astype(x.dtype)  # one-hot gather operand (1.0 * x is exact)
    selw = onehot.astype(jnp.float32) * w_rows

    x_p = x if t == t_pad else jnp.pad(x, ((0, t_pad - t), (0, 0)))
    out = _fd_call(x_p, sel, selw, offs, li,
                   *sets, *sh_sets, m_ext=m_ext, tm=tm,
                   quant_group=quant_group, interpret=interpret)
    return out[:t].astype(x.dtype)
