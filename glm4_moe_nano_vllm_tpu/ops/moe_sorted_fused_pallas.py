"""Fully-fused sorted-dispatch MoE Pallas kernel (decode at large E).

The decode regime this serves: T small (a decode batch), E large (GLM-4.5-Air
has 128 routed experts), INT4/INT8 expert weights. The step is
expert-weight-read bound (~1.2 GB packed per Air MoE layer; the measured
BlockSpec-pipeline DMA floor at these shapes is 2.09 ms = 572 GB/s) and the
two pre-existing paths both sit well above it:

  * the fused dense kernel (ops/moe_dense_fused_pallas.py) computes EVERY
    expert for every token — at T=128, E=128 that is ~567 GFLOP of mostly
    discarded MXU work (~2.9 ms at v5e peak), above the DMA floor
    (measured 4.13 ms/layer);
  * the gmm2 sorted path (ops/quant_gmm2_pallas.py) runs 2 kernel launches
    per layer (gate+up, down) with an (E, N-tiles) grid — ~2.4k grid
    instances/layer at Air widths — and full in-VMEM dequantization
    (~5 VPU ops per weight over 2.2G weights; measured 4.67 ms/layer).

This kernel does the whole gate/up → silu·mul → down chain for the sorted
rows in ONE pass over the expert weights:

  * grid = (E,): one expert per grid step; its gate/up/down blocks ride the
    standard Pallas BlockSpec pipeline (layer selected in-kernel from
    [L, E, ...] stacks via scalar-prefetch index maps), so expert e+1's
    ~9 MB of packed weights stream during expert e's compute;
  * rows live in a TM-aligned padded layout (expert e's span =
    [offs[e], offs[e+1]), a multiple of TM rows): chunk 0's row DMA for
    expert e+1 is issued during expert e's step into the parity slot
    1-(e+1)%2 (the x scratch persists across grid steps), so the typical
    decode case — one chunk per expert — exposes no row-DMA latency;
    skew chunks (c >= 1) stream serially through a dedicated third slot;
  * INT4 dequantization applies zero-point and scale on the OUTPUT per
    quantization group: out = sum_g s_g * (x_g @ q_g) - rowsums @ (zp*s).
    Per-weight VPU work drops to unpack+convert (the nibble planes enter
    the MXU as raw 0..15 values in bf16 — exact), and the (q - zp) * s
    arithmetic moves to O(T*N) per group instead of O(K*N).

Reference context: replaces the reference's Python loop over 128 expert
modules + Triton dequant-then-F.linear
(`/root/reference/nanovllm/models/glm4_moe/moe.py:135-151`,
`linear_awq_new.py:254-255`) for the decode path.

Weight storage as ops/quant.py:
  * int4: qw u8 [L, E, K/2, N] (group-half-split nibble pairs), zp u8
    [L, E, KG, N], scale f32 [L, E, KG, N]; w = (q - zp) * s
  * int8: qw i8 [L, E, K, N], scale f32 [L, E, KG, N]; w = q * s
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sf_merge() -> bool:
    """Merge the lo/hi nibble planes into one K-length dot per group
    (costs a VMEM concat) instead of two half-K dots."""
    return bool(int(os.environ.get("NVT_SFM_MERGE", "0")))


def _unpack_nibbles_bf16(w8):
    """u8 [rows, N] -> (lo, hi) nibble planes as bf16 (0..15).

    Mosaic has no direct u8/i32 -> bf16 cast; go through f32. (Masking in
    the packed u8 domain first — 4x lanes per VPU op — was tried round 4:
    Mosaic has no u8 -> f32 cast either, so the widen cannot be deferred
    past the mask. A u16-domain magic-number construction —
    (u16(b) & 0xF) | 0x4300 bitcast to bf16 == 128 + nibble exactly, offset
    folded into zp — was ALSO tried round 4 and REGRESSED on chip: in-step
    2.40 -> 2.71 ms/layer in this kernel and 1.81 -> 3.80 ms/step in
    quant_dense_pallas. Mosaic's 16-bit elementwise ops do not deliver 2x
    lane throughput here; the convert chain below is the measured optimum.)
    """
    w32 = w8.astype(jnp.int32)
    lo = (w32 & 0x0F).astype(jnp.float32).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.float32).astype(jnp.bfloat16)
    return lo, hi


def _group_rowsums(x, kt: int, nk: int):
    """[TM, K] -> [TM, nk] f32 per-quant-group row sums (for the
    output-side zero-point correction)."""
    tm = x.shape[0]
    return jnp.sum(x.astype(jnp.float32).reshape(tm, nk, kt), axis=2)


def _proj_outscale(x, qw_ref, zp_ref, sc_ref, kt: int, nk: int,
                   rowsums=None):
    """x [TM, K] @ dequant(expert weights) -> [TM, N] f32.

    INT4 (zp_ref is not None): out = sum_g s_g * (x_g @ q_g)
                                     - rowsums @ (zp * s)
    INT8 (zp_ref None):        out = sum_g s_g * (x_g @ q_g)
    """
    int4 = zp_ref is not None
    half = kt // 2
    out = None
    for g in range(nk):
        if int4:
            lo, hi = _unpack_nibbles_bf16(qw_ref[g * half:(g + 1) * half, :])
            if _sf_merge():
                w = jnp.concatenate([lo, hi], axis=0)  # [kt, N]
                a = jnp.dot(x[:, g * kt:(g + 1) * kt], w,
                            preferred_element_type=jnp.float32)
            else:
                a = jnp.dot(x[:, g * kt:g * kt + half], lo,
                            preferred_element_type=jnp.float32)
                a = a + jnp.dot(x[:, g * kt + half:(g + 1) * kt], hi,
                                preferred_element_type=jnp.float32)
        else:
            q = qw_ref[g * kt:(g + 1) * kt, :].astype(
                jnp.float32).astype(jnp.bfloat16)
            a = jnp.dot(x[:, g * kt:(g + 1) * kt], q,
                        preferred_element_type=jnp.float32)
        term = a * sc_ref[g:g + 1, :].astype(jnp.float32)
        out = term if out is None else out + term
    if int4:
        zs = zp_ref[:nk].astype(jnp.int32).astype(jnp.float32) \
            * sc_ref[:nk].astype(jnp.float32)  # [nk, N]
        if rowsums is None:
            rowsums = _group_rowsums(x, kt, nk)
        out = out - jnp.dot(rowsums, zs, preferred_element_type=jnp.float32)
    return out


def _make_kernel(n_w: int, kt_h: int, nk_h: int, kt_i: int, nk_i: int,
                 tm: int, n_experts: int):
    int4 = n_w == 3

    def kernel(offs_ref, li_ref, opend_ref, lhs_hbm, *refs):
        del li_ref  # consumed by the BlockSpec index maps only
        gate = refs[0 * n_w: 1 * n_w]
        up = refs[1 * n_w: 2 * n_w]
        down = refs[2 * n_w: 3 * n_w]
        out_hbm = refs[3 * n_w]
        x_scr, o_scr, xsem, osem = refs[3 * n_w + 1:]

        e = pl.program_id(0)
        start = pl.multiple_of(offs_ref[e], tm)
        cnt = offs_ref[e + 1] - offs_ref[e]
        nchunks = cnt // tm  # spans are TM-aligned
        p_slot = 1 - e % 2  # parity slot chunk 0 was prefetched into

        def xcopy(row0, slot):
            # every span start/chunk offset is TM-aligned by construction
            return pltpu.make_async_copy(
                lhs_hbm.at[pl.ds(pl.multiple_of(row0, 8), tm), :],
                x_scr.at[slot], xsem.at[slot],
            )

        def ocopy(row0, slot):
            return pltpu.make_async_copy(
                o_scr.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(row0, 8), tm), :],
                osem.at[slot],
            )

        # ---- cross-step row prefetch ------------------------------------
        # expert 0's own chunk 0 (first instance only)
        @pl.when(jnp.logical_and(e == 0, offs_ref[1] > 0))
        def _():
            xcopy(0, 1).start()

        # expert e+1's chunk 0, issued while e's weights/compute run;
        # slot 1-(e+1)%2 == e%2, disjoint from this step's read slots
        @pl.when(jnp.logical_and(e + 1 < n_experts,
                                 offs_ref[e + 2] > offs_ref[e + 1]))
        def _():
            xcopy(offs_ref[e + 1], e % 2).start()

        sub = lambda rs: [r.at[0, 0] for r in rs]  # noqa: E731
        g_refs, u_refs, d_refs = sub(gate), sub(up), sub(down)

        def chunk_body(c, _):
            # chunks >= 1 (skewed routing): serial stream through slot 2
            @pl.when(c > 0)
            def _():
                xcopy(start + c * tm, 2).start()
            x_slot = jax.lax.select(c == 0, p_slot, 2)
            xcopy(start + c * tm, x_slot).wait()
            x = x_scr[x_slot]  # [TM, H] bf16

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
                o = _proj_outscale(hid, d_refs[0], d_refs[1], d_refs[2],
                                   kt_i, nk_i)
            else:
                o = _proj_outscale(hid, d_refs[0], None, d_refs[1],
                                   kt_i, nk_i)

            o_slot = c % 2
            # lazy cross-expert drain: wait the slot's previous copy (this
            # expert's c-2, or an earlier expert's — tracked by the SMEM
            # pending flag, so waits overlap the interleaving compute
            # instead of an eager per-expert epilogue)
            @pl.when(opend_ref[o_slot] == 1)
            def _():
                pltpu.make_async_copy(
                    o_scr.at[o_slot], o_scr.at[o_slot], osem.at[o_slot]
                ).wait()
            o_scr[o_slot] = o.astype(o_scr.dtype)
            ocopy(start + c * tm, o_slot).start()
            opend_ref[o_slot] = 1
            return 0

        @pl.when(nchunks > 0)
        def _():
            jax.lax.fori_loop(0, nchunks, chunk_body, 0, unroll=False)

        # final drain: all outstanding output copies must land before the
        # kernel ends
        @pl.when(e == n_experts - 1)
        def _():
            for s in range(2):
                @pl.when(opend_ref[s] == 1)
                def _(s=s):
                    pltpu.make_async_copy(
                        o_scr.at[s], o_scr.at[s], osem.at[s]
                    ).wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("m_ext", "tm", "quant_group",
                                    "interpret"))
def _sorted_fused_call(lhs, offs, layer_idx, *wsets_flat, m_ext: int,
                       tm: int, quant_group: int | None = None,
                       interpret: bool = False):
    """lhs [m_ext, H] padded sorted rows; offs [E+1] TM-aligned span
    starts; weight stacks [L, E, ...] (layer picked in-kernel — slicing in
    XLA would materialize a per-layer copy of the expert stack in front of
    the custom call, see moe_dense_fused_pallas).

    ``quant_group``: the quantization group size, REQUIRED when zp/scale
    rows are pre-padded to the sublane tiling (engine init pads them once —
    a trace-time pad re-executes per scanned layer per step, measured
    5.8 ms per Air decode micro-step). Without it the group is derived from
    the (unpadded) scale row count."""
    int4 = wsets_flat[0].dtype == jnp.uint8
    n_w = 3 if int4 else 2
    assert len(wsets_flat) == 3 * n_w
    h = lhs.shape[1]
    e = wsets_flat[0].shape[1]
    im = wsets_flat[0].shape[3]

    if quant_group:
        kt_h = kt_i = quant_group
    else:
        kt_h = h // wsets_flat[n_w - 1].shape[2]  # gate/up scale rows
        kt_i = im // wsets_flat[3 * n_w - 1].shape[2]  # down scale rows
    nk_h, nk_i = h // kt_h, im // kt_i

    # Mosaic sublane alignment for the KG dims (pad to 8, like the dense
    # kernel — GLM-4.5-Air's down KG=11 breaks it); kernels read only the
    # first nk rows
    def _pad_kg(w, i):
        if i % n_w == 0:  # qw rows (K/2 or K) are already aligned
            return w
        kg = w.shape[-2]
        if kg % 8 == 0:
            return w
        pad = [(0, 0)] * w.ndim
        pad[-2] = (0, -(-kg // 8) * 8 - kg)
        return jnp.pad(w, pad)

    wsets_flat = tuple(_pad_kg(w, i) for i, w in enumerate(wsets_flat))

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # lhs rows: manual DMA
    for w in wsets_flat:
        in_specs.append(
            pl.BlockSpec((1, 1) + w.shape[2:],
                         lambda ei, offs, li, op: (li[0], ei, 0, 0))
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(e,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((3, tm, h), lhs.dtype),
            pltpu.VMEM((2, tm, h), lhs.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # one extra offs slot: the kernel reads offs[e+2] for the prefetch
    offs_ext = jnp.concatenate([offs, offs[-1:]])
    out = pl.pallas_call(
        _make_kernel(n_w, kt_h, nk_h, kt_i, nk_i, tm, e),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_ext, h), lhs.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6),
        ),
        interpret=interpret,
    )(offs_ext, jnp.asarray(layer_idx, jnp.int32).reshape(1),
      jnp.zeros((2,), jnp.int32), lhs, *wsets_flat)
    return out


def pick_tm(t: int, k: int, e: int) -> int:
    """Row-chunk tile: ~2x the average rows per expert, 8-aligned, in
    [8, 128] — the typical expert then fits one chunk and the padded
    layout stays ~3x the real rows."""
    env = os.environ.get("NVT_SFM_TM")
    if env:
        return int(env)
    avg = max(1, (t * k) // max(e, 1))
    return min(128, max(8, -(-2 * avg // 8) * 8))


def sorted_fused_layout(group_sizes: jax.Array, m: int, tm: int, e: int):
    """TM-aligned padded row layout: (offs [E+1], dst [m], m_ext).

    Expert i's rows occupy [offs[i], offs[i] + ceil(cnt_i/tm)*tm); dst maps
    each real sorted row to its padded slot; m_ext statically bounds the
    padded total (m + e*tm)."""
    spans = ((group_sizes + tm - 1) // tm) * tm
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(spans, dtype=jnp.int32)]
    )
    real = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(group_sizes, dtype=jnp.int32)]
    )
    row = jnp.arange(m, dtype=jnp.int32)
    grp = jnp.searchsorted(real[1:], row, side="right").astype(jnp.int32)
    dst = jnp.take(offs, grp) + (row - jnp.take(real, grp))
    m_ext = m + e * tm
    return offs, dst, m_ext


def moe_sorted_fused(x, topk_idx, topk_w, w_gate, w_up, w_down,
                     layer_idx=None, quant_group: int | None = None,
                     interpret: bool = False):
    """Sorted-dispatch MoE with the fused kernel: returns [T, H] in x.dtype.

    x [T, H]; topk_idx [T, K] int32; topk_w [T, K] f32; w_* quant dicts
    (int4 {qw, zp, scale} or int8 {qw, scale}), either [E, ...]
    (layer_idx None) or layer-stacked [L, E, ...] with a traced int32
    ``layer_idx``.
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
    li = 0 if layer_idx is None else layer_idx
    e = sets[0].shape[1]

    flat_e = topk_idx.reshape(-1)
    sort_i = jnp.argsort(flat_e)  # stable: expert-contiguous spans
    group_sizes = jnp.bincount(flat_e, length=e).astype(jnp.int32)
    tk = t * k
    tm = pick_tm(t, k, e)
    offs, dst, m_ext = sorted_fused_layout(group_sizes, tk, tm, e)
    src = jnp.zeros((m_ext,), jnp.int32).at[dst].set(sort_i // k)
    lhs = jnp.take(x, src, axis=0)  # [m_ext, H] padded sorted rows

    o_pad = _sorted_fused_call(lhs, offs, li, *sets, m_ext=m_ext, tm=tm,
                               quant_group=quant_group, interpret=interpret)

    # combine: assignment (t, kk) is sorted row inv[t*k+kk] at padded slot
    # dst[inv[...]]; weights are applied post-gather in unsorted order
    inv = jnp.zeros((tk,), jnp.int32).at[sort_i].set(
        jnp.arange(tk, dtype=jnp.int32)
    )
    o_tk = jnp.take(o_pad, jnp.take(dst, inv), axis=0)
    o_tk = o_tk.astype(jnp.float32) * topk_w.reshape(-1)[:, None]
    return jnp.sum(o_tk.reshape(t, k, h), axis=1).astype(x.dtype)
