"""Shared transformer building blocks (functional JAX).

Models are pure functions over parameter pytrees; layers are stacked along a
leading axis and iterated with ``lax.scan`` so the whole decoder traces once
(compile time stays flat in depth — the TPU answer to the reference's
per-layer eager modules, `/root/reference/nanovllm/models/qwen3.py:156-177`).

The attention block reproduces the reference attention data flow
(`/root/reference/nanovllm/models/glm4_moe/attention_new.py:281-365` and
`qwen3.py:14-82`): qkv projection → optional per-head q/k RMS-norm →
(partial) RoPE → KV scatter into the paged cache → paged attention → output
projection.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from glm4_moe_nano_vllm_tpu.config import ModelConfig
from glm4_moe_nano_vllm_tpu.engine.batch import BatchInfo
from glm4_moe_nano_vllm_tpu.layers.activation import silu_and_mul
from glm4_moe_nano_vllm_tpu.layers.normalization import rms_norm
from glm4_moe_nano_vllm_tpu.layers.rotary import apply_rope
from glm4_moe_nano_vllm_tpu.ops.attention import paged_attention
from glm4_moe_nano_vllm_tpu.ops.kv_cache import write_kv

Params = dict[str, Any]


def linear(x: jax.Array, w, b: jax.Array | None = None,
           layer_idx=None, quant_group: int | None = None) -> jax.Array:
    """Dense or weight-only-quantized linear (w is an array or a quant dict).

    ``layer_idx``: w is a layer-stacked [L, ...] quant dict; the dense
    Pallas kernel selects the layer in-kernel (no scan-xs slice copy)."""
    if isinstance(w, dict):
        from glm4_moe_nano_vllm_tpu.ops.quant_matmul import quant_matmul

        out = quant_matmul(x, w, layer_idx=layer_idx,
                           quant_group=quant_group)
    else:
        if layer_idx is not None:
            w = jax.lax.dynamic_index_in_dim(w, layer_idx, 0, False)
        out = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        out = out + b
    return out


def attention_block(
    x: jax.Array,  # [B, S, hidden]
    lp: Params,  # one layer's attention params
    k_cache: jax.Array,  # [H_kv, L*num_blocks, bs, D] layer-flat paged cache
    v_cache: jax.Array,
    batch: BatchInfo,
    cfg: ModelConfig,
    inv_freq: jax.Array,
    layer_idx: jax.Array,  # scalar int32: this layer's slab in the flat cache
    num_blocks: int,  # blocks per layer (static)
    attn_stacks: Params | None = None,  # full [L, ...] wq/wk/wv/wo stacks:
    # projections select the layer in-kernel instead of riding the scan xs
    # (each sliced INT4 qkv/o stack is a real per-layer copy, ~0.9 ms per
    # Air decode micro-step)
    cos_sin=None,  # per-step rope tables (layers.rotary.rope_cos_sin)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    b, s, _ = x.shape
    nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rotary_dim = int(d * cfg.partial_rotary_factor)
    from glm4_moe_nano_vllm_tpu.ops.kv_cache import is_scaled_cache

    kc_arr = k_cache["data"] if is_scaled_cache(k_cache) else k_cache
    block_size = kc_arr.shape[2]

    ws = attn_stacks if attn_stacks is not None else lp
    li = layer_idx if attn_stacks is not None else None
    qg = cfg.quant.group_size if cfg.quant is not None else None
    if "wqkv" in ws:
        # init-time fused q|k|v concat (ModelRunner._fuse_qkv_projections):
        # one dense-kernel launch, bit-identical per output column
        qkv = linear(x, ws["wqkv"], lp.get("bqkv"), layer_idx=li,
                     quant_group=qg)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nkv) * d], axis=-1)
        q = q.reshape(b, s, nq, d)
        k = k.reshape(b, s, nkv, d)
        v = v.reshape(b, s, nkv, d)
    else:
        q = linear(x, ws["wq"], lp.get("bq"), layer_idx=li,
                   quant_group=qg).reshape(b, s, nq, d)
        k = linear(x, ws["wk"], lp.get("bk"), layer_idx=li,
                   quant_group=qg).reshape(b, s, nkv, d)
        v = linear(x, ws["wv"], lp.get("bv"), layer_idx=li,
                   quant_group=qg).reshape(b, s, nkv, d)

    if cfg.use_qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)

    q, k = apply_rope(q, k, batch.positions, inv_freq, rotary_dim,
                      cos_sin=cos_sin)

    # All layers share one flat cache (blocks of layer l live at
    # [l*num_blocks, (l+1)*num_blocks)); the cache is a scan *carry*, updated
    # in place. On TPU the write is a Pallas RMW kernel with input/output
    # aliasing — the XLA scatter prefers a token-major cache layout that
    # conflicts with the attention kernels' head-major layout, forcing
    # full-cache layout-conversion copies every layer (measured ~40x decode
    # slowdown at 1.6 GB cache).
    block_tables = batch.block_tables + layer_idx * num_blocks
    from glm4_moe_nano_vllm_tpu.ops.attention import _use_pallas

    if _use_pallas() and d % 128 == 0:
        from glm4_moe_nano_vllm_tpu.ops.kv_write_pallas import write_kv_pallas

        k_cache, v_cache = write_kv_pallas(
            k_cache, v_cache,
            k.reshape(b * s, nkv, d), v.reshape(b * s, nkv, d),
            block_tables, batch.positions[:, 0], batch.context_lens,
        )
    else:
        slots = jnp.where(
            batch.slot_mapping < 0, -1,
            batch.slot_mapping + layer_idx * (num_blocks * block_size),
        )
        k_cache, v_cache = write_kv(
            k_cache, v_cache,
            k.reshape(b * s, nkv, d), v.reshape(b * s, nkv, d),
            slots,
        )

    o = paged_attention(
        q, k_cache, v_cache,
        block_tables, batch.context_lens, batch.positions,
        sm_scale=1.0 / math.sqrt(d),
    )
    out = linear(o.reshape(b, s, nq * d), ws["wo"], layer_idx=li,
                 quant_group=qg)
    return out, k_cache, v_cache


def mlp_block(x: jax.Array, wg: jax.Array, wu: jax.Array, wd: jax.Array,
              layer_idx=None) -> jax.Array:
    """SiLU-gated MLP. With ``layer_idx`` the weights are layer-stacked
    [L, ...] quant dicts selected in-kernel — per-layer XLA slices of quant
    stacks are real HBM copies (measured 7.5 ms/step on Qwen3-8B INT8: the
    gate/up/down stacks rode the scan xs while only attention projections
    had the in-kernel treatment)."""
    return linear(
        silu_and_mul(linear(x, wg, layer_idx=layer_idx),
                     linear(x, wu, layer_idx=layer_idx)),
        wd, layer_idx=layer_idx,
    )


def mlp_block_fused(x: jax.Array, wgu, wd, layer_idx=None) -> jax.Array:
    """SiLU-gated MLP with the gate|up pair N-concatenated into ONE quant
    matmul (ModelRunner._fuse_gate_up): halves the MLP call count; AWQ/int8
    groups run along K so the concat is bit-exact per column."""
    gu = linear(x, wgu, layer_idx=layer_idx)
    i = gu.shape[-1] // 2
    return linear(silu_and_mul(gu[..., :i], gu[..., i:]), wd,
                  layer_idx=layer_idx)


def mlp_block_stacked(x: jax.Array, st, lp, li) -> jax.Array:
    """SiLU-gated MLP taking each weight from the out-of-xs stack dict
    ``st`` (full [L, ...] quant stacks, layer ``li`` selected in-kernel)
    when present, else from the scanned per-layer slice ``lp``. Weights can
    be MIXED: e.g. GLM-4.5-Air's dense-MLP down_proj (K=10944, group 128
    does not divide) stays an unquantized array in the xs while gate/up
    (or the fused wgu) are quant stacks."""

    def pick(name):
        if st is not None and name in st:
            return st[name], li
        return lp[name], None

    wd, lid = pick("down")
    if st is not None and "wgu" in st:
        gu = linear(x, st["wgu"], layer_idx=li)
        i = gu.shape[-1] // 2
        return linear(silu_and_mul(gu[..., :i], gu[..., i:]), wd,
                      layer_idx=lid)
    wg, lg = pick("gate")
    wu, lu = pick("up")
    return linear(
        silu_and_mul(linear(x, wg, layer_idx=lg),
                     linear(x, wu, layer_idx=lu)),
        wd, layer_idx=lid,
    )


def embed(token_ids: jax.Array, embedding, dtype=jnp.bfloat16,
          transposed: bool = False) -> jax.Array:
    """Token embedding gather. ``embedding`` is either a dense [V, H] table
    or (tied + QuantConfig.quantize_lm_head) a quant dict: the [H, V] LM
    head itself, or — preferred — its [V, H]-layout twin (``embed_t``,
    ``transposed=True``), whose row gather avoids a per-step relayout copy
    of the whole packed head (see quant_gather_rows_t)."""
    if isinstance(embedding, dict):
        from glm4_moe_nano_vllm_tpu.ops.quant_matmul import (
            quant_gather_rows,
            quant_gather_rows_t,
        )

        gather = quant_gather_rows_t if transposed else quant_gather_rows
        flat = gather(embedding, token_ids.reshape(-1), dtype)
        return flat.reshape(*token_ids.shape, flat.shape[-1])
    return jnp.take(embedding, token_ids, axis=0)


def compute_logits(
    hidden: jax.Array,  # [B, S, H]
    final_norm_w: jax.Array,
    lm_head: jax.Array,  # [H, V]
    last_q_idx: jax.Array,  # [B]
    eps: float,
) -> jax.Array:
    """Gather each sequence's last real token then project to the vocab.

    The gather-before-matmul mirrors the reference's prefill logits path
    (`embed_head.py:59-62`): only B rows hit the [H, V] matmul.
    """
    last = jnp.take_along_axis(hidden, last_q_idx[:, None, None], axis=1)[:, 0]
    last = rms_norm(last, final_norm_w, eps)
    if isinstance(lm_head, dict):  # quantized head (QuantConfig.quantize_lm_head)
        return linear(last, lm_head).astype(jnp.float32)
    return jnp.dot(last, lm_head, preferred_element_type=jnp.float32)


def init_linear(key, shape, dtype, scale=0.02):
    return (scale * jax.random.normal(key, shape, dtype=jnp.float32)).astype(dtype)


def init_weight(key, shape, dtype, quant=None):
    """Dense weight or (for quantized configs) a random quant dict with the
    same logical [..., K, M] shape — used for warmup/bench without a
    checkpoint."""
    if quant is None:
        return init_linear(key, shape, dtype)
    k, m = shape[-2], shape[-1]
    g = quant.group_size
    if k % g != 0 or m % 8 != 0:
        # group size does not divide the contraction dim (e.g. GLM-4.5-Air's
        # dense-MLP down_proj: I=10944, G=128): real AWQ checkpoints keep
        # such modules full-precision (`modules_to_not_convert`) — mirror
        # that with an unquantized weight
        return init_linear(key, shape, dtype)
    kg = shape[:-2] + (k // g, m)
    ks = jax.random.split(key, 2)
    def rand_u8(key, shp):
        # threefry materializes a uint32 counter per ELEMENT — generating a
        # multi-GB uint8 stack in one call costs 4x the output bytes in
        # transients and OOMs at Air-slice scale (and a u32→u8 bitcast's
        # trailing 4-lane dim tile-pads 32x). Chunk over the leading dim so
        # transients stay at chunk size.
        import numpy as np

        if int(np.prod(shp)) < (1 << 28) or len(shp) < 2:
            return jax.random.bits(key, shp, jnp.uint8)
        return jnp.stack([
            jax.random.bits(k, shp[1:], jnp.uint8)
            for k in jax.random.split(key, shp[0])
        ])

    if quant.method == "awq":
        packed = shape[:-2] + (k // 2, m)
        return {
            # row-packed uint8: two uint4 weights per byte (ops/quant.py)
            "qw": rand_u8(ks[0], packed),
            "zp": jnp.full(kg, 8, jnp.uint8),
            "scale": jnp.abs(init_linear(ks[1], kg, jnp.float32, 0.005)) + 1e-4,
        }
    assert quant.method == "int8"
    return {
        "qw": rand_u8(ks[0], shape).astype(jnp.int8),
        "scale": jnp.abs(init_linear(ks[1], kg, jnp.float32, 0.0003)) + 1e-5,
    }
