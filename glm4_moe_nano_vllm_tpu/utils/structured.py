"""Trained-like synthetic weights + in-memory quantization for PPL gates.

Real checkpoints are not downloadable here (zero egress), and i.i.d. Gaussian
weights make quantization-error gates nearly meaningless: every group has the
same dynamic range (group quantization's best case) and the resulting logit
distribution is near-uniform (so ΔPPL barely moves). This module makes the
synthetic weights *hard* for weight-only quantization in the ways trained
LLM weights are — the exact statistics that motivated AWQ
(per-channel scale spread + a small set of large-magnitude outlier channels):

  * per-output-channel log-normal scale modulation (σ = 0.6);
  * ~0.5% outlier channels scaled ×12;
  * per-group input-direction modulation so quant groups see varied ranges;
  * residual-branch output scaling ~1/sqrt(2·depth) on wo/down projections
    (the GPT-2 init rule trained residual networks obey) — deep RANDOM
    networks otherwise amplify parameter perturbations exponentially
    through the residual stream, so at 10+ layers ΔPPL measured synthetic
    chaos instead of kernel quantization error (round-2 at-scale gate:
    INT4 Δ+4080 from ~0.2% per-weight error). Uniform scaling preserves
    each quant group's RELATIVE dynamic range, so the AWQ-hard channel
    statistics above are untouched.

``quantize_params`` then produces the INT4/INT8 variants from the SAME bf16
tree (matching what the loader's on-the-fly quantization does for float
checkpoints, utils/loader_quant.py), so ΔPPL isolates quantization error.
"""

from __future__ import annotations

import jax
import numpy as np

from glm4_moe_nano_vllm_tpu.ops.quant import (
    awq_unpack_cols,
    pack_rows_u8,
    quantize_awq,
    quantize_int8,
)

# parameter leaves that are linear weights ([..., K, M], quantizable)
_LINEAR_LEAVES = {
    "wq", "wk", "wv", "wo", "gate", "up", "down",
    "expert_gate", "expert_up", "expert_down",
    "shared_gate", "shared_up", "shared_down", "lm_head",
}


def _leaf_name(path) -> str:
    return path[-1].key if hasattr(path[-1], "key") else str(path[-1])


# residual-stream output projections (the branch outputs that add into x)
_RESIDUAL_OUT_LEAVES = {"wo", "down", "expert_down", "shared_down"}


def structure_params(params, seed: int = 0, outlier_frac: float = 0.005,
                     outlier_scale: float = 12.0, sigma: float = 0.6,
                     num_layers: int | None = None):
    """Apply trained-like scale statistics to every linear weight leaf.

    ``num_layers``: total decoder depth; when given, residual-branch output
    projections are scaled by 1/sqrt(2*num_layers) so perturbation growth
    through the residual stream matches trained networks instead of
    compounding exponentially (see module docstring)."""
    rng = np.random.default_rng(seed)
    res_scale = (1.0 / np.sqrt(2.0 * num_layers)) if num_layers else 1.0

    def mod(name, leaf):
        k, m = leaf.shape[-2], leaf.shape[-1]
        col = rng.lognormal(0.0, sigma, size=m).astype(np.float32)
        out = rng.random(m) < outlier_frac
        col[out] *= outlier_scale
        row = rng.lognormal(0.0, sigma / 2, size=k).astype(np.float32)
        if name in _RESIDUAL_OUT_LEAVES:
            row *= res_scale
        # device-side multiply in the leaf dtype: only the tiny modulation
        # vectors cross the host boundary (pulling multi-GB stacks to
        # numpy and back took ~30 min over the remote-chip tunnel, and an
        # f32 upcast of the biggest stacks spikes HBM past the chip)
        w = leaf * jax.numpy.asarray(col, leaf.dtype)
        return w * jax.numpy.asarray(row, leaf.dtype)[:, None]

    def walk(node):
        # mutate dicts in place so the old leaf is freed as soon as it is
        # replaced (a tree_map holds old + new trees concurrently — 2x the
        # model in HBM), and block per leaf so async dispatch can't keep
        # every intermediate alive at once
        for key, v in list(node.items()):
            if isinstance(v, dict):
                if key in _LINEAR_LEAVES:  # quant dict: leave as-is
                    continue
                walk(v)
            elif key in _LINEAR_LEAVES:
                node[key] = jax.block_until_ready(mod(key, v))
        return node

    assert isinstance(params, dict)
    return walk(params)


def quantize_params(model_q, params_fp):
    """Quantize a full-precision param tree into ``model_q``'s (quantized)
    parameter structure. Leaves that are quant dicts in the target get
    group-quantized from the same source values; everything else is copied."""
    shapes = jax.eval_shape(model_q.init_params, jax.random.PRNGKey(0))

    def is_qdict(x):
        return isinstance(x, dict) and "qw" in x

    def fill(path, target):
        src = params_fp
        for p in path:
            src = src[p.key if hasattr(p, "key") else p]
        if not is_qdict(target):
            return jax.numpy.asarray(np.asarray(src), target.dtype)
        w = np.asarray(src, np.float32)
        lead = w.shape[:-2]
        k, m = w.shape[-2], w.shape[-1]
        kg = target["scale"].shape[-2]
        group = k // kg
        w2 = w.reshape(-1, k, m)
        int4 = "zp" in target
        qws, zps, scales = [], [], []
        for i in range(w2.shape[0]):
            if int4:
                qweight, qzeros, sc = quantize_awq(w2[i], group)
                qws.append(pack_rows_u8(awq_unpack_cols(qweight), group))
                zps.append(awq_unpack_cols(qzeros))
                scales.append(sc.astype(np.float32))
            else:
                qw, sc = quantize_int8(w2[i], group)
                qws.append(qw)
                scales.append(sc.astype(np.float32))
        out = {
            "qw": jax.numpy.asarray(
                np.stack(qws).reshape(*lead, *qws[0].shape)),
            "scale": jax.numpy.asarray(
                np.stack(scales).reshape(*lead, *scales[0].shape)),
        }
        if int4:
            out["zp"] = jax.numpy.asarray(
                np.stack(zps).reshape(*lead, *zps[0].shape))
        return out

    # walk the target structure; quant dicts are treated as leaves
    def walk(path, node):
        if isinstance(node, dict) and not is_qdict(node):
            return {
                k: walk(path + (jax.tree_util.DictKey(k),), v)
                for k, v in node.items()
            }
        return fill(path, node)

    return walk((), shapes)
