"""Quantized checkpoint loading.

Two routes into the TPU-native quant storage ({qw, zp, scale}, ops/quant.py):

1. **AWQ checkpoints** (the reference's target format,
   `/root/reference/nanovllm/models/glm4_moe/attention_new.py:206-232`):
   tensors named ``*.qweight`` [K, M/8] int32 / ``*.qzeros`` [K/G, M/8] int32
   / ``*.scales`` [K/G, M] fp16 are unpacked from the AWQ nibble order and
   repacked to uint4 at load.
2. **Float checkpoints quantized on the fly** when the engine config requests
   quantization (e.g. Qwen3 INT8 without a pre-quantized checkpoint — a
   capability the reference lacks).

Reuses the dense loader's name-routing tables; a filler subclass redirects
each routed tensor into the right leaf of the quant dict.
"""

from __future__ import annotations

import logging

import ml_dtypes
import numpy as np

from glm4_moe_nano_vllm_tpu.ops.quant import (
    awq_unpack_cols,
    pack_rows_u8,
    quantize_awq,
    quantize_int8,
    repack_awq_for_tpu,
)
from glm4_moe_nano_vllm_tpu.utils.loader import (
    _ROUTERS,
    _TreeFiller,
    iter_safetensors,
    report_unrouted,
    skip_reason,
)

logger = logging.getLogger(__name__)

_QUANT_LEAF = {"qweight": "qw", "qzeros": "zp", "scales": "scale"}


class _QuantFiller(_TreeFiller):
    def __init__(self, model):
        super().__init__(model)
        self.quant = model.cfg.quant
        self._leaf: str | None = None  # set while routing a quant tensor

    def put(self, path, value, layer=None, sub=None):
        node = self.bufs
        for p in path:
            node = node[p]
        if self._leaf is not None:
            # pre-transposed before routing so the router's .T restored the
            # checkpoint's native [K, ...] orientation
            assert isinstance(node, dict), f"{path} is not quantized"
            super().put(path + (self._leaf,), value, layer, sub)
        elif isinstance(node, dict):
            # float tensor routed into a quantized slot: quantize on the fly
            w = np.asarray(value, np.float32)
            if self.quant.method == "awq":
                qweight, qzeros, scales = quantize_awq(w, self.quant.group_size)
                qw, zp, scale = repack_awq_for_tpu(qweight, qzeros, scales)
                super().put(path + ("qw",), qw, layer, sub)
                super().put(path + ("zp",), zp, layer, sub)
                super().put(path + ("scale",), scale, layer, sub)
            else:
                qw, scale = quantize_int8(w, self.quant.group_size)
                super().put(path + ("qw",), qw, layer, sub)
                super().put(path + ("scale",), scale.astype(np.float32), layer, sub)
        else:
            super().put(path, value, layer, sub)


def load_params_quant(model, path: str, mesh=None, shardings=None):
    cfg = model.cfg
    filler = _QuantFiller(model)
    route = _ROUTERS[cfg.architecture]
    unrouted = []
    for name, tensor in iter_safetensors(path):
        reason = skip_reason(name, cfg)
        if reason is not None:
            logger.debug("skipping %s (%s)", name, reason)
            continue
        leaf = name.rsplit(".", 1)[-1]
        if leaf in _QUANT_LEAF:
            base = name[: -len(leaf) - 1] + ".weight"
            if leaf == "qweight":
                # [K, M/8] int32 → [K/2, M] row-packed uint8
                value = pack_rows_u8(awq_unpack_cols(np.asarray(tensor)),
                                     cfg.quant.group_size)
            elif leaf == "qzeros":
                value = awq_unpack_cols(np.asarray(tensor))  # [K/G, M] u8
            else:
                value = np.asarray(tensor, np.float32)  # [K/G, M]
            filler._leaf = _QUANT_LEAF[leaf]
            # routers transpose nn.Linear weights; pre-transpose to cancel
            ok = route(filler, base, value.T, cfg)
            filler._leaf = None
        else:
            ok = route(filler, name, np.asarray(tensor), cfg)
        if not ok:
            unrouted.append(name)
    report_unrouted(unrouted, path)
    if isinstance(filler.bufs, dict) and "embed_t" in filler.bufs:
        # the [V, K]-layout embedding twin is derived, not loaded: one
        # transpose of the quantized head (ops/quant_matmul.py
        # quant_gather_rows_t)
        for leaf, v in filler.bufs["lm_head"].items():
            filler.bufs["embed_t"][leaf][...] = np.ascontiguousarray(v.T)
    return filler.finalize(mesh=mesh, shardings=shardings)
