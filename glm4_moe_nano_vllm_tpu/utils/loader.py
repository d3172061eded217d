"""Checkpoint loading: HF sharded safetensors → stacked JAX param trees.

Replaces both reference loaders — the generic ``packed_modules_mapping`` route
(`/root/reference/nanovllm/utils/loader.py:12-28`) and GLM's bespoke
per-module shard rescans (`glm4_moe/model.py:26-61`, ``moe.py:79-92`` which
re-reads every shard once per layer, O(files × modules)). Here every shard
file is read exactly once; each tensor is routed by name into its slot in the
stacked layer arrays (layer index becomes the leading-axis index).

Transforms: HF ``nn.Linear`` weights are [out, in] and are transposed to our
[in, out] kernel layout at load; expert weights stack to [E, in, out].
"""

from __future__ import annotations

import logging
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def iter_safetensors(path: str):
    """Yield (name, numpy_array) over all *.safetensors in a checkpoint dir."""
    from safetensors import safe_open

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".safetensors")
    )
    assert files, f"no safetensors found in {path}"
    for file in files:
        try:
            with safe_open(file, framework="np") as f:
                for name in f.keys():
                    yield name, f.get_tensor(name)
        except (TypeError, ValueError):
            # bf16 unsupported by this numpy backend: go through torch
            import torch
            from safetensors import safe_open as so

            import ml_dtypes

            with so(file, framework="pt") as f:
                for name in f.keys():
                    t = f.get_tensor(name)
                    if t.dtype == torch.bfloat16:
                        yield name, t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
                    else:
                        yield name, t.numpy()


def _cast(x: np.ndarray, dtype) -> np.ndarray:
    return np.asarray(x).astype(dtype) if x.dtype != dtype else np.asarray(x)


class _TreeFiller:
    """Mutable numpy staging buffers shaped like the model's param tree."""

    def __init__(self, model):
        shapes = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
        self.bufs = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
        self.filled: set[tuple] = set()

    def put(self, path: tuple, value: np.ndarray, layer: int | None = None,
            sub: int | None = None):
        node = self.bufs
        for p in path[:-1]:
            node = node[p]
        buf = node[path[-1]]
        target = buf
        if layer is not None:
            target = target[layer]
        if sub is not None:
            target = target[sub]
        assert target.shape == value.shape, (
            f"{path} layer={layer} sub={sub}: {target.shape} vs {value.shape}"
        )
        target[...] = _cast(value, target.dtype)
        self.filled.add((path, layer, sub))

    def finalize(self, mesh=None, shardings=None):
        if mesh is not None and shardings is None:
            from jax.sharding import NamedSharding

            from glm4_moe_nano_vllm_tpu.parallel.sharding import param_specs

            shardings = jax.tree_util.tree_map(
                lambda b, s: NamedSharding(mesh, s), self.bufs, param_specs(self.bufs)
            )
        if shardings is not None:
            return jax.tree.map(
                lambda b, s: jax.device_put(b, s), self.bufs, shardings
            )
        return jax.tree.map(jnp.asarray, self.bufs)


_LAYER_RE = re.compile(r"^model\.layers\.(\d+)\.(.+)$")

# suffix → (param key, transpose?)
_ATTN_MAP = {
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "self_attn.q_proj.bias": ("bq", False),
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.bias": ("bv", False),
    "self_attn.q_norm.weight": ("q_norm", False),
    "self_attn.k_norm.weight": ("k_norm", False),
    "input_layernorm.weight": ("input_norm", False),
    "post_attention_layernorm.weight": ("post_norm", False),
}
_MLP_MAP = {
    "mlp.gate_proj.weight": ("gate", True),
    "mlp.up_proj.weight": ("up", True),
    "mlp.down_proj.weight": ("down", True),
}


def _tied_quant_head(cfg) -> bool:
    """Tied embeddings + quantize_lm_head: the [H, V] quant dict under
    "lm_head" is the only embedding/head parameter (models/common.py embed
    gathers its columns)."""
    return (cfg.tie_word_embeddings and cfg.quant is not None
            and cfg.quant.quantize_lm_head)


def _route_qwen3(filler: _TreeFiller, name: str, tensor: np.ndarray, cfg) -> bool:
    if name == "model.embed_tokens.weight":
        if _tied_quant_head(cfg):
            filler.put(("lm_head",), tensor.T)  # quantized on the fly
        else:
            filler.put(("embed",), tensor)
        return True
    if name == "model.norm.weight":
        filler.put(("final_norm",), tensor)
        return True
    if name == "lm_head.weight":
        if not cfg.tie_word_embeddings:
            filler.put(("lm_head",), tensor.T)
        return True
    m = _LAYER_RE.match(name)
    if not m:
        return False
    layer, suffix = int(m.group(1)), m.group(2)
    for table in (_ATTN_MAP, _MLP_MAP):
        if suffix in table:
            key, transpose = table[suffix]
            filler.put(("layers", key), tensor.T if transpose else tensor, layer)
            return True
    return False


_EXPERT_RE = re.compile(r"^mlp\.experts\.(\d+)\.(gate|up|down)_proj\.weight$")
_SHARED_RE = re.compile(r"^mlp\.shared_experts\.(gate|up|down)_proj\.weight$")


def _route_glm4_moe(filler: _TreeFiller, name: str, tensor: np.ndarray, cfg) -> bool:
    if name == "model.embed_tokens.weight":
        if _tied_quant_head(cfg):
            filler.put(("lm_head",), tensor.T)  # quantized on the fly
        else:
            filler.put(("embed",), tensor)
        return True
    if name == "model.norm.weight":
        filler.put(("final_norm",), tensor)
        return True
    if name == "lm_head.weight":
        if not cfg.tie_word_embeddings:
            filler.put(("lm_head",), tensor.T)
        return True
    m = _LAYER_RE.match(name)
    if not m:
        return False
    layer, suffix = int(m.group(1)), m.group(2)
    k = cfg.first_k_dense_replace
    group = "dense_layers" if layer < k else "moe_layers"
    lidx = layer if layer < k else layer - k

    if suffix in _ATTN_MAP:
        key, transpose = _ATTN_MAP[suffix]
        filler.put((group, key), tensor.T if transpose else tensor, lidx)
        return True
    if layer < k:
        if suffix in _MLP_MAP:
            key, transpose = _MLP_MAP[suffix]
            filler.put((group, key), tensor.T if transpose else tensor, lidx)
            return True
        return False
    # MoE-layer specifics
    if suffix == "mlp.gate.weight":
        filler.put(("moe_layers", "router_w"), tensor, lidx)  # [E, H] kept as-is
        return True
    if suffix == "mlp.gate.e_score_correction_bias":
        filler.put(("moe_layers", "router_bias"), tensor, lidx)
        return True
    em = _EXPERT_RE.match(suffix)
    if em:
        expert, which = int(em.group(1)), em.group(2)
        filler.put(("moe_layers", f"expert_{which}"), tensor.T, lidx, expert)
        return True
    sm = _SHARED_RE.match(suffix)
    if sm:
        filler.put(("moe_layers", f"shared_{sm.group(1)}"), tensor.T, lidx)
        return True
    return False


_ROUTERS = {"qwen3": _route_qwen3, "glm4_moe": _route_glm4_moe}


def skip_reason(name: str, cfg) -> str | None:
    """Documented reasons a checkpoint tensor is intentionally NOT loaded.

    GLM-4.5 checkpoints carry tensors this engine (like the reference,
    which debug-loads 2 layers and has no MTP either,
    `/root/reference/nanovllm/models/glm4_moe/model.py:20-22`) does not
    consume:
      * the MTP / ``nextn`` speculative-decoding block: one extra decoder
        layer at index >= num_hidden_layers (``num_nextn_predict_layers``)
        plus its enorm/hnorm/eh_proj/shared_head companions;
      * persisted rotary inv_freq caches (derived, recomputed here).
    Anything else unrouted is an error (see load_params).
    """
    if name.endswith("rotary_emb.inv_freq"):
        return "rope-cache"
    m = _LAYER_RE.match(name)
    if m and int(m.group(1)) >= cfg.num_layers:
        return "mtp-nextn-layer"
    if any(part in name for part in
           (".eh_proj.", ".enorm.", ".hnorm.", ".shared_head.")):
        return "mtp-nextn-head"
    return None


class _DryFiller:
    """Filler stand-in that records routing without touching buffers
    (manifest classification: no tensor data, no shape checks)."""

    def put(self, path, value, layer=None, sub=None):
        pass


_QUANT_LEAVES = ("qweight", "qzeros", "scales")


def classify_checkpoint_names(names, cfg) -> dict[str, str]:
    """Map every checkpoint tensor name to 'routed' | 'skipped:<reason>' |
    'unrouted' without reading any tensor data.

    This is the loader's full-manifest contract: a real GLM-4.5-Air AWQ
    checkpoint must classify with zero 'unrouted' entries
    (tests/test_checkpoint_manifest.py pins the complete name list).
    """
    route = _ROUTERS[cfg.architecture]
    dry = _DryFiller()
    out: dict[str, str] = {}
    for name in names:
        reason = skip_reason(name, cfg)
        if reason is not None:
            out[name] = f"skipped:{reason}"
            continue
        leaf = name.rsplit(".", 1)[-1]
        probe = name
        if leaf in _QUANT_LEAVES:
            probe = name[: -len(leaf) - 1] + ".weight"
        dummy = np.zeros((), np.float32)  # routers may .T it; put() ignores
        out[name] = "routed" if route(dry, probe, dummy, cfg) else "unrouted"
    return out


def report_unrouted(unrouted: list[str], where: str) -> None:
    """Unrouted tensors are a loader bug or an unknown checkpoint variant:
    fail loudly (NVT_LOADER_LAX=1 downgrades to a warning)."""
    if not unrouted:
        return
    msg = (f"{len(unrouted)} unrouted checkpoint tensors in {where} "
           f"(first 20): {unrouted[:20]}")
    if os.environ.get("NVT_LOADER_LAX"):
        logger.warning(msg)
    else:
        raise ValueError(
            msg + " — set NVT_LOADER_LAX=1 to load anyway (tensors will "
            "be ignored)"
        )


def load_params(model, path: str, mesh=None, shardings=None):
    cfg = model.cfg
    if cfg.quant is not None:
        from glm4_moe_nano_vllm_tpu.utils.loader_quant import load_params_quant

        return load_params_quant(model, path, mesh=mesh, shardings=shardings)
    filler = _TreeFiller(model)
    route = _ROUTERS[cfg.architecture]
    unrouted = []
    for name, tensor in iter_safetensors(path):
        reason = skip_reason(name, cfg)
        if reason is not None:
            logger.debug("skipping %s (%s)", name, reason)
            continue
        if not route(filler, name, tensor, cfg):
            unrouted.append(name)
    report_unrouted(unrouted, path)
    return filler.finalize(mesh=mesh, shardings=shardings)
