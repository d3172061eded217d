"""Full GLM-4.5-Air AWQ checkpoint tensor-name manifest classification.

Zero-egress stands in for loading the real checkpoint: the complete tensor
name list of a GLM-4.5-Air AWQ export is reconstructed from the HF GLM-4.5
architecture (Glm4MoeForCausalLM: 46 decoder layers with
first_k_dense_replace=1, 128 routed + 1 shared expert, qk-norm, attention
bias, one ``nextn``/MTP extra layer — the structure the reference's loaders
scan, `/root/reference/nanovllm/models/glm4_moe/attention_new.py:114-279`,
`moe.py:79-92`) and every name must classify as routed or
explicitly-documented-skip — no silent unrouted names
(utils/loader.py::classify_checkpoint_names).
"""

import json
import os

import pytest

from glm4_moe_nano_vllm_tpu.config import ModelConfig, QuantConfig
from glm4_moe_nano_vllm_tpu.utils.loader import classify_checkpoint_names


def air_config() -> ModelConfig:
    cfg_path = os.path.join(os.path.dirname(__file__), "..",
                            "configs", "glm45_air.json")
    with open(cfg_path) as f:
        raw = json.load(f)
    mc = ModelConfig.from_hf_dict(raw)
    mc.quant = QuantConfig(method="awq", bits=4, group_size=128)
    return mc


def glm45_air_awq_manifest(num_layers: int = 46, num_experts: int = 128,
                           mtp_layers: int = 1) -> list[str]:
    """Every tensor name in a GLM-4.5-Air AWQ safetensors export.

    Quantized linears carry .qweight/.qzeros/.scales (AWQ int32 packing);
    norms / router / embeddings / lm_head stay full precision; the MTP
    block is one extra full decoder layer at index ``num_layers`` plus its
    enorm/hnorm/eh_proj/shared_head companions (DeepSeek-V3-style nextn,
    ``num_nextn_predict_layers=1`` in the GLM-4.5 config).
    """
    names = [
        "model.embed_tokens.weight",
        "model.norm.weight",
        "lm_head.weight",
    ]
    q = ("qweight", "qzeros", "scales")

    def linear(prefix, bias=False):
        out = [f"{prefix}.{leaf}" for leaf in q]
        if bias:
            out.append(f"{prefix}.bias")
        return out

    for layer in range(num_layers + mtp_layers):
        p = f"model.layers.{layer}"
        names += [
            f"{p}.input_layernorm.weight",
            f"{p}.post_attention_layernorm.weight",
            f"{p}.self_attn.q_norm.weight",
            f"{p}.self_attn.k_norm.weight",
        ]
        names += linear(f"{p}.self_attn.q_proj", bias=True)
        names += linear(f"{p}.self_attn.k_proj", bias=True)
        names += linear(f"{p}.self_attn.v_proj", bias=True)
        names += linear(f"{p}.self_attn.o_proj")
        if layer == 0:  # first_k_dense_replace=1: dense MLP
            for proj in ("gate_proj", "up_proj", "down_proj"):
                names += linear(f"{p}.mlp.{proj}")
        else:
            names += [
                f"{p}.mlp.gate.weight",
                f"{p}.mlp.gate.e_score_correction_bias",
            ]
            for e in range(num_experts):
                for proj in ("gate_proj", "up_proj", "down_proj"):
                    names += linear(f"{p}.mlp.experts.{e}.{proj}")
            for proj in ("gate_proj", "up_proj", "down_proj"):
                names += linear(f"{p}.mlp.shared_experts.{proj}")
        if layer >= num_layers:  # the MTP/nextn block's companions
            names += [
                f"{p}.embed_tokens.weight",
                f"{p}.enorm.weight",
                f"{p}.hnorm.weight",
                f"{p}.eh_proj.weight",
                f"{p}.shared_head.norm.weight",
                f"{p}.shared_head.head.weight",
            ]
    return names


def test_air_manifest_fully_classified():
    cfg = air_config()
    assert cfg.num_layers == 46 and cfg.n_routed_experts == 128
    names = glm45_air_awq_manifest(cfg.num_layers, cfg.n_routed_experts)
    # GLM-4.5-Air AWQ ~= 3 + 46.33 layers of tensors; sanity on the size
    assert len(names) > 46 * (4 + 13) + 45 * 128 * 9

    cls = classify_checkpoint_names(names, cfg)
    unrouted = sorted(n for n, v in cls.items() if v == "unrouted")
    assert unrouted == [], f"silent-unrouted names: {unrouted[:20]}"

    skipped = {n: v for n, v in cls.items() if v.startswith("skipped:")}
    # only the MTP block and derived caches may be skipped
    assert all(("mtp" in v) or ("rope-cache" in v) for v in skipped.values())
    # ... and every layer-46 tensor IS skipped (not silently mis-routed
    # into a real layer slot)
    for n in names:
        if n.startswith("model.layers.46."):
            assert cls[n].startswith("skipped:"), n

    routed = sum(v == "routed" for v in cls.values())
    assert routed == len(names) - len(skipped)


def test_rope_cache_and_unknown_names():
    cfg = air_config()
    cls = classify_checkpoint_names(
        ["model.layers.3.self_attn.rotary_emb.inv_freq",
         "model.layers.3.self_attn.unknown_thing.weight",
         "totally.unknown.tensor"],
        cfg,
    )
    assert cls["model.layers.3.self_attn.rotary_emb.inv_freq"] == \
        "skipped:rope-cache"
    assert cls["model.layers.3.self_attn.unknown_thing.weight"] == "unrouted"
    assert cls["totally.unknown.tensor"] == "unrouted"


def test_loader_raises_on_unrouted(tmp_path, monkeypatch):
    """report_unrouted fails loudly unless NVT_LOADER_LAX is set."""
    from glm4_moe_nano_vllm_tpu.utils.loader import report_unrouted

    with pytest.raises(ValueError, match="unrouted"):
        report_unrouted(["bogus.tensor"], "test")
    monkeypatch.setenv("NVT_LOADER_LAX", "1")
    report_unrouted(["bogus.tensor"], "test")  # warns only
