"""AWQ checkpoint loading end-to-end: a synthetic checkpoint in the real AWQ
tensor format (qweight/qzeros/scales int32 packing, HF names) must produce
the same logits as a dense checkpoint holding the dequantized weights.

This is the checkpoint-compatibility guarantee: real AWQ GLM checkpoints
(the reference's target, attention_new.py:206-232) load bit-exactly.
"""

import json
import os

import numpy as np
import pytest

from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig, QuantConfig
from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
from glm4_moe_nano_vllm_tpu.ops.quant import awq_dequantize, quantize_awq
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

H, I, V, NL, NH, NKV, D = 64, 128, 256, 2, 4, 2, 16
GROUP = 16
E, TOPK, IM = 4, 2, 32


def hf_config_dict(quant: bool):
    d = {
        "architectures": ["Glm4MoeForCausalLM"],
        "model_type": "glm4_moe",
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": NL, "num_attention_heads": NH,
        "num_key_value_heads": NKV, "head_dim": D,
        "max_position_embeddings": 1024, "rope_theta": 10000.0,
        "partial_rotary_factor": 0.5, "use_qk_norm": True,
        "attention_bias": False, "tie_word_embeddings": True,
        "rms_norm_eps": 1e-6, "eos_token_id": 0,
        "n_routed_experts": E, "num_experts_per_tok": TOPK,
        "moe_intermediate_size": IM, "n_shared_experts": 1,
        "first_k_dense_replace": 1, "routed_scaling_factor": 1.0,
        "norm_topk_prob": True, "n_group": 1, "topk_group": 1,
    }
    if quant:
        d["quantization_config"] = {
            "quant_method": "awq", "bits": 4, "group_size": GROUP,
            "zero_point": True,
        }
    return d


QUANT_SUFFIXES = (
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
    "mlp.shared_experts.gate_proj", "mlp.shared_experts.up_proj",
    "mlp.shared_experts.down_proj",
) + tuple(
    f"mlp.experts.{e}.{w}_proj" for e in range(E) for w in ("gate", "up", "down")
)


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    """Build matched (awq_dir, dense_dir): dense holds the dequantized floats."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    shapes = {
        "model.embed_tokens.weight": (V, H),
        "model.norm.weight": (H,),
    }
    for l in range(NL):
        p = f"model.layers.{l}."
        shapes[p + "input_layernorm.weight"] = (H,)
        shapes[p + "post_attention_layernorm.weight"] = (H,)
        shapes[p + "self_attn.q_norm.weight"] = (D,)
        shapes[p + "self_attn.k_norm.weight"] = (D,)
        shapes[p + "self_attn.q_proj.weight"] = (NH * D, H)
        shapes[p + "self_attn.k_proj.weight"] = (NKV * D, H)
        shapes[p + "self_attn.v_proj.weight"] = (NKV * D, H)
        shapes[p + "self_attn.o_proj.weight"] = (H, NH * D)
        if l == 0:  # dense layer
            shapes[p + "mlp.gate_proj.weight"] = (I, H)
            shapes[p + "mlp.up_proj.weight"] = (I, H)
            shapes[p + "mlp.down_proj.weight"] = (H, I)
        else:  # moe layer
            shapes[p + "mlp.gate.weight"] = (E, H)
            shapes[p + "mlp.gate.e_score_correction_bias"] = (E,)
            for e in range(E):
                shapes[p + f"mlp.experts.{e}.gate_proj.weight"] = (IM, H)
                shapes[p + f"mlp.experts.{e}.up_proj.weight"] = (IM, H)
                shapes[p + f"mlp.experts.{e}.down_proj.weight"] = (H, IM)
            shapes[p + "mlp.shared_experts.gate_proj.weight"] = (IM, H)
            shapes[p + "mlp.shared_experts.up_proj.weight"] = (IM, H)
            shapes[p + "mlp.shared_experts.down_proj.weight"] = (H, IM)

    floats = {k: (rng.normal(size=s) * 0.05).astype(np.float32) for k, s in shapes.items()}
    for k in ("model.norm.weight",):
        floats[k] = np.ones(shapes[k], np.float32)

    awq, dense = {}, {}
    for name, w in floats.items():
        base = name[: -len(".weight")] if name.endswith(".weight") else name
        layer_rel = base.split(".", 3)[-1] if base.startswith("model.layers.") else ""
        if any(layer_rel.endswith(sfx) for sfx in QUANT_SUFFIXES):
            wk = w.T  # [K=in, M=out]
            qweight, qzeros, scales = quantize_awq(wk, GROUP)
            awq[base + ".qweight"] = qweight
            awq[base + ".qzeros"] = qzeros
            awq[base + ".scales"] = scales.astype(np.float32)
            dense[name] = awq_dequantize(qweight, qzeros, scales).T.astype(np.float32)
        else:
            awq[name] = w
            dense[name] = w

    awq_dir = tmp_path_factory.mktemp("glm_awq")
    dense_dir = tmp_path_factory.mktemp("glm_dense")
    save_file(awq, os.path.join(awq_dir, "model.safetensors"))
    save_file(dense, os.path.join(dense_dir, "model.safetensors"))
    with open(os.path.join(awq_dir, "config.json"), "w") as f:
        json.dump(hf_config_dict(True), f)
    with open(os.path.join(dense_dir, "config.json"), "w") as f:
        json.dump(hf_config_dict(False), f)
    return str(awq_dir), str(dense_dir)


def greedy(path, prompts, n=6):
    cfg = Config(
        model=path, max_num_seqs=4, max_model_len=128, kvcache_block_size=16,
        num_kvcache_blocks=64, prefill_chunk_size=64, enforce_eager=True,
        dtype="float32", kv_cache_dtype="float32",
        decode_buckets=(1, 2, 4), prefill_seq_buckets=(1, 2, 4),
        prefill_len_buckets=(16, 32, 64),
    )
    runner, sched = ModelRunner(cfg), Scheduler(cfg)
    seqs = [Sequence(list(p), SamplingParams(temperature=0.0, max_tokens=n,
                                             ignore_eos=True)) for p in prompts]
    for s in seqs:
        sched.add(s)
    while not sched.is_finished():
        b = sched.schedule()
        sched.postprocess(b, runner.run(b))
    return [s.completion_token_ids for s in seqs]


def test_awq_checkpoint_matches_dense_dequant(checkpoints):
    awq_dir, dense_dir = checkpoints
    mc = ModelConfig.from_pretrained(awq_dir)
    assert mc.quant is not None and mc.quant.group_size == GROUP
    prompts = [[5, 9, 13, 27], [100, 42, 7, 8, 9, 10]]
    out_awq = greedy(awq_dir, prompts)
    out_dense = greedy(dense_dir, prompts)
    assert out_awq == out_dense
