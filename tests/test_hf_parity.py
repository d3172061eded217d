"""Golden parity vs HuggingFace transformers (the trusted implementation).

This is the hermetic version of the reference's golden-tensor tests
(`/root/reference/nanovllm/tests/*.py`, which need a local GLM-4.5-Air
checkpoint and tensors dumped from an instrumented vLLM run): a tiny
random-weight HF model is saved to disk, loaded through our safetensors
loader, and compared end-to-end — last-token logits (fp32, tight tolerance)
and multi-step greedy decode token equality.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from glm4_moe_nano_vllm_tpu.config import Config
from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

PROMPTS = [[11, 42, 7, 99, 23, 5], [3, 14, 15, 92, 65, 35, 89, 79, 32]]
N_STEPS = 8


def make_stack(path):
    cfg = Config(
        model=str(path),
        max_num_batched_tokens=512,
        max_num_seqs=4,
        max_model_len=256,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        prefill_chunk_size=64,
        enforce_eager=True,
        dtype="float32",
        kv_cache_dtype="float32",
        decode_buckets=(1, 2, 4),
        prefill_seq_buckets=(1, 2, 4),
        prefill_len_buckets=(16, 32, 64),
    )
    return ModelRunner(cfg), Scheduler(cfg)


def run_ours(path, prompts, n_steps):
    """Greedy-decode n_steps tokens; also return the first-step logits."""
    runner, sched = make_stack(path)
    seqs = [
        Sequence(list(p), SamplingParams(temperature=0.0, max_tokens=n_steps,
                                         ignore_eos=True))
        for p in prompts
    ]
    for s in seqs:
        sched.add(s)
    first_logits = None
    while not sched.is_finished():
        batch = sched.schedule()
        info = runner.prepare(batch)
        if first_logits is None and batch.is_prefill:
            logits, _ = runner.model.forward(runner.params, runner.caches, info)
            first_logits = np.asarray(logits)[: len(batch.seqs)]
        tokens = runner.run(batch)
        sched.postprocess(batch, tokens)
    return [s.completion_token_ids for s in seqs], first_logits


def run_hf(model, prompts, n_steps):
    import torch

    outs, logits = [], []
    with torch.no_grad():
        for p in prompts:
            ids = torch.tensor([p])
            out = model.generate(
                ids, max_new_tokens=n_steps, do_sample=False,
                pad_token_id=0, use_cache=True,
            )
            outs.append(out[0, len(p):].tolist())
            logits.append(model(ids).logits[0, -1].float().numpy())
    return outs, np.stack(logits)


@pytest.fixture(scope="module")
def qwen3_ckpt(tmp_path_factory):
    import torch
    from transformers.models.qwen3 import Qwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=1024, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype="float32",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("qwen3_tiny")
    model.save_pretrained(path)
    return path, model


@pytest.fixture(scope="module")
def glm4_moe_ckpt(tmp_path_factory):
    import torch
    from transformers.models.glm4_moe import Glm4MoeConfig
    from transformers.models.glm4_moe.modeling_glm4_moe import (
        Glm4MoeForCausalLM,
    )

    torch.manual_seed(0)
    cfg = Glm4MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=1024, rope_theta=10000.0,
        partial_rotary_factor=0.5, use_qk_norm=True, attention_bias=True,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, routed_scaling_factor=1.5,
        norm_topk_prob=True, n_group=1, topk_group=1,
        tie_word_embeddings=False, torch_dtype="float32",
    )
    model = Glm4MoeForCausalLM(cfg).eval()
    # give the correction bias some structure so selection semantics matter
    with torch.no_grad():
        for layer in model.model.layers[cfg.first_k_dense_replace:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    path = tmp_path_factory.mktemp("glm4_moe_tiny")
    model.save_pretrained(path)
    return path, model


def test_qwen3_parity(qwen3_ckpt):
    path, hf = qwen3_ckpt
    ours, our_logits = run_ours(path, PROMPTS, N_STEPS)
    theirs, hf_logits = run_hf(hf, PROMPTS, N_STEPS)
    np.testing.assert_allclose(our_logits, hf_logits, rtol=2e-4, atol=2e-4)
    assert ours == theirs


def test_glm4_moe_parity(glm4_moe_ckpt):
    path, hf = glm4_moe_ckpt
    ours, our_logits = run_ours(path, PROMPTS, N_STEPS)
    theirs, hf_logits = run_hf(hf, PROMPTS, N_STEPS)
    np.testing.assert_allclose(our_logits, hf_logits, rtol=2e-4, atol=2e-4)
    assert ours == theirs
