"""FP8 paged KV cache + engine metrics tests."""

import numpy as np

from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig
from glm4_moe_nano_vllm_tpu.engine.llm_engine import LLMEngine
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

TINY = ModelConfig(
    architecture="qwen3", vocab_size=128, hidden_size=64, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
    max_position_embeddings=2048, tie_word_embeddings=True, eos_token_id=0,
)


def make_engine(kv_dtype="float32", **kw):
    defaults = dict(
        model="", model_config=TINY, max_num_batched_tokens=512, max_num_seqs=8,
        max_model_len=128, kvcache_block_size=16, num_kvcache_blocks=64,
        prefill_chunk_size=64, enforce_eager=True, dtype="float32",
        kv_cache_dtype=kv_dtype, decode_buckets=(1, 2, 4),
        prefill_seq_buckets=(1, 2, 4), prefill_len_buckets=(16, 32, 64),
    )
    defaults.update(kw)
    return LLMEngine(**defaults)


def test_fp8_kv_cache_generates_and_tracks_fp32():
    import jax.numpy as jnp

    e8 = make_engine("float8_e4m3fn")
    assert e8.model_runner.caches["k"].dtype == jnp.float8_e4m3fn
    e32 = make_engine("float32")
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out8 = e8.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    out32 = e32.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    assert len(out8) == 8
    # fp8 KV is lossy; on this tiny random model at least the first tokens
    # should agree with fp32 (same argmax despite KV rounding)
    assert out8[0] == out32[0]


def test_metrics_summary():
    e = make_engine()
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    e.generate([[1, 2, 3], [4, 5, 6, 7]], sp, use_tqdm=False)
    s = e.metrics.summary()
    assert s["num_prefill_steps"] >= 1
    assert s["num_decode_steps"] >= 1  # multi-step windows batch decode steps
    assert s["prefill_tokens"] == 7
    assert s["decode_tokens"] >= 6
    assert s["ttft_p50_s"] > 0
    assert s["e2e_p50_s"] >= s["ttft_p50_s"]
    assert s["decode_tok_per_s"] > 0
