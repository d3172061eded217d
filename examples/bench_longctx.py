"""Long-context datapoint: 32K-token prompts at production scale.

GLM-Air-mini 7.6B AWQ INT4 (the bench_prod model) with max_model_len 32768:
chunked prefill (8192-token chunks) over two 32 000-token prompts, then a
short decode. The reference cannot run this workload at all — it has no
chunked prefill and defaults to max_model_len 4096 (`config.py:11`,
SURVEY §5 "long-context: absent").

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_longctx.py
Env: LC_NUM_SEQS (default 2), LC_PROMPT (default 32000), LC_OUT (default 64),
     LC_KV (bfloat16 | int8 | float8_e4m3fn), LC_MIXED=1 (capacity demo:
     LC_NUM_SEQS prompts with mixed lengths 8K..LC_PROMPT — the workload the
     halved-KV cache dtypes exist for; KV bytes are reported).
"""

import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from glm4_moe_nano_vllm_tpu import LLM, SamplingParams
    from glm4_moe_nano_vllm_tpu.config import ModelConfig, QuantConfig

    mc = ModelConfig(
        architecture="glm4_moe",
        vocab_size=65536,
        hidden_size=2048,
        num_layers=20,
        num_heads=16,
        num_kv_heads=8,
        head_dim=128,
        intermediate_size=4096,
        max_position_embeddings=32768,
        partial_rotary_factor=0.5,
        use_qk_norm=True,
        attention_bias=True,
        tie_word_embeddings=True,
        eos_token_id=2,
        n_routed_experts=64,
        num_experts_per_tok=8,
        moe_intermediate_size=1024,
        n_shared_experts=1,
        first_k_dense_replace=1,
        routed_scaling_factor=1.5,
        quant=QuantConfig(method="awq", bits=4, group_size=128,
                          quantize_lm_head=True),
    )
    n = int(os.environ.get("LC_NUM_SEQS", 2))
    plen = int(os.environ.get("LC_PROMPT", 32000))
    out = int(os.environ.get("LC_OUT", 64))
    mixed = os.environ.get("LC_MIXED", "0") == "1"
    rng = np.random.default_rng(0)
    if mixed:
        lens = sorted(int(x) for x in
                      rng.integers(8192, plen + 1, size=n))
    else:
        lens = [plen] * n
    blocks = sum((ln + out + 255) // 256 + 2 for ln in lens) // n + 1

    llm = LLM(
        model="",
        model_config=mc,
        max_num_seqs=n,
        max_num_batched_tokens=int(os.environ.get("LC_MBT", "16384")),
        max_model_len=32768,
        kvcache_block_size=256,
        num_kvcache_blocks=n * blocks,
        prefill_chunk_size=int(os.environ.get("LC_CHUNK", "8192")),
        enforce_eager=True,
        decode_buckets=(n,),
        prefill_seq_buckets=(1, n),
        prefill_len_buckets=(2048, 8192),
        dtype="bfloat16",
        kv_cache_dtype=os.environ.get("LC_KV", "bfloat16"),
        num_scheduler_steps=int(os.environ.get("LC_STEPS", "16")),
    )

    prompts = [rng.integers(4, 60000, size=ln).tolist() for ln in lens]
    sp = [SamplingParams(temperature=0.6, max_tokens=out, ignore_eos=True)
          for _ in range(n)]

    # warmup compiles the chunk ladder (same shapes the timed run uses —
    # different prompts so nothing prefix-cache-hits in the timed run)
    warm = [rng.integers(4, 60000, size=ln).tolist() for ln in lens]
    llm.generate(warm, [SamplingParams(temperature=0.6, max_tokens=4,
                                       ignore_eos=True)] * n, use_tqdm=False)
    llm.metrics.reset()

    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp, use_tqdm=False)
    elapsed = time.perf_counter() - t0
    total_out = sum(len(o["token_ids"]) for o in outs)
    m = {k: round(v, 2) if isinstance(v, float) else v
         for k, v in llm.metrics.summary().items()}
    import jax as _jax

    def _kv_bytes(c):
        return sum(x.nbytes for x in _jax.tree.leaves(c))

    kvb = _kv_bytes(llm.model_runner.caches)
    print(f"longctx[{lens if mixed else f'{plen} tok x {n}'}]: {total_out} "
          f"tokens in {elapsed:.1f}s, metrics={m}", file=sys.stderr)
    import json
    print(json.dumps({
        "num_seqs": n, "prompt_tokens": sum(lens),
        "kv_cache_dtype": llm.config.kv_cache_dtype,
        "kv_cache_bytes_mib": kvb >> 20,
        "prefill_tok_s": m["prefill_tok_per_s"],
        "ttft_p50_s": m["ttft_p50_s"],
        "decode_tok_s": m["decode_tok_per_s"],
    }))


if __name__ == "__main__":
    main()
