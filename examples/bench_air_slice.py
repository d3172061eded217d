"""Largest GLM-4.5-Air-proportioned slice that fits one v5e, INT4 (AWQ).

TRUE Air widths everywhere — hidden 4096, 96q/8kv x 128 heads, 128 experts
top-8 + 1 shared at Im=1408 (the KG=11 scale-padding path), attention bias,
partial rotary 0.5 — with the layer count the 16 GB chip can hold in INT4
(default 8 = 1 dense + 7 MoE, ~9 GB packed weights + scales; the full
Air is 46 layers, BASELINE config 4 spreads it over a v5e-8 host via TP+EP).
Reports decode tok/s, fresh-prefill tok/s and TTFT, like bench_prod.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_air_slice.py
Env: AIR_LAYERS (default 8), AIR_NUM_SEQS (default 64), AIR_KV
     (bfloat16 | float8_e4m3fn — fp8 halves KV bytes; ~1.6x decode on
     v5e, see BENCHMARKS.md), AIR_BS (block size, default 32),
     AIR_OUT_TOKENS (uniform output length, default 64), AIR_PA_CHUNK
     (decode attention chunk, default 512).
"""

import json
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

    layers = int(os.environ.get("AIR_LAYERS", "8"))
    mc = ModelConfig(
        architecture="glm4_moe",
        vocab_size=65536,  # true vocab is 151552; reduced to keep the tied
        # int4 head's logits matmul off the critical HBM path on 16 GB
        hidden_size=4096,
        num_layers=layers,
        num_heads=96,
        num_kv_heads=8,
        head_dim=128,
        intermediate_size=10944,
        max_position_embeddings=8192,
        partial_rotary_factor=0.5,
        use_qk_norm=True,
        attention_bias=True,
        tie_word_embeddings=True,
        eos_token_id=2,
        n_routed_experts=128,
        num_experts_per_tok=8,
        moe_intermediate_size=1408,
        n_shared_experts=1,
        first_k_dense_replace=1,
        routed_scaling_factor=2.5,
        quant=QuantConfig(method="awq", bits=4, group_size=128,
                          quantize_lm_head=True),
    )
    num_seqs = int(os.environ.get("AIR_NUM_SEQS", "64"))
    kv = os.environ.get("AIR_KV", "bfloat16")
    # round 3: fp8 scale pages land per-sublane in the decode kernel, so
    # fp8 runs the same 32-token blocks as bf16 (apples-to-apples)
    bs = int(os.environ.get("AIR_BS", "32"))

    llm = LLM(
        model="",
        model_config=mc,
        max_num_seqs=num_seqs,
        max_num_batched_tokens=4096,
        max_model_len=512,
        kvcache_block_size=bs,
        num_kvcache_blocks=num_seqs * (int(os.environ.get("AIR_BLK_TOK", "512")) // bs),
        prefill_chunk_size=512,
        enforce_eager=True,
        decode_buckets=(num_seqs,),
        prefill_seq_buckets=(16, num_seqs),
        prefill_len_buckets=(32, 64, 128),
        dtype="bfloat16",
        kv_cache_dtype=kv,
        num_scheduler_steps=int(os.environ.get("AIR_STEPS", "64")),
        pa_chunk_tokens=int(os.environ.get("AIR_PA_CHUNK", "256")),
    )

    rng = np.random.default_rng(0)
    prompts = [rng.integers(4, 60000, size=int(rng.integers(32, 128))).tolist()
               for _ in range(num_seqs)]
    # uniform output length: decode windows stay FULL, so decode_tok_s is
    # the steady-state full-batch rate (ragged max_tokens leaves later
    # windows partially empty and under-reports the per-chip rate)
    out_len = int(os.environ.get("AIR_OUT_TOKENS", "64"))
    sp = [SamplingParams(temperature=0.6, max_tokens=out_len,
                         ignore_eos=True) for _ in range(num_seqs)]
    warm = [rng.integers(4, 60000, size=len(p)).tolist() for p in prompts]
    llm.generate(warm, [SamplingParams(temperature=0.6, max_tokens=4,
                                       ignore_eos=True)] * num_seqs,
                 use_tqdm=False)

    llm.metrics.reset()
    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp, use_tqdm=False)
    elapsed = time.perf_counter() - t0
    m = llm.metrics.summary()
    total = sum(len(o["token_ids"]) for o in outs)
    import jax as _jax

    pbytes = sum(x.nbytes for x in _jax.tree.leaves(llm.model_runner.params))
    print(json.dumps({
        "config": f"glm45-air-slice {layers}L INT4 (H4096 96q8kv E128 "
                  f"Im1408 top8)",
        "param_bytes_mib": pbytes >> 20,
        "total_tok_s": round(total / elapsed, 1),
        "decode_tok_s": round(m["decode_tok_per_s"], 1),
        "fresh_prefill_tok_s": round(m["prefill_tok_per_s"], 1),
        "ttft_p50_s": round(m["ttft_p50_s"], 3),
        "kv_cache_dtype": kv,
        "num_seqs": num_seqs,
        "backend": _jax.default_backend(),
    }))
    print(f"# metrics={ {k: round(v, 2) if isinstance(v, float) else v for k, v in m.items()} }",
          file=sys.stderr)


if __name__ == "__main__":
    main()
