"""BASELINE config 2: Qwen3-8B-shaped dense model, INT8, one v5e chip.

True Qwen3-8B geometry (public Qwen/Qwen3-8B config.json: 36 layers,
hidden 4096, intermediate 12288, GQA 32q/8kv heads x 128, vocab 151936,
qk-norm) with symmetric INT8 group-128 weights — the reference workload is
`/root/reference/bench.py:8-28` (256 seqs, random lens <= 1024).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_qwen8b_int8.py
Env: Q8B_NUM_SEQS (default 128), Q8B_KV (default bfloat16), Q8B_QUANT
     (int8 | awq | none — "none" runs bf16 for an A/B), Q8B_QHEAD (1).
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

    quant = os.environ.get("Q8B_QUANT", "int8")
    qc = None
    if quant != "none":
        qc = QuantConfig(
            method=quant, bits=4 if quant == "awq" else 8, group_size=128,
            quantize_lm_head=os.environ.get("Q8B_QHEAD", "1") == "1",
        )
    mc = ModelConfig(
        architecture="qwen3",
        vocab_size=151936,
        hidden_size=4096,
        num_layers=36,
        num_heads=32,
        num_kv_heads=8,
        head_dim=128,
        intermediate_size=12288,
        max_position_embeddings=40960,
        rope_theta=1000000.0,
        use_qk_norm=True,
        tie_word_embeddings=False,
        eos_token_id=2,
        quant=qc,
    )
    num_seqs = int(os.environ.get("Q8B_NUM_SEQS", 128))

    llm = LLM(
        model="",
        model_config=mc,
        max_num_seqs=num_seqs,
        max_num_batched_tokens=8192,
        max_model_len=256,
        kvcache_block_size=32,
        # 36 layers x 8 kv heads: KV is the HBM pressure here (131 KB per
        # block across the layer-flat stack) — 8 blocks/seq covers the
        # 128-in + 64-out workload in ~4.8 GB next to ~8.6 GB of weights
        num_kvcache_blocks=num_seqs * int(os.environ.get("Q8B_BLK", "8")),
        prefill_chunk_size=1024,
        enforce_eager=True,
        decode_buckets=(num_seqs,),
        prefill_seq_buckets=(16, num_seqs),
        prefill_len_buckets=(32, 64, 128),
        dtype="bfloat16",
        kv_cache_dtype=os.environ.get("Q8B_KV", "bfloat16"),
        num_scheduler_steps=64,
    )

    rng = np.random.default_rng(0)
    prompts = [rng.integers(4, 150000, size=rng.integers(32, 128)).tolist()
               for _ in range(num_seqs)]
    sp = [SamplingParams(temperature=0.6, max_tokens=64, ignore_eos=True)
          for _ in range(num_seqs)]
    warm = [rng.integers(4, 150000, size=len(p)).tolist() for p in prompts]
    llm.generate(warm, [SamplingParams(temperature=0.6, max_tokens=4,
                                       ignore_eos=True)] * num_seqs,
                 use_tqdm=False)
    llm.metrics.reset()

    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp, use_tqdm=False)
    elapsed = time.perf_counter() - t0
    total_out = sum(len(o["token_ids"]) for o in outs)
    m = llm.metrics.summary()
    pbytes = sum(x.nbytes for x in jax.tree.leaves(llm.model_runner.params))
    print(json.dumps({
        "config": f"qwen3-8B dense {quant} (36L H4096 I12288 32q8kv "
                  f"V151936), batch {num_seqs}",
        "param_bytes_mib": pbytes >> 20,
        "total_tok_s": round(total_out / elapsed, 1),
        "decode_tok_s": round(m["decode_tok_per_s"], 1),
        "fresh_prefill_tok_s": round(m["prefill_tok_per_s"], 1),
        "ttft_p50_s": round(m["ttft_p50_s"], 3),
        "backend": jax.default_backend(),
    }))
    mm = {k: round(v, 2) if isinstance(v, float) else v for k, v in m.items()}
    print(f"# metrics={mm}", file=sys.stderr)


if __name__ == "__main__":
    main()
