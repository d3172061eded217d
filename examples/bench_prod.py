"""Production-scale datapoint: GLM-Air-mini 7.6B AWQ INT4 on one chip.

A GLM-4.5-Air-shaped model scaled to fill a single v5e's HBM with INT4
weights (20 layers, hidden 2048, 64 experts Im=1024 top-8 + shared,
GQA 16q/8kv, vocab 64k). Reports decode tok/s and TTFT. See BENCHMARKS.md
("Production scale") for recorded numbers.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/bench_prod.py
Env: PROD_QUANT=awq|int8 (default awq), PROD_NUM_SEQS (default 64).
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

    quant = os.environ.get("PROD_QUANT", "awq")
    mc = ModelConfig(
        architecture="glm4_moe",
        vocab_size=65536,
        hidden_size=2048,
        num_layers=20,
        num_heads=16,
        num_kv_heads=8,
        head_dim=128,
        intermediate_size=4096,
        max_position_embeddings=8192,
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
        quant=QuantConfig(method=quant, bits=4 if quant == "awq" else 8,
                          group_size=128,
                          # tied bf16 embed/lm_head streams 537 MB per decode
                          # micro-step at this vocab; int4 cuts it 4x
                          quantize_lm_head=os.environ.get("PROD_QHEAD", "1") == "1"),
    )
    # 128 is the decode sweet spot: MXU weight-tile streaming at T<=128
    # rows costs the same per expert regardless of T (measured: dot time
    # [64..128, 1024]@[1024, 1024] is ~flat), so doubling the batch from 64
    # nearly halves per-token MoE cost (4080 -> 6123 tok/s measured); 256
    # adds only ~5% more (second MXU row pass) while doubling KV pressure.
    num_seqs = int(os.environ.get("PROD_NUM_SEQS", 128))
    blocks_per_seq = int(os.environ.get("PROD_BLOCKS_PER_SEQ", 16))

    llm = LLM(
        model="",
        model_config=mc,
        max_num_seqs=num_seqs,
        max_num_batched_tokens=16384,
        max_model_len=512,
        kvcache_block_size=32,
        num_kvcache_blocks=num_seqs * blocks_per_seq,
        prefill_chunk_size=1024,
        enforce_eager=True,
        decode_buckets=(num_seqs,),
        prefill_seq_buckets=(16, num_seqs),
        prefill_len_buckets=(32, 64, 128, 256),
        dtype="bfloat16",
        kv_cache_dtype=os.environ.get("PROD_KV", "bfloat16"),
        num_scheduler_steps=64,
    )

    rng = np.random.default_rng(0)
    prompts = [rng.integers(4, 60000, size=rng.integers(32, 128)).tolist()
               for _ in range(num_seqs)]
    sp = [SamplingParams(temperature=0.6,
                         max_tokens=int(rng.integers(64, 128)),
                         ignore_eos=True) for _ in range(num_seqs)]

    # Two warmup rounds: the first compiles the full-prompt prefill shapes
    # and populates the prefix cache; the second compiles the cache-hit
    # re-prefill shapes the measured run will actually use.
    for _ in range(2):
        llm.generate(prompts[:num_seqs],
                     [SamplingParams(temperature=0.6, max_tokens=4,
                                     ignore_eos=True)] * num_seqs,
                     use_tqdm=False)
    llm.metrics.reset()

    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp, use_tqdm=False)
    elapsed = time.perf_counter() - t0
    total_out = sum(len(o["token_ids"]) for o in outs)
    m = {k: round(v, 2) if isinstance(v, float) else v
         for k, v in llm.metrics.summary().items()}
    print(f"prod[{quant}] batch={num_seqs}: total {total_out/elapsed:.0f} "
          f"tok/s over {elapsed:.1f}s, metrics={m}", file=sys.stderr)
    print(f"decode_tok_per_s={m['decode_tok_per_s']}")


if __name__ == "__main__":
    main()
