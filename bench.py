"""Offline throughput benchmark (driver contract: one JSON line to stdout).

Workload mirrors the reference bench (`/root/reference/bench.py:8-28`):
a batch of sequences with random prompt/output lengths, temperature-sampled
continuous batching decode. The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against the first recorded run of
this bench (stored in bench_baseline.json, created on first run).

Runs on whatever the default JAX backend is (the real TPU chip under the
driver). Model: random-weight GLM-4-MoE-shaped config sized for one chip —
real checkpoints are not available in this environment (zero egress).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: reruns skip the slow remote compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from glm4_moe_nano_vllm_tpu import LLM, SamplingParams
    from glm4_moe_nano_vllm_tpu.config import ModelConfig

    if os.environ.get("BENCH_MODEL") == "qwen3":
        # Qwen3-0.6B shape — the reference bench's actual model
        # (`/root/reference/bench.py:14`): vocab 151936, hidden 1024,
        # 28 layers, 16q/8kv x 128, intermediate 3072, tied embeddings.
        mc = ModelConfig(
            architecture="qwen3",
            vocab_size=151936,
            hidden_size=1024,
            num_layers=28,
            num_heads=16,
            num_kv_heads=8,
            head_dim=128,
            intermediate_size=3072,
            max_position_embeddings=40960,
            rope_theta=1000000.0,
            use_qk_norm=True,
            tie_word_embeddings=True,
            eos_token_id=2,
        )
    else:
        mc = ModelConfig(
            architecture="glm4_moe",
            vocab_size=32768,
            hidden_size=1024,
            num_layers=12,
            num_heads=8,
            num_kv_heads=8,
            head_dim=128,
            intermediate_size=2048,
            max_position_embeddings=8192,
            partial_rotary_factor=0.5,
            use_qk_norm=True,
            attention_bias=True,
            tie_word_embeddings=True,
            eos_token_id=2,
            n_routed_experts=32,
            num_experts_per_tok=4,
            moe_intermediate_size=512,
            n_shared_experts=1,
            first_k_dense_replace=1,
            routed_scaling_factor=1.5,
        )

    quant = os.environ.get("BENCH_QUANT")  # "awq" | "int8" | unset
    if quant:
        from glm4_moe_nano_vllm_tpu.config import QuantConfig

        mc.quant = QuantConfig(method=quant, bits=4 if quant == "awq" else 8,
                               group_size=128)
    # 256 sequences, like the reference workload (`bench.py:10`); decode at
    # batch >= 128 keeps the MXU's weight-tile streaming fully amortized
    # (see BENCHMARKS.md "Why batch 128").
    num_seqs = int(os.environ.get("BENCH_NUM_SEQS", 256))
    max_in, max_out = 128, 128

    llm = LLM(
        model="",
        model_config=mc,
        max_num_seqs=num_seqs,
        max_num_batched_tokens=16384,
        max_model_len=512,
        kvcache_block_size=32,
        num_kvcache_blocks=num_seqs * 16,
        prefill_chunk_size=1024,
        # AOT warmup ON for the driver-visible leg (VERDICT r3 item 5): the
        # warmup ladder replaces the reference's CUDA-graph capture
        # (`/root/reference/nanovllm/engine/model_runner.py:223-258`);
        # warmup_programs/warmup_time_s below report it, and
        # jit_serve_compiles == 0 in the fresh metrics proves coverage.
        enforce_eager=False,
        # overlapped AOT warmup compiles (pays off because the persistent
        # compile cache is enabled above; VERDICT r4 item 5c)
        warmup_compile_workers=6,
        decode_buckets=(num_seqs,),
        prefill_seq_buckets=(16, num_seqs),
        prefill_len_buckets=(32, 64, 128, 256),
        dtype="bfloat16",
        kv_cache_dtype="bfloat16",
        # 64-token decode windows amortize the host<->device round trip;
        # 32-token blocks cut the write kernel's RMW amplification
        num_scheduler_steps=64,
    )

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(4, 32000, size=rng.integers(32, max_in)).tolist()
        for _ in range(num_seqs)
    ]
    sp = [
        SamplingParams(
            temperature=0.6,
            max_tokens=int(rng.integers(64, max_out)),
            ignore_eos=True,
        )
        for _ in range(num_seqs)
    ]

    # Compile warmup on a DISJOINT prompt set (same shapes, different token
    # ids): compiles both the fresh-prefill and the cache-hit re-prefill
    # programs without poisoning the measured runs' prefix cache.
    warm = [
        rng.integers(4, 32000, size=len(p)).tolist() for p in prompts
    ]
    t_cold = time.perf_counter()
    for _ in range(2):
        llm.generate(warm, [SamplingParams(temperature=0.6, max_tokens=4,
                                           ignore_eos=True)] * num_seqs,
                     use_tqdm=False)
    cold_start_s = time.perf_counter() - t_cold

    # --- measured run 1: FRESH prefill (prompts never seen) + full decode ---
    llm.metrics.reset()
    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp, use_tqdm=False)
    elapsed = time.perf_counter() - t0
    fresh = llm.metrics.summary()
    total_out = sum(len(o["token_ids"]) for o in outs)
    tput = total_out / elapsed

    # --- measured run 2: cache-hot re-prefill of the same prompts (short
    # decode tail — this run measures the prefix-cache-hit prefill rate) ----
    llm.metrics.reset()
    sp_hot = [SamplingParams(temperature=0.6, max_tokens=8, ignore_eos=True)
              for _ in range(num_seqs)]
    t1 = time.perf_counter()
    outs2 = llm.generate(prompts, sp_hot, use_tqdm=False)
    hot_elapsed = time.perf_counter() - t1
    hot = llm.metrics.summary()
    del outs2

    # --- roofline: decode is weight-read bound; report HBM-BW utilization --
    # Every decode micro-step streams the full active weight set once (dense-
    # mode MoE reads all experts); micro-steps/s x bytes / peak BW.
    import jax as _jax

    param_bytes = sum(x.nbytes for x in
                      _jax.tree.leaves(llm.model_runner.params))
    window = llm.config.num_scheduler_steps
    micro_steps = fresh["num_decode_steps"] * window
    decode_time = max(fresh["decode_tokens"] / max(fresh["decode_tok_per_s"],
                                                   1e-9), 1e-9)
    peak_bw = float(os.environ.get("BENCH_HBM_GBPS", "819")) * 1e9  # v5e
    hbm_util = param_bytes * micro_steps / decode_time / peak_bw

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = tput
        with open(baseline_path, "w") as f:
            json.dump({"value": tput, "ts": time.time()}, f)

    result = {
        "metric": "offline_generation_throughput",
        "value": round(tput, 1),
        "unit": "tok/s",
        "vs_baseline": round(tput / baseline, 3),
        # honesty fields (VERDICT r1 item 8): fresh vs cache-hot, roofline
        "fresh_prefill_tok_s": round(fresh["prefill_tok_per_s"], 1),
        "fresh_ttft_p50_s": round(fresh["ttft_p50_s"], 4),
        "decode_tok_s": round(fresh["decode_tok_per_s"], 1),
        "cached_prefill_tok_s": round(hot["prefill_tok_per_s"], 1),
        "decode_hbm_bw_util": round(hbm_util, 3),
        # cold-start cost (VERDICT r2 item 8): the CUDA-graph-replacement
        # story end-to-end, plus host-side batch-prep time
        "warmup_programs": fresh["warmup_programs"],
        "warmup_time_s": round(fresh["warmup_time_s"], 1),
        # eager-mode cold start: wall time of the compile-warming generates
        # (with enforce_eager=False, warmup_* above cover AOT warmup)
        "cold_start_s": round(cold_start_s, 1),
        "host_prep_s": round(fresh["host_prep_s"], 2),
    }

    # --- flagship: true-Air-width INT4 slice (VERDICT r2 item 2) ----------
    # The toy model above is partly host-bound; the number that matters is
    # the weight-streaming-bound Air-slice decode. Run it in-process (the
    # chip allows one process) after freeing the toy model.
    if os.environ.get("BENCH_AIR", "1") != "0":
        # jax.jit caches hold the runner's bound step methods (which
        # reference params + KV caches) — clear them or the toy model's
        # ~3 GB stays pinned and the 8.9 GB Air slice OOMs the chip
        llm.model_runner.params = None
        llm.model_runner.caches = None
        del llm, outs
        import gc

        gc.collect()
        import jax

        jax.clear_caches()
        gc.collect()
        try:
            # flagship leg runs with the AOT warmup ladder (enforce_eager
            # off) so warmup_programs/warmup_time_s audit FLAGSHIP shapes
            # (VERDICT r4 item 5b); warmup_compile_workers overlaps the
            # compiles and the persistent cache amortizes reruns
            result["air_slice_int4"] = bench_air_slice(
                peak_bw, enforce_eager=False)
        except Exception as e:  # noqa: BLE001 — keep the toy numbers
            print(f"# air_slice_int4 failed: {e!r}", file=sys.stderr)
        # throughput config: batch 256 fits only with the halved (int8) KV
        # cache — the capacity story doing real work. Per-step weight-stream
        # util drops (same ~9 GB stream amortized over 2x tokens) while
        # decode tok/s rises ~1.5x; both configs are reported.
        if os.environ.get("BENCH_AIR_B256", "1") != "0":
            gc.collect()
            jax.clear_caches()
            gc.collect()
            try:
                result["air_slice_int4_b256"] = bench_air_slice(
                    peak_bw, num_seqs=256, kv="int8", blk_tok=320,
                    out_tokens=128)
            except Exception as e:  # noqa: BLE001
                print(f"# air_slice_int4_b256 failed: {e!r}", file=sys.stderr)
        # context-laden flagship config (VERDICT r4 item 1): mean decode
        # context ~2K tokens — the KV-read-bound regime config 4 actually
        # serves. int8 KV is REQUIRED here (bf16 KV at batch 128 x 2.5K
        # tokens is 11 GiB next to 8.5 GiB of weights: OOM by ~4 GiB);
        # 128-token blocks + 1024-token attention chunks are the measured
        # optimum for the scaled-KV decode kernel (BENCHMARKS.md round 5).
        if os.environ.get("BENCH_AIR_CTX", "1") != "0":
            gc.collect()
            jax.clear_caches()
            gc.collect()
            try:
                result["air_slice_int4_ctx2k"] = bench_air_slice(
                    peak_bw, num_seqs=128, kv="int8", blk_tok=2560,
                    out_tokens=96, prompt_lo=1792, prompt_hi=2304,
                    max_model_len=4096, block_size=128, pa_chunk=1024,
                    prefill_chunk=512, max_batched_tokens=4096,
                    seq_buckets=(8, 128))
            except Exception as e:  # noqa: BLE001
                print(f"# air_slice_int4_ctx2k failed: {e!r}",
                      file=sys.stderr)

    print(json.dumps(result))
    m = {k: round(v, 2) if isinstance(v, float) else v
         for k, v in fresh.items()}
    print(f"# total={total_out} tok, fresh_time={elapsed:.1f}s, "
          f"hot_time={hot_elapsed:.1f}s, param_bytes={param_bytes >> 20}MiB, "
          f"backend={_jax.default_backend()}, fresh_metrics={m}",
          file=sys.stderr)


def bench_air_slice(peak_bw: float, num_seqs: int | None = None,
                    kv: str = "bfloat16", blk_tok: int = 512,
                    out_tokens: int = 64, prompt_lo: int = 32,
                    prompt_hi: int = 128, max_model_len: int = 512,
                    block_size: int = 32, pa_chunk: int = 256,
                    prefill_chunk: int = 512,
                    max_batched_tokens: int = 4096,
                    seq_buckets: tuple | None = None,
                    enforce_eager: bool = True) -> dict:
    """True-Air-width INT4 decode bench (8 of 46 layers, every width real:
    H=4096, 96q/8kv x 128, 128 experts Im=1408 top-8 + shared, KG=11).

    Decode here streams ~1.19 GB of packed expert weights per MoE layer per
    micro-step — the flagship weight-bound regime (BASELINE config 4's
    single-chip proxy; the full 46 layers are the v5e-8 TP+EP target)."""
    import time as _time

    import jax as _jax

    from glm4_moe_nano_vllm_tpu import LLM, SamplingParams
    from glm4_moe_nano_vllm_tpu.config import ModelConfig, QuantConfig

    layers = int(os.environ.get("BENCH_AIR_LAYERS", "8"))
    if num_seqs is None:
        num_seqs = int(os.environ.get("BENCH_AIR_NUM_SEQS", "128"))
    mc = ModelConfig(
        architecture="glm4_moe",
        vocab_size=65536,
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
    llm = LLM(
        model="",
        model_config=mc,
        max_num_seqs=num_seqs,
        max_num_batched_tokens=max_batched_tokens,
        max_model_len=max_model_len,
        kvcache_block_size=block_size,
        num_kvcache_blocks=num_seqs * (blk_tok // block_size),
        prefill_chunk_size=prefill_chunk,
        enforce_eager=enforce_eager,
        warmup_compile_workers=6,
        decode_buckets=(num_seqs,),
        prefill_seq_buckets=seq_buckets or (16, num_seqs),
        prefill_len_buckets=(32, 64, 128)
        if prompt_hi <= 128 else (128, 256, 512),
        dtype="bfloat16",
        kv_cache_dtype=kv,
        # 64-step windows: the toy bench measured ~1 ms/step of host/tunnel
        # gap at 32 (wall vs device time); 64 halves it per micro-step
        num_scheduler_steps=64,
        # 256-token decode-attention chunks: cmax=2 grid lets the
        # cross-chunk DMA lookahead overlap compute (512 measured 5,683
        # tok/s vs 256's 5,839 at batch 128 — the 512 choice predated the
        # lookahead and aged badly). The context-laden leg passes 1024:
        # at KV-read-bound contexts the kernel is per-grid-step latency
        # bound, so fewer/larger chunks win (BENCHMARKS.md round 5).
        pa_chunk_tokens=pa_chunk,
    )
    rng = np.random.default_rng(0)
    prompts = [rng.integers(4, 60000,
                            size=int(rng.integers(prompt_lo, prompt_hi))
                            ).tolist()
               for _ in range(num_seqs)]
    # uniform output length: decode windows stay full, so decode_tok_s is
    # the steady-state full-batch rate (see examples/bench_air_slice.py)
    sp = [SamplingParams(temperature=0.6, max_tokens=out_tokens,
                         ignore_eos=True) for _ in range(num_seqs)]
    warm = [rng.integers(4, 60000, size=len(p)).tolist() for p in prompts]
    llm.generate(warm, [SamplingParams(temperature=0.6, max_tokens=4,
                                       ignore_eos=True)] * num_seqs,
                 use_tqdm=False)

    llm.metrics.reset()
    t0 = _time.perf_counter()
    outs = llm.generate(prompts, sp, use_tqdm=False)
    elapsed = _time.perf_counter() - t0
    m = llm.metrics.summary()
    total = sum(len(o["token_ids"]) for o in outs)

    pbytes = sum(x.nbytes for x in _jax.tree.leaves(llm.model_runner.params))
    window = llm.config.num_scheduler_steps
    micro_steps = m["num_decode_steps"] * window
    decode_time = max(m["decode_tokens"] / max(m["decode_tok_per_s"], 1e-9),
                      1e-9)
    hbm_util = pbytes * micro_steps / decode_time / peak_bw
    # ... and against the chip's MEASURED streaming ceiling: the same
    # BlockSpec weight pipeline tops out at 572 GB/s with all compute
    # stripped (NVT_DEBUG_NK1 microbench, BENCHMARKS.md), so that is the
    # realizable roofline for this access pattern, not the 819 nominal
    practical_bw = float(os.environ.get("BENCH_HBM_PRACTICAL_GBPS",
                                        "572")) * 1e9
    hbm_util_practical = pbytes * micro_steps / decode_time / practical_bw
    # free THIS model fully before any later bench leg: jit caches pin the
    # runner's params/caches (same issue as the toy->air handoff above)
    llm.model_runner.params = None
    llm.model_runner.caches = None
    del llm
    import gc as _gc

    _gc.collect()
    _jax.clear_caches()
    _gc.collect()
    avg_ctx = (prompt_lo + prompt_hi) / 2 + out_tokens / 2
    return {
        "config": f"glm45-air-slice {layers}L INT4 "
                  f"(H4096 96q8kv E128 Im1408 top8), batch {num_seqs}, "
                  f"kv {kv}, bs {block_size}",
        "param_bytes_mib": pbytes >> 20,
        "avg_decode_ctx_tokens": round(avg_ctx),
        "total_tok_s": round(total / elapsed, 1),
        "decode_tok_s": round(m["decode_tok_per_s"], 1),
        "fresh_prefill_tok_s": round(m["prefill_tok_per_s"], 1),
        "ttft_p50_s": round(m["ttft_p50_s"], 3),
        "decode_hbm_bw_util": round(hbm_util, 3),
        "decode_hbm_bw_util_practical": round(hbm_util_practical, 3),
        # nonzero only with the AOT warmup ladder (flagship b128 leg)
        "warmup_programs": m.get("warmup_programs", 0),
        "warmup_time_s": round(m.get("warmup_time_s", 0.0), 1),
        "jit_serve_compiles": m.get("jit_serve_compiles", 0),
    }


if __name__ == "__main__":
    main()
