"""Profile Air-width PREFILL steps on-chip (VERDICT r4 item 2: the b256
flagship is prefill/TTFT-bound — fresh prefill 4,018 tok/s with the quant
GMMs at 40-77 of ~197 TFLOP/s — and prefill has never been profiled).

Same true-Air-width INT4 slice as bench.py's b256 leg; drives the engine's
real chunked prefill admission, then traces a few warm prefill steps and
dumps the per-op HLO time breakdown (same xprof workflow as
profile_air_decode.py).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_air_prefill.py
Env: AIR_LAYERS (8), AIR_NUM_SEQS (256), PROF_DIR (/tmp/air_prefill_prof),
     AIR_PROMPT_LO/HI (32/128), AIR_PF_CHUNK (512).
"""

import glob
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

    from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig, QuantConfig
    from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
    from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
    from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
    from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

    layers = int(os.environ.get("AIR_LAYERS", "8"))
    num_seqs = int(os.environ.get("AIR_NUM_SEQS", "256"))
    plo = int(os.environ.get("AIR_PROMPT_LO", "32"))
    phi = int(os.environ.get("AIR_PROMPT_HI", "128"))
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
    cfg = Config(
        model="", model_config=mc, max_num_seqs=num_seqs,
        max_num_batched_tokens=4096, max_model_len=512,
        kvcache_block_size=int(os.environ.get("AIR_BS", "32")),
        num_kvcache_blocks=num_seqs * 10,
        prefill_chunk_size=int(os.environ.get("AIR_PF_CHUNK", "512")),
        enforce_eager=True,
        decode_buckets=(num_seqs,), prefill_seq_buckets=(16, num_seqs),
        prefill_len_buckets=(32, 64, 128),
        dtype="bfloat16",
        kv_cache_dtype=os.environ.get("AIR_KV", "int8"),
        num_scheduler_steps=64,
        pa_chunk_tokens=int(os.environ.get("AIR_PA_CHUNK", "256")),
    )
    t0 = time.perf_counter()
    runner = ModelRunner(cfg)
    print(f"# runner ready {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.6, max_tokens=4, ignore_eos=True)

    def add_all(sched):
        n_tok = 0
        for _ in range(num_seqs):
            toks = rng.integers(4, 60000,
                                size=int(rng.integers(plo, phi))).tolist()
            n_tok += len(toks)
            sched.add(Sequence(toks, sp, block_size=cfg.kvcache_block_size))
        return n_tok

    # pass 1: compile every prefill program shape (fresh token ids)
    sched = Scheduler(cfg)
    add_all(sched)
    while not sched.is_finished():
        batch = sched.schedule()
        sched.postprocess(batch, runner.run(batch))
    print(f"# warm at {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    # pass 2: fresh prompts, trace the prefill steps only
    sched = Scheduler(cfg)
    total_tok = add_all(sched)
    prof_dir = os.environ.get("PROF_DIR", "/tmp/air_prefill_prof")
    jax.profiler.start_trace(prof_dir)
    t1 = time.perf_counter()
    pf_tok = 0
    pf_steps = 0
    while True:
        batch = sched.schedule()
        if batch is None or not batch.is_prefill:
            if batch is not None:
                sched.postprocess(batch, runner.run(batch))
            break
        pf_tok += batch.num_tokens
        pf_steps += 1
        sched.postprocess(batch, runner.run(batch))
    dt = time.perf_counter() - t1
    jax.profiler.stop_trace()
    print(f"# traced {pf_steps} prefill steps: {pf_tok}/{total_tok} tok in "
          f"{dt:.3f}s -> {pf_tok/dt:.0f} tok/s", file=sys.stderr)

    paths = glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {prof_dir}"
    if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
        import subprocess

        env = dict(os.environ,
                   PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
        subprocess.run(
            [sys.executable, __file__, "--parse-only",
             max(paths, key=os.path.getmtime)],
            env=env, check=True)
        return
    _parse(max(paths, key=os.path.getmtime))


def _parse(path):
    import collections
    import json as _json

    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([path], "hlo_stats", {})
    j = _json.loads(data)
    cols = [c["label"] for c in j["cols"]]
    ci = {c: i for i, c in enumerate(cols)}
    agg = collections.Counter()
    occ = collections.Counter()
    for row in j["rows"]:
        v = [x["v"] for x in row["c"]]
        key = (str(v[ci["HLO op category"]]),
               str(v[ci["HLO op name"]]).split(".")[0][:40])
        agg[key] += float(v[ci["Total self time (us)"]])
        occ[key] += float(v[ci["#Occurrences"]])
    total = sum(agg.values())
    print(f"device self-time total: {total/1e3:.1f} ms over trace")
    for k, t in agg.most_common(30):
        print(f"{t/1e3:9.2f} ms  {100*t/max(total,1e-9):5.1f}%  x{occ[k]:6.0f}"
              f"  [{k[0]}] {k[1]}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--parse-only":
        _parse(sys.argv[2])
    else:
        main()
