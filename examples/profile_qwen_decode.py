"""Profile the Qwen3-8B INT8 decode micro-step on-chip (VERDICT r4 item 6:
config 2 decodes at 48% of the 572 GB/s practical weight-stream floor; this
attributes the other half). Same xprof workflow as profile_air_decode.py.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/profile_qwen_decode.py
Env: Q8B_NUM_SEQS (128), PROF_DIR (/tmp/qwen_prof).
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

    num_seqs = int(os.environ.get("Q8B_NUM_SEQS", "128"))
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
        quant=QuantConfig(method="int8", bits=8, group_size=128,
                          quantize_lm_head=True),
    )
    cfg = Config(
        model="", model_config=mc, max_num_seqs=num_seqs,
        max_num_batched_tokens=8192, max_model_len=256,
        kvcache_block_size=32, num_kvcache_blocks=num_seqs * 8,
        prefill_chunk_size=1024, enforce_eager=True,
        decode_buckets=(num_seqs,), prefill_seq_buckets=(16, num_seqs),
        prefill_len_buckets=(32, 64, 128),
        dtype="bfloat16", kv_cache_dtype="bfloat16",
        num_scheduler_steps=64,
    )
    t0 = time.perf_counter()
    runner = ModelRunner(cfg)
    sched = Scheduler(cfg)
    print(f"# runner ready {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.6, max_tokens=192, ignore_eos=True)
    for _ in range(num_seqs):
        sched.add(Sequence(
            rng.integers(4, 150000, size=int(rng.integers(48, 128))).tolist(),
            sp, block_size=cfg.kvcache_block_size))

    decoded_windows = 0
    while not sched.is_finished() and decoded_windows < 1:
        batch = sched.schedule()
        if not batch.is_prefill:
            decoded_windows += 1
        sched.postprocess(batch, runner.run(batch))
    print(f"# warm at {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    prof_dir = os.environ.get("PROF_DIR", "/tmp/qwen_prof")
    jax.profiler.start_trace(prof_dir)
    t1 = time.perf_counter()
    decoded = 0
    for _ in range(2):
        batch = sched.schedule()
        assert batch is not None and not batch.is_prefill
        sched.postprocess(batch, runner.run(batch))
        decoded += batch.num_tokens
    dt = time.perf_counter() - t1
    jax.profiler.stop_trace()
    print(f"# traced decode: {decoded} tok in {dt:.3f}s -> "
          f"{decoded/dt:.0f} tok/s", file=sys.stderr)

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
    for k, t in agg.most_common(25):
        print(f"{t/1e3:9.2f} ms  {100*t/max(total,1e-9):5.1f}%  x{occ[k]:6.0f}"
              f"  [{k[0]}] {k[1]}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--parse-only":
        _parse(sys.argv[2])
    else:
        main()
