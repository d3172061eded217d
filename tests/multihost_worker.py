"""Subprocess worker for the 2-process multi-host test (not a pytest file).

Each process hosts 4 virtual CPU devices; jax.distributed joins them into an
8-device world. The engine is constructed identically on both processes
(replicated deterministic scheduler, parallel/multihost.py) and generates
over a (dp=2, tp=4) global mesh. Tokens are printed for the parent to
compare across processes and against a single-process reference.

Usage: python multihost_worker.py <process_id> <coordinator_port> [mode]

Modes:
  dp2tp4 (default) — (dp=2, tp=4) mesh, tp inside each process.
  tp8ep            — (dp=1, tp=8) with EP experts on tp and a2a dispatch
                     FORCED: the tp/EP axis spans the process boundary, so
                     every psum/all_gather/ragged_all_to_all in the expert
                     path crosses processes — the DCN-crossing collective
                     pattern of BASELINE config 5 (GLM-4.5 355B, >=2 hosts).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "dp2tp4"
    from tests.test_multihost import build_engine, request_stream

    kw = dict(
        num_processes=2,
        process_id=pid,
        coordinator_address=f"127.0.0.1:{port}",
    )
    if mode == "tp8ep":
        from glm4_moe_nano_vllm_tpu.config import ModelConfig
        from tests.test_multihost import MOE_MC

        # heads divisible by tp=8; E=8 -> 1 expert per device, 4 of the 8
        # expert shards live on the OTHER process
        mc = dict(MOE_MC, num_heads=8, num_kv_heads=8)
        kw.update(
            model_config=ModelConfig(**mc),
            tensor_parallel_size=8,
            moe_parallel="ep",
            ep_dispatch="a2a",
        )
    else:
        kw.update(data_parallel_size=2, tensor_parallel_size=4)
    eng = build_engine(**kw)
    assert jax.process_count() == 2 and jax.device_count() == 8
    if mode == "tp8ep":
        assert eng.model_runner.model.moe_ep
        assert eng.config.expert_parallel_size == 8
    prompts, sp = request_stream()
    outs = eng.generate(prompts, sp, use_tqdm=False)
    print("TOKENS " + json.dumps([o["token_ids"] for o in outs]), flush=True)


if __name__ == "__main__":
    main()
