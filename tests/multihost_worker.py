"""Subprocess worker for the 2-process multi-host test (not a pytest file).

Each process hosts 4 virtual CPU devices; jax.distributed joins them into an
8-device world. The engine is constructed identically on both processes
(replicated deterministic scheduler, parallel/multihost.py) and generates
over a (dp=2, tp=4) global mesh. Tokens are printed for the parent to
compare across processes and against a single-process reference.

Usage: python multihost_worker.py <process_id> <coordinator_port>
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
    from tests.test_multihost import build_engine, request_stream

    eng = build_engine(
        num_processes=2,
        process_id=pid,
        coordinator_address=f"127.0.0.1:{port}",
        data_parallel_size=2,
        tensor_parallel_size=4,
    )
    assert jax.process_count() == 2 and jax.device_count() == 8
    prompts, sp = request_stream()
    outs = eng.generate(prompts, sp, use_tqdm=False)
    print("TOKENS " + json.dumps([o["token_ids"] for o in outs]), flush=True)


if __name__ == "__main__":
    main()
