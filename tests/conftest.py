"""Test harness config: force JAX onto 8 virtual CPU devices.

Multi-chip sharding is validated on a virtual CPU mesh (the reference has no
distributed tests at all, SURVEY.md §4); real-TPU benchmarking happens in
bench.py outside pytest.

The environment force-registers a TPU PJRT plugin via sitecustomize before
pytest starts, so JAX_PLATFORMS in the env is not enough — we steer the
already-imported jax config to CPU here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
