"""Multi-host runtime wiring (JAX multi-controller).

TPU-native replacement for the reference's shared-memory pickle RPC control
plane (`/root/reference/nanovllm/engine/model_runner.py:49-91`) and NCCL
process groups: every host runs the *same* engine code under
``jax.distributed``; the scheduler is deterministic (same request stream →
same schedule on every host) and sampling happens inside the jitted step
with an explicit PRNG key, so all hosts compute identical token ids without
any host-to-host control messages (SURVEY §7).

Requirements for determinism across hosts:
  * requests must be added in the same order on every host (the serving
    front-end broadcasts the request stream; for offline generate() this is
    trivially true);
  * Config.rng_seed identical everywhere;
  * jax.distributed.initialize() called before any jax computation.
"""

from __future__ import annotations

import logging

import jax
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX multi-controller runtime (no-op on a single host).

    With TPU metadata available (GKE/GCE), arguments are auto-detected.
    """
    if num_processes == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "multi-host initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def make_global_mesh(dp: int = 1, tp: int | None = None) -> Mesh:
    """Build a (dp, pp=1, tp) mesh over all global devices.

    This is the engine's mesh builder (parallel/sharding.py::make_mesh —
    which the LLMEngine calls after initialize_multihost) with tp defaulted
    to all-devices/dp: tp stays innermost so its collectives ride the
    fastest links (ICI within a host), and dp/pp cross DCN. With tp >
    local_device_count, the tp axis itself spans hosts — the config-5
    pattern tests/test_multihost.py::test_two_process_ep_axis_across_boundary
    exercises.
    """
    from glm4_moe_nano_vllm_tpu.parallel.sharding import make_mesh

    n = len(jax.devices())
    tp = tp or n // dp
    assert dp * tp == n, (dp, tp, n)
    return make_mesh(dp=dp, tp=tp)
