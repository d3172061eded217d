"""Pipeline parallelism: microbatched layer-stage pipeline over a ``pp`` mesh axis.

TPU-native realization of the capability the reference only stubs
(`/root/reference/nanovllm/models/glm4_moe/model.py:94-100` fakes
``get_pp_group().is_last_rank``; real PP groups exist only in the vendored,
unused `parallel_state_ref.py:1048-1058` with send/recv_tensor_dict plumbing
at :631-751). Instead of point-to-point NCCL sends between per-stage worker
processes, the pipeline is one SPMD program:

  * the layer-stacked parameter arrays (and the per-layer KV cache stacks)
    are sharded on their leading layer dim over the ``pp`` mesh axis — each
    stage holds ``L/pp`` contiguous layers;
  * ``jax.shard_map`` runs manual over ``pp`` only (``axis_names={'pp'}``);
    ``dp``/``tp`` shardings inside the stage body stay compiler-managed
    (GSPMD), so the same attention/MoE code runs unchanged per stage;
  * the batch is split into microbatches; a ``lax.scan`` over
    ``num_mb + pp - 1`` ticks runs the classic inference pipeline schedule
    (stage ``s`` processes microbatch ``t - s`` at tick ``t``), with
    ``lax.ppermute`` rotating activations stage→stage+1 over ICI;
  * inactive (bubble) ticks mask ``slot_mapping`` to ``-1`` so KV-cache
    writes are no-ops — the same padding convention the whole engine uses
    (reference `attention.py:23`).

Microbatch layout: the batch dim is viewed as ``[dp, num_mb, B/(dp·num_mb)]``
so each microbatch spans every ``dp`` shard (slicing contiguous rows instead
would park entire microbatches on one dp rank). The slice and the
scatter-back use the same mapping, so host-side row order is preserved.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from glm4_moe_nano_vllm_tpu.engine.batch import BatchInfo


def _get_mb(arr: jax.Array, m, dp: int, num_mb: int) -> jax.Array:
    """Microbatch ``m`` of a [B, ...] array under the [dp, num_mb, ·] view."""
    b = arr.shape[0]
    mbd = b // (dp * num_mb)
    a = arr.reshape(dp, num_mb, mbd, *arr.shape[1:])
    a = jax.lax.dynamic_index_in_dim(a, m, axis=1, keepdims=False)
    return a.reshape(dp * mbd, *arr.shape[1:])


def _set_mb(arr: jax.Array, m, val: jax.Array, dp: int, num_mb: int) -> jax.Array:
    b = arr.shape[0]
    mbd = b // (dp * num_mb)
    a = arr.reshape(dp, num_mb, mbd, *arr.shape[1:])
    v = val.reshape(dp, 1, mbd, *arr.shape[1:])
    a = jax.lax.dynamic_update_slice_in_dim(a, v, m, axis=1)
    return a.reshape(arr.shape)


def _slice_batch(batch: BatchInfo, m, dp: int, num_mb: int, valid) -> BatchInfo:
    """Microbatch view of every per-sequence batch array. Bubble ticks must
    not write the KV cache: ``slot_mapping`` is forced to -1 (the XLA scatter
    no-op) AND ``context_lens`` to 0 — the Pallas write kernel plans its runs
    from positions/context_lens, not slot_mapping (q = ctx - pos = 0 rows)."""
    b, s = batch.token_ids.shape
    get = partial(_get_mb, m=m, dp=dp, num_mb=num_mb)
    slots = get(batch.slot_mapping.reshape(b, s)).reshape(-1)
    return BatchInfo(
        token_ids=get(batch.token_ids),
        positions=get(batch.positions),
        slot_mapping=jnp.where(valid, slots, -1),
        block_tables=get(batch.block_tables),
        context_lens=jnp.where(valid, get(batch.context_lens), 0),
        last_q_idx=get(batch.last_q_idx),
        temperatures=get(batch.temperatures),
    )


def pipeline_forward(
    mesh,
    stage_fn,
    x: jax.Array,  # [B, S, H] hidden states entering the pipelined stack
    layer_params,  # pytree of [L, ...] stacked arrays, L sharded over pp
    k_caches,  # [H, L*nb, bs, D] layer-flat cache (or fp8 {data, scale}
    v_caches,  # dict — every leaf has the layer-flat dim at axis 1), on pp
    batch: BatchInfo,
    num_mb: int = 0,
):
    """Run ``stage_fn`` over ``pp`` layer stages as a microbatch pipeline.

    ``stage_fn(x_mb, lp_local, kc_local, vc_local, batch_mb) -> (y, kc, vc)``
    scans this stage's local ``L/pp`` layers over one microbatch.

    Returns ``(x_out [B, S, H], k_caches, v_caches)`` with ``x_out``
    replicated over pp (psum of the last stage's output buffer).
    """
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    num_mb = num_mb or pp
    b = x.shape[0]
    assert b % (dp * num_mb) == 0, (b, dp, num_mb)
    mb_rows = b // num_mb
    ticks = num_mb + pp - 1

    def pipelined(x, lp, kc, vc, batch):
        stage = jax.lax.axis_index("pp")
        is_last = stage == pp - 1
        state0 = jnp.zeros((mb_rows, *x.shape[1:]), x.dtype)
        out0 = jnp.zeros_like(x)

        def tick(carry, t):
            state, out, kc, vc = carry
            m = t - stage
            valid = (m >= 0) & (m < num_mb)
            m_c = jnp.clip(m, 0, num_mb - 1)
            # stage 0 reads fresh input; later stages take the rotated
            # activation from the previous stage
            x_in = _get_mb(x, m_c, dp, num_mb)
            cur = jnp.where(stage == 0, x_in, state)
            bmb = _slice_batch(batch, m_c, dp, num_mb, valid)
            y, kc, vc = stage_fn(cur, lp, kc, vc, bmb)
            prev = _get_mb(out, m_c, dp, num_mb)
            out = _set_mb(out, m_c, jnp.where(valid & is_last, y, prev),
                          dp, num_mb)
            state = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % pp) for i in range(pp)]
            )
            return (state, out, kc, vc), None

        (_, out, kc, vc), _ = jax.lax.scan(
            tick, (state0, out0, kc, vc), jnp.arange(ticks, dtype=jnp.int32)
        )
        # Only the last stage wrote non-zeros; psum replicates the result.
        # f32 keeps the sum exact and avoids XLA CPU's bf16 all-reduce
        # promotion pass, which crashes on this pattern (jax 0.9 / cpu).
        out = jax.lax.psum(out.astype(jnp.float32), "pp").astype(x.dtype)
        return out, kc, vc

    stack_spec = jax.tree.map(lambda _: P("pp"), layer_params)
    batch_spec = jax.tree.map(lambda _: P(), batch)

    def cache_spec(c):
        # data is head-major [H, L*nb, bs, D] (layer-flat blocks at axis 1);
        # scaled caches carry PAGE-MAJOR scale planes [L*nb, H, 1, SL]
        # (ops/kv_cache.py round 5) whose block dim is axis 0
        if isinstance(c, dict):
            return {"data": P(None, "pp"), "scale": P("pp")}
        return P(None, "pp")

    kc_spec = cache_spec(k_caches)
    vc_spec = cache_spec(v_caches)
    fn = jax.shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P(), stack_spec, kc_spec, vc_spec, batch_spec),
        out_specs=(P(), kc_spec, vc_spec),
        axis_names=frozenset({"pp"}),
        check_vma=False,
    )
    return fn(x, layer_params, k_caches, v_caches, batch)
