"""Ragged all-to-all for expert-parallel token dispatch.

TPU-native realization of the reference's vendored-but-unused EP
``dispatch``/``combine`` communicator hooks
(`/root/reference/nanovllm/distributed/parallel_state_ref.py:792-805`): on
TPU the transfer is one ``jax.lax.ragged_all_to_all`` — XLA moves exactly the
real rows over ICI, no fixed per-peer capacity padding (the GShard-style
capacity factor would either drop tokens, changing logits, or pad to the
worst case, inflating ICI volume n-fold).

XLA:CPU does not implement the ``ragged-all-to-all`` HLO, so the virtual
8-device test mesh runs a semantically identical emulation built from
``all_gather`` + a masked gather. The emulation is also an independent oracle
for the offset bookkeeping: tests drive both through the same call.

Semantics (a strict subset of ``jax.lax.ragged_all_to_all``): every device
sends ``send_sizes[j]`` rows starting at ``input_offsets[j]`` to peer ``j``,
where they land at ``output_offsets[j]`` (sender-chosen) in the peer's
``output`` buffer; ``recv_sizes[j]`` rows arrive from peer ``j``. Rows of
``output`` outside every landing window keep their original values.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _have_native() -> bool:
    if os.environ.get("NVT_EMULATE_A2A"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def ragged_a2a(
    operand: jax.Array,  # [M, ...] rows to send, peer-contiguous
    output: jax.Array,  # [C, ...] preallocated landing buffer
    input_offsets: jax.Array,  # [n] int32: my chunk starts, per peer
    send_sizes: jax.Array,  # [n] int32
    output_offsets: jax.Array,  # [n] int32: where MY chunk lands at each peer
    recv_sizes: jax.Array,  # [n] int32: rows arriving from each peer
    axis_name: str,
):
    """Must be called inside ``shard_map`` over ``axis_name``."""
    if _have_native():
        return jax.lax.ragged_all_to_all(
            operand, output, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis_name=axis_name,
        )
    return _emulated(operand, output, input_offsets, send_sizes,
                     output_offsets, recv_sizes, axis_name)


def _emulated(operand, output, in_offs, send, out_offs, recv, axis_name):
    """all_gather + masked gather with identical semantics (CPU test mesh)."""
    all_op = jax.lax.all_gather(operand, axis_name)  # [n, M, ...]
    all_in = jax.lax.all_gather(in_offs, axis_name)  # [n, n]
    all_send = jax.lax.all_gather(send, axis_name)
    all_out = jax.lax.all_gather(out_offs, axis_name)
    r = jax.lax.axis_index(axis_name)
    c = output.shape[0]
    p = jnp.arange(c, dtype=jnp.int32)
    starts = all_out[:, r]  # where sender i's chunk lands in MY buffer
    sizes = all_send[:, r]  # how much sender i sends me
    in_win = (p[None, :] >= starts[:, None]) & (
        p[None, :] < (starts + sizes)[:, None]
    )  # [n, C]; windows are disjoint for well-formed calls
    sender = jnp.argmax(in_win, axis=0)
    valid = jnp.any(in_win, axis=0)
    src = all_in[sender, r] + (p - starts[sender])
    rows = all_op[sender, jnp.clip(src, 0, all_op.shape[1] - 1)]
    mask = valid.reshape((c,) + (1,) * (output.ndim - 1))
    return jnp.where(mask, rows, output)
