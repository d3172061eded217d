"""Fixed-shape device batch descriptor.

TPU-native replacement for the reference's global forward context
(`/root/reference/nanovllm/utils/context.py:5-14`: is_prefill, cu_seqlens,
slot_mapping, context_lens, block_tables) and the prepare_prefill /
prepare_decode buffers (`model_runner.py:133-187`). Instead of mutable global
state + flat varlen tensors, the batch is an explicit pytree of padded,
bucket-shaped arrays passed through the jitted step — every array shape is a
function of the (num_seqs, q_len, max_blocks) bucket, so XLA compiles one
program per bucket (the reference needs CUDA graphs for the same effect,
`model_runner.py:223-258`).

Padding conventions:
  * padded query tokens have ``slot_mapping == -1`` (scatter no-op, same as
    the reference's -1 convention at attention.py:23);
  * padded sequences have ``context_lens == 0`` so attention masks all KV;
  * ``positions`` of padding are 0 (masked out anyway).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax


@jax.tree_util.register_dataclass
@dataclass
class BatchInfo:
    token_ids: jax.Array  # [B, S_q] int32
    positions: jax.Array  # [B, S_q] int32, global position of each q token
    slot_mapping: jax.Array  # [B * S_q] int32, -1 = pad
    block_tables: jax.Array  # [B, max_blocks] int32, 0-padded
    context_lens: jax.Array  # [B] int32: KV length incl. this step's tokens
    last_q_idx: jax.Array  # [B] int32: index in [0, S_q) of each seq's last real token
    temperatures: jax.Array  # [B] float32 (0 = greedy)

    @property
    def num_seqs(self) -> int:
        return self.token_ids.shape[0]

    @property
    def q_len(self) -> int:
        return self.token_ids.shape[1]
