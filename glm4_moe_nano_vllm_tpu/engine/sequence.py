"""Request state machine.

Capability-parity with the reference ``Sequence``
(`/root/reference/nanovllm/engine/sequence.py:14-83`): WAITING/RUNNING/FINISHED
states, token-id accumulation, block-table arithmetic. Additions for the TPU
design: ``num_computed_tokens`` tracks how many tokens have their KV written to
the paged cache, which is what chunked prefill schedules against (the reference
prefills whole prompts in one step and so never needs it).
"""

from __future__ import annotations

import enum
from itertools import count

from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    FINISHED = enum.auto()


class Sequence:
    counter = count()

    def __init__(
        self,
        token_ids: list[int],
        sampling_params: SamplingParams | None = None,
        block_size: int = 256,
    ):
        sp = sampling_params or SamplingParams()
        self.seq_id = next(Sequence.counter)
        self.status = SequenceStatus.WAITING
        self.token_ids = list(token_ids)
        self.num_prompt_tokens = len(token_ids)
        self.num_cached_tokens = 0  # prefix-cache hits at allocation time
        self.num_computed_tokens = 0  # tokens with KV materialized in cache
        self.block_table: list[int] = []
        self.block_size = block_size
        self.temperature = sp.temperature
        self.max_tokens = sp.max_tokens
        self.ignore_eos = sp.ignore_eos
        # set when the engine finishes the sequence abnormally (e.g. the
        # prompt or context outgrew KV-cache capacity); the reference instead
        # dies on an assert deep in its scheduler
        self.error: str | None = None

    def __len__(self) -> int:
        return len(self.token_ids)

    def __getitem__(self, key):
        return self.token_ids[key]

    @property
    def num_tokens(self) -> int:
        return len(self.token_ids)

    @property
    def last_token(self) -> int:
        return self.token_ids[-1]

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self) -> int:
        return self.num_tokens - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens:]

    @property
    def num_remaining_tokens(self) -> int:
        """Tokens not yet computed into the KV cache.

        Invariant between steps: 1 for decode-ready sequences (the last token's
        KV is computed by the next decode step), >1 for sequences still being
        prefilled (including preempted sequences recomputing prompt+generated).
        """
        return len(self.token_ids) - self.num_computed_tokens

    @property
    def prompt_done(self) -> bool:
        """True once the sequence is decode-ready (only the last token pends)."""
        return self.num_remaining_tokens <= 1

    @property
    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    @property
    def num_blocks(self) -> int:
        return (self.num_tokens + self.block_size - 1) // self.block_size

    @property
    def last_block_num_tokens(self) -> int:
        return self.num_tokens - (self.num_blocks - 1) * self.block_size

    def block(self, i: int) -> list[int]:
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size: (i + 1) * self.block_size]

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)
