"""Continuous-batching scheduler: prefill priority, tail preemption, chunking.

Parity with the reference scheduler
(`/root/reference/nanovllm/engine/scheduler.py:24-71`):
  * prefill-first admission from the waiting queue under a token budget and
    block availability (scheduler.py:29-41);
  * decode batches over the running queue with ``may_append`` bookkeeping and
    tail preemption under block pressure (scheduler.py:44-58);
  * postprocess appends the sampled token and finishes on EOS / max_tokens
    (scheduler.py:65-71).

TPU-specific addition: **chunked prefill**. One XLA program has a fixed shape,
so a long prompt is prefilled in ``prefill_chunk_size`` slices; a sequence
whose prompt is partially computed stays at the head of the prefill phase
until done. The reference prefills whole prompts in a single step
(scheduler.py:31 admits only if the full length fits the budget).
"""

from __future__ import annotations

import bisect
from collections import deque
from dataclasses import dataclass

from glm4_moe_nano_vllm_tpu.config import Config
from glm4_moe_nano_vllm_tpu.engine.block_manager import BlockManager
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence, SequenceStatus


def _bucket_of(n: int, buckets: tuple) -> int:
    """Smallest bucket >= n (last bucket if n exceeds all); host-pure twin
    of model_runner.bucket_of (this module must not import jax)."""
    i = bisect.bisect_left(buckets, n)
    return buckets[min(i, len(buckets) - 1)]


@dataclass
class ScheduledBatch:
    seqs: list[Sequence]
    is_prefill: bool
    # per-seq number of query tokens this step (prefill only; decode is all 1s)
    q_lens: list[int]
    # decode window: tokens generated per sequence in one device program
    # (multi-step scheduling amortizes the host<->device round trip)
    num_steps: int = 1
    # per-row absolute start position (sequence-parallel prefill schedules
    # several chunks of one prompt as sibling rows in the same step; rows of
    # the same seq then have different starts). None = num_computed_tokens.
    q_starts: list[int] | None = None

    @property
    def num_tokens(self) -> int:
        return sum(self.q_lens) * (1 if self.is_prefill else self.num_steps)


class Scheduler:
    def __init__(self, config: Config):
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.prefill_chunk_size = (
            config.prefill_chunk_size
            if config.enable_chunked_prefill
            else config.max_model_len
        )
        self.eos = config.eos
        self.max_model_len = config.max_model_len
        self.num_decode_steps = config.num_scheduler_steps
        self.prefill_sp_degree = max(1, config.prefill_sp_degree)
        self.prefill_len_grouping = config.prefill_len_grouping
        self.prefill_len_buckets = config.prefill_len_buckets
        self.block_manager = BlockManager(
            config.num_kvcache_blocks,
            config.kvcache_block_size,
            config.enable_prefix_caching,
        )
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        # sequences finished abnormally since the last step() drained them
        self.just_failed: list[Sequence] = []
        self.metrics = None  # optionally set by the engine

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def has_unfinished(self) -> bool:
        return not self.is_finished()

    def add(self, seq: Sequence) -> None:
        seq.block_size = self.block_manager.block_size
        self.waiting.append(seq)

    def fail(self, seq: Sequence, reason: str) -> None:
        """Finish a sequence abnormally (capacity exhaustion) instead of
        crashing the engine — the reference asserts instead
        (its scheduler has no over-capacity story)."""
        seq.error = reason
        seq.status = SequenceStatus.FINISHED
        if seq.block_table:
            self.block_manager.deallocate(seq)
        if seq in self.running:
            self.running.remove(seq)
        if seq in self.waiting:
            self.waiting.remove(seq)
        self.just_failed.append(seq)

    def schedule(self) -> ScheduledBatch | None:
        """One scheduling decision; ``None`` when every request failed on
        capacity and nothing is left to run."""
        while True:
            batch = self._try_schedule()
            if batch is not None:
                return batch
            if self.is_finished():
                return None

    def _try_schedule(self) -> ScheduledBatch | None:
        # ---- prefill phase -------------------------------------------------
        scheduled: list[Sequence] = []
        q_lens: list[int] = []
        q_starts: list[int] = []
        budget = self.max_num_batched_tokens

        # Length grouping: prefill programs are [B, S]-padded, so one long
        # row pads EVERY row to its len bucket. The first emitted row fixes
        # the step's bucket; longer prompts chunk down to it and shorter
        # waiting prompts are deferred to a later step (the queue head
        # anchors the bucket, so deferral cannot starve).
        step_cap: list = [None]

        def cap_q(q: int) -> int:
            if not self.prefill_len_grouping:
                return q
            if step_cap[0] is None:
                step_cap[0] = _bucket_of(q, self.prefill_len_buckets)
            return min(q, step_cap[0])

        def emit_rows(seq, budget):
            """Schedule up to ``prefill_sp_degree`` chunk rows of one prompt in
            this step (sequence-parallel prefill: sibling rows attend each
            other's same-step KV writes via the global-position causal mask,
            and dp shards rows over devices)."""
            start = seq.num_computed_tokens
            remaining = seq.num_remaining_tokens
            rows = 0
            bs = self.block_manager.block_size
            while (remaining > 0 and budget > 0 and rows < self.prefill_sp_degree
                   and len(scheduled) < self.max_num_seqs):
                q = cap_q(min(remaining, self.prefill_chunk_size, budget))
                if self.prefill_sp_degree > 1 and q < remaining:
                    # non-final sibling chunks must end on a block boundary:
                    # same-step rows may not share a KV block (the Pallas
                    # write kernel RMWs whole blocks; see config.py assert)
                    q = q // bs * bs
                    if q == 0:
                        break
                scheduled.append(seq)
                q_lens.append(q)
                q_starts.append(start)
                start += q
                remaining -= q
                budget -= q
                rows += 1
            return budget

        # Continuation chunks for partially-prefilled running seqs first.
        for seq in self.running:
            if len(scheduled) >= self.max_num_seqs or budget <= 0:
                break
            if not seq.prompt_done:
                budget = emit_rows(seq, budget)

        # Fresh admissions from the waiting queue (FCFS, head-anchored; with
        # length grouping, seqs whose chunk is shorter than the step's bucket
        # are skipped — they stay waiting and set their own bucket once they
        # reach the head).
        idx = 0
        while (self.waiting and idx < len(self.waiting) and budget > 0
               and len(self.running) < self.max_num_seqs
               and len(scheduled) < self.max_num_seqs):
            seq = self.waiting[idx]
            if not self.block_manager.can_allocate(seq):
                # +1 block so a prompt that exactly fills the cache still has
                # a slot for its first generated token
                if self._blocks_for(len(seq) + 1) > self.block_manager.num_blocks:
                    self.fail(seq, "prompt larger than total KV-cache capacity")
                    return None  # retry scheduling without it
                if not self.running and not scheduled:
                    # nothing can ever free more blocks (cached-but-free
                    # blocks already count as free)
                    self.fail(seq, "prompt does not fit in free KV-cache blocks")
                    return None
                break
            q_est = len(seq) - self.block_manager.probe_cached_tokens(seq)
            # Admission requires room for at least one full chunk (or the whole
            # short prompt) so tiny leftover budgets don't shred prompts.
            if min(q_est, self.prefill_chunk_size) > budget:
                break
            if (self.prefill_len_grouping and step_cap[0] is not None
                    and _bucket_of(min(q_est, step_cap[0]),
                                   self.prefill_len_buckets) < step_cap[0]):
                idx += 1
                continue
            self.block_manager.allocate(seq)
            # prefix-cache hits shrink this chunk's query span
            seq.status = SequenceStatus.RUNNING
            del self.waiting[idx]
            self.running.append(seq)
            budget = emit_rows(seq, budget)
        if scheduled:
            return ScheduledBatch(scheduled, is_prefill=True, q_lens=q_lens,
                                  q_starts=q_starts)

        # ---- decode phase --------------------------------------------------
        # Window size: the largest power-of-two (bounded compile set) that
        # fits every sequence's context-window headroom. Tokens generated
        # past a sequence's EOS / max_tokens are truncated in postprocess.
        n = self.num_decode_steps
        for seq in self.running:
            n = min(n, self.max_model_len - len(seq))
        n = max(1, n)
        while n & (n - 1):
            n &= n - 1  # round down to a power of two

        num = 0
        while self.running and num < self.max_num_seqs:
            seq = self.running.popleft()
            while not self.block_manager.can_append(seq, n):
                if self.running:
                    self.preempt(self.running.pop())
                elif n > 1:
                    n = 1  # shrink the decode window before preempting/failing
                elif self._blocks_for(len(seq) + 1) > self.block_manager.num_blocks:
                    # alone with every block available it still can't extend:
                    # preempting would livelock (re-prefill, fail again)
                    self.fail(seq, "context outgrew total KV-cache capacity")
                    break
                else:
                    self.preempt(seq)
                    break
            else:
                num += 1
                self.block_manager.may_append(seq, n)
                scheduled.append(seq)
        self.running.extendleft(reversed(scheduled))
        if not scheduled:
            return None  # retry (preempted seqs re-prefill; failed are gone)
        return ScheduledBatch(scheduled, is_prefill=False,
                              q_lens=[1] * len(scheduled), num_steps=n)

    def _blocks_for(self, n_tokens: int) -> int:
        bs = self.block_manager.block_size
        return (n_tokens + bs - 1) // bs

    def preempt(self, seq: Sequence) -> None:
        if self.metrics is not None:
            self.metrics.num_preemptions += 1
        if seq in self.running:
            self.running.remove(seq)
        seq.status = SequenceStatus.WAITING
        self.block_manager.deallocate(seq)
        self.waiting.appendleft(seq)

    def postprocess(self, batch: ScheduledBatch, token_ids: list[int]) -> None:
        """Advance state after a step.

        Prefill steps advance ``num_computed_tokens``; the final prompt chunk
        also yields a sampled token. Decode steps always yield a token.
        """
        if batch.is_prefill:
            for seq, q, token_id in zip(batch.seqs, batch.q_lens, token_ids):
                seq.num_computed_tokens += q
                if seq.num_remaining_tokens == 0:
                    # final chunk: sampled from the last token's logits
                    self._append_and_maybe_finish(seq, token_id)
        else:
            # decode: token_ids is a per-seq list of num_steps tokens;
            # tokens past EOS / max_tokens are discarded
            for seq, toks in zip(batch.seqs, token_ids):
                for token_id in toks:
                    if seq.is_finished:
                        break
                    seq.num_computed_tokens += 1
                    self._append_and_maybe_finish(seq, token_id)

    def _append_and_maybe_finish(self, seq: Sequence, token_id: int) -> None:
        seq.append_token(token_id)
        self.block_manager.seal_if_full(seq)
        if (
            (not seq.ignore_eos and token_id == self.eos)
            or seq.num_completion_tokens >= seq.max_tokens
            or len(seq) >= self.max_model_len  # context-window cap
        ):
            seq.status = SequenceStatus.FINISHED
            self.block_manager.deallocate(seq)
            self.running.remove(seq)
