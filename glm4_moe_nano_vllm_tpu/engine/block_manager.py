"""Paged KV-cache block manager with hash-based prefix caching.

Host-side bookkeeping only — device memory is one big jax array owned by the
model runner; this class hands out block indices into it.

Behavioral parity with the reference block manager
(`/root/reference/nanovllm/engine/block_manager.py:26-113`):
  * ref-counted blocks, free-list allocation;
  * chained xxhash64 over full 256-token blocks for prefix-cache lookup
    (compute_hash at block_manager.py:35-41);
  * cache-hit detection guarded by a token-ID comparison so hash collisions
    can never change logits (block_manager.py:67);
  * ``may_append`` block-boundary cases (new block on len%bs==1, seal hash on
    len%bs==0; block_manager.py:96-113).

Differences: allocation caps prefix-cache reuse at ``len(seq)-1`` tokens so a
fully-cached prompt still produces one query token (and therefore logits); the
reference would schedule an empty prefill in that case.
"""

from __future__ import annotations

import numpy as np
import xxhash

from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: list[int] = []


def hash_block_tokens(token_ids: list[int], prefix_hash: int = -1) -> int:
    """Chained 64-bit hash over one full block of token ids."""
    h = xxhash.xxh64()
    if prefix_hash != -1:
        h.update(prefix_hash.to_bytes(8, "little"))
    h.update(np.asarray(token_ids, dtype=np.int64).tobytes())
    return h.intdigest()


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int, enable_prefix_caching: bool = True):
        assert num_blocks > 0
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        self.blocks = [Block(i) for i in range(num_blocks)]
        self.hash_to_block_id: dict[int, int] = {}
        # Free "list" is an insertion-ordered dict (FIFO eviction of cached
        # blocks, like the reference's deque) with O(1) removal by id — a
        # deque's .remove() is O(n), which bites at 100k+ HBM blocks.
        # Evicted-but-cached blocks stay in the hash map and can be
        # resurrected until their id is re-allocated.
        self.free_block_ids: dict[int, None] = dict.fromkeys(range(num_blocks))
        self.used_block_ids: set[int] = set()

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    def _peek_free_id(self) -> int:
        """Oldest free block id (NOT removed — ``_take_block`` deletes it)."""
        return next(iter(self.free_block_ids))

    def _take_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        assert block.ref_count == 0
        block.ref_count = 1
        block.hash = -1
        block.token_ids = []
        del self.free_block_ids[block_id]
        self.used_block_ids.add(block_id)
        return block

    def _release_block(self, block_id: int) -> None:
        assert self.blocks[block_id].ref_count == 0
        self.used_block_ids.remove(block_id)
        self.free_block_ids[block_id] = None

    def can_allocate(self, seq: Sequence) -> bool:
        return self.num_free_blocks >= seq.num_blocks

    def allocate(self, seq: Sequence) -> None:
        """Assign blocks covering the whole prompt, reusing cached prefixes."""
        assert not seq.block_table
        prefix_hash = -1
        cache_hit = self.enable_prefix_caching
        for i in range(seq.num_blocks):
            token_ids = seq.block(i)
            full = len(token_ids) == self.block_size
            prefix_hash = hash_block_tokens(token_ids, prefix_hash) if full else -1
            cached_id = self.hash_to_block_id.get(prefix_hash, -1) if cache_hit else -1
            if cached_id != -1 and self.blocks[cached_id].token_ids == token_ids:
                # genuine hit (token ids verified against hash collisions)
                seq.num_cached_tokens += self.block_size
                if cached_id in self.used_block_ids:
                    self.blocks[cached_id].ref_count += 1
                else:
                    block = self._take_block(cached_id)
                    block.hash = prefix_hash
                    block.token_ids = token_ids
                block_id = cached_id
            else:
                cache_hit = False  # a miss breaks the chain for later blocks
                block_id = self._peek_free_id()
                block = self._take_block(block_id)
                if full and self.enable_prefix_caching:
                    block.hash = prefix_hash
                    block.token_ids = token_ids
                    self.hash_to_block_id[prefix_hash] = block_id
            seq.block_table.append(block_id)
        # A fully-cached prompt must still compute >=1 query token for logits.
        seq.num_computed_tokens = min(seq.num_cached_tokens, len(seq) - 1)

    def probe_cached_tokens(self, seq: Sequence) -> int:
        """Read-only prefix-cache probe: leading tokens allocate() would hit.

        Mirrors allocate()'s hit detection (hash chain + token-id collision
        check) without taking blocks. The scheduler uses it to length-group
        prefill admissions by their *actual* query span — a fully-cached
        prompt's chunk is one block, not its full length."""
        if not self.enable_prefix_caching:
            return 0
        cached = 0
        prefix_hash = -1
        for i in range(seq.num_blocks):
            token_ids = seq.block(i)
            if len(token_ids) != self.block_size:
                break
            prefix_hash = hash_block_tokens(token_ids, prefix_hash)
            cached_id = self.hash_to_block_id.get(prefix_hash, -1)
            if cached_id == -1 or self.blocks[cached_id].token_ids != token_ids:
                break
            cached += self.block_size
        return min(cached, len(seq) - 1)

    def deallocate(self, seq: Sequence) -> None:
        for block_id in reversed(seq.block_table):
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._release_block(block_id)
        seq.num_cached_tokens = 0
        seq.num_computed_tokens = 0
        seq.block_table.clear()

    # ---- decode-window capacity (multi-step generalization of the
    # reference's can_append/may_append pair, block_manager.py:93-113) -------

    def blocks_needed(self, seq: Sequence, n_tokens: int) -> int:
        """Blocks to add so the next ``n_tokens`` decode steps can write KV.

        Step s writes KV for position len-1+s, so capacity must cover
        len + n - 1 tokens.
        """
        total = len(seq) + n_tokens - 1
        need = (total + self.block_size - 1) // self.block_size
        return max(0, need - len(seq.block_table))

    def can_append(self, seq: Sequence, n_tokens: int = 1) -> bool:
        return self.num_free_blocks >= self.blocks_needed(seq, n_tokens)

    def may_append(self, seq: Sequence, n_tokens: int = 1) -> None:
        """Extend the block table to cover an n-token decode window."""
        for _ in range(self.blocks_needed(seq, n_tokens)):
            block_id = self._peek_free_id()
            self._take_block(block_id)
            seq.block_table.append(block_id)

    def seal_if_full(self, seq: Sequence) -> None:
        """After appending a token: if it filled a block, seal that block with
        its chained hash for prefix-cache reuse (reference semantics at
        block_manager.py:104-110, moved from schedule-time to append-time so
        multi-token windows seal correctly)."""
        if not self.enable_prefix_caching or len(seq) % self.block_size != 0:
            return
        idx = len(seq) // self.block_size - 1
        block = self.blocks[seq.block_table[idx]]
        if block.hash != -1:
            return  # already sealed (e.g. prefix-cache hit)
        prefix = self.blocks[seq.block_table[idx - 1]].hash if idx > 0 else -1
        token_ids = seq.block(idx)
        h = hash_block_tokens(token_ids, prefix)
        block.hash = h
        block.token_ids = token_ids
        self.hash_to_block_id[h] = block.block_id
