"""Invariant tests for the block manager (the reference has none, SURVEY §4)."""

from glm4_moe_nano_vllm_tpu.engine.block_manager import BlockManager, hash_block_tokens
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

BS = 16  # small block size for test speed


def make_seq(tokens, block_size=BS):
    return Sequence(tokens, SamplingParams(), block_size=block_size)


def test_allocate_deallocate_roundtrip():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = make_seq(list(range(40)))  # 3 blocks (2 full + partial)
    assert bm.can_allocate(seq)
    bm.allocate(seq)
    assert len(seq.block_table) == 3
    assert bm.num_free_blocks == 5
    bm.deallocate(seq)
    assert bm.num_free_blocks == 8
    assert seq.block_table == []
    assert seq.num_computed_tokens == 0


def test_prefix_cache_hit_shares_blocks():
    bm = BlockManager(num_blocks=16, block_size=BS)
    prompt = list(range(BS * 2))  # two full blocks
    a = make_seq(prompt + [100])
    b = make_seq(prompt + [200])
    bm.allocate(a)
    bm.allocate(b)
    assert b.num_cached_tokens == BS * 2
    assert a.block_table[:2] == b.block_table[:2]
    assert a.block_table[2] != b.block_table[2]
    # shared blocks are refcounted
    shared = bm.blocks[a.block_table[0]]
    assert shared.ref_count == 2
    bm.deallocate(a)
    assert shared.ref_count == 1
    bm.deallocate(b)
    assert shared.ref_count == 0


def test_fully_cached_prompt_still_computes_last_token():
    bm = BlockManager(num_blocks=16, block_size=BS)
    prompt = list(range(BS * 2))
    a = make_seq(prompt)
    bm.allocate(a)
    b = make_seq(prompt)
    bm.allocate(b)
    assert b.num_cached_tokens == BS * 2
    # capped so at least one query token exists
    assert b.num_computed_tokens == BS * 2 - 1
    assert b.num_remaining_tokens == 1


def test_cache_resurrection_after_deallocate():
    bm = BlockManager(num_blocks=16, block_size=BS)
    prompt = list(range(BS))
    a = make_seq(prompt + [1])
    bm.allocate(a)
    bm.deallocate(a)
    b = make_seq(prompt + [2])
    bm.allocate(b)
    # freed-but-unclobbered block is resurrected from the hash map
    assert b.num_cached_tokens == BS


def test_hash_collision_guard():
    """A stale hash entry whose tokens differ must not produce a hit."""
    bm = BlockManager(num_blocks=16, block_size=BS)
    prompt = list(range(BS))
    a = make_seq(list(prompt))
    bm.allocate(a)
    # poison: rewrite the cached block's recorded tokens
    bm.blocks[a.block_table[0]].token_ids = [999] * BS
    b = make_seq(list(prompt))
    bm.allocate(b)
    assert b.num_cached_tokens == 0
    assert b.block_table[0] != a.block_table[0]


def test_chained_hash_depends_on_prefix():
    h1 = hash_block_tokens([1, 2, 3], -1)
    h2 = hash_block_tokens([1, 2, 3], 42)
    assert h1 != h2


def test_append_seal_and_extend_boundaries():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = make_seq(list(range(BS - 1)))
    bm.allocate(seq)
    assert len(seq.block_table) == 1
    # append token -> len == BS: block fills, gets sealed with a hash
    seq.append_token(7)
    bm.seal_if_full(seq)
    assert bm.blocks[seq.block_table[-1]].hash != -1
    # next step writes KV for position BS-1 (the appended token): still fits
    assert bm.blocks_needed(seq, 1) == 0
    # append another -> len BS+1: next step writes position BS -> new block
    seq.append_token(8)
    bm.seal_if_full(seq)
    assert bm.blocks_needed(seq, 1) == 1
    bm.may_append(seq, 1)
    assert len(seq.block_table) == 2
    assert bm.blocks[seq.block_table[-1]].hash == -1


def test_can_append_only_needs_block_at_boundary():
    bm = BlockManager(num_blocks=1, block_size=BS)
    seq = make_seq(list(range(BS - 2)))
    bm.allocate(seq)
    assert bm.num_free_blocks == 0
    seq.append_token(1)  # len = BS-1; next step writes position BS-2 (fits)
    assert bm.can_append(seq, 1)
    seq.append_token(2)  # len = BS; next step writes position BS-1 (fits)
    assert bm.can_append(seq, 1)
    seq.append_token(3)  # len = BS+1; next step writes position BS -> new block
    assert not bm.can_append(seq, 1)


def test_multi_step_window_capacity():
    bm = BlockManager(num_blocks=8, block_size=BS)
    seq = make_seq(list(range(BS - 2)))  # 14 tokens, 1 block
    bm.allocate(seq)
    # window of 8: writes positions 13..20 -> needs ceil(21/16)=2 blocks
    assert bm.blocks_needed(seq, 8) == 1
    bm.may_append(seq, 8)
    assert len(seq.block_table) == 2
    # window of BS+4: positions 13..32 -> ceil(33/16)=3 blocks -> 1 more
    assert bm.blocks_needed(seq, BS + 4) == 1


def test_prefix_caching_disabled():
    bm = BlockManager(num_blocks=16, block_size=BS, enable_prefix_caching=False)
    prompt = list(range(BS * 2))
    a = make_seq(list(prompt))
    bm.allocate(a)
    b = make_seq(list(prompt))
    bm.allocate(b)
    assert b.num_cached_tokens == 0
    assert set(a.block_table).isdisjoint(b.block_table)
