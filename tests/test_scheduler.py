"""Scheduler behavior tests: prefill priority, chunking, preemption, finish."""

from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence, SequenceStatus
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams


def make_scheduler(num_blocks=64, block_size=16, chunk=32, max_seqs=8,
                   budget=256, eos=2, prefix_cache=True, steps=1):
    cfg = Config(
        model="",
        model_config=ModelConfig(max_position_embeddings=4096),
        max_num_batched_tokens=budget,
        max_num_seqs=max_seqs,
        max_model_len=512,
        kvcache_block_size=block_size,
        num_kvcache_blocks=num_blocks,
        prefill_chunk_size=chunk,
        enable_prefix_caching=prefix_cache,
        num_scheduler_steps=steps,
        eos=eos,
    )
    return Scheduler(cfg)


def seq_of(n_tokens, max_tokens=8, ignore_eos=True):
    return Sequence(
        list(range(3, 3 + n_tokens)),
        SamplingParams(temperature=0.0, max_tokens=max_tokens, ignore_eos=ignore_eos),
    )


def test_prefill_then_decode():
    s = make_scheduler()
    a, b = seq_of(10), seq_of(20)
    s.add(a), s.add(b)
    batch = s.schedule()
    assert batch.is_prefill
    assert batch.seqs == [a, b]
    # length grouping: a (head) sets the step's 16-token len bucket, so b's
    # 20-token prompt chunks down to the cap and continues next step
    assert batch.q_lens == [10, 16]
    s.postprocess(batch, [100, 101])
    assert a.token_ids[-1] == 100
    assert b.num_computed_tokens == 16 and len(b.token_ids) == 20
    batch1b = s.schedule()
    assert batch1b.is_prefill and batch1b.seqs == [b] and batch1b.q_lens == [4]
    s.postprocess(batch1b, [101])
    assert b.token_ids[-1] == 101
    batch2 = s.schedule()
    assert not batch2.is_prefill
    assert batch2.q_lens == [1, 1]
    assert batch2.num_steps == 1
    s.postprocess(batch2, [[102], [103]])
    assert a.num_completion_tokens == 2


def test_prefill_len_grouping_defers_short_seqs():
    # head (60 tokens -> 64 bucket) anchors the step; the 10-token seq is
    # deferred while the 50-token seq shares the bucket; next step runs the
    # short one alone in its own 16 bucket
    s = make_scheduler(chunk=64)
    # distinct token streams: shared prefixes would legitimately shrink the
    # later seqs' query spans via the prefix-cache probe
    long1 = Sequence(list(range(100, 160)), SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    short = Sequence(list(range(300, 310)), SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    long2 = Sequence(list(range(500, 550)), SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    for x in (long1, short, long2):
        s.add(x)
    b1 = s.schedule()
    assert b1.is_prefill and b1.seqs == [long1, long2]
    assert b1.q_lens == [60, 50]
    assert short.status == SequenceStatus.WAITING
    s.postprocess(b1, [0, 0])
    b2 = s.schedule()
    assert b2.is_prefill and b2.seqs == [short] and b2.q_lens == [10]
    s.postprocess(b2, [0])
    b3 = s.schedule()
    assert not b3.is_prefill and len(b3.seqs) == 3


def test_prefill_len_grouping_off_restores_fcfs():
    s = make_scheduler()
    s.prefill_len_grouping = False
    a, b = seq_of(10), seq_of(20)
    s.add(a), s.add(b)
    batch = s.schedule()
    assert batch.q_lens == [10, 20]


def test_chunked_prefill_long_prompt():
    s = make_scheduler(chunk=32)
    a = seq_of(80)
    s.add(a)
    b1 = s.schedule()
    assert b1.is_prefill and b1.q_lens == [32]
    s.postprocess(b1, [0])
    assert a.num_computed_tokens == 32
    assert len(a.token_ids) == 80  # no token sampled mid-prompt
    b2 = s.schedule()
    assert b2.q_lens == [32]
    s.postprocess(b2, [0])
    b3 = s.schedule()
    assert b3.q_lens == [16]  # final chunk
    s.postprocess(b3, [55])
    assert a.token_ids[-1] == 55
    assert a.num_remaining_tokens == 1
    b4 = s.schedule()
    assert not b4.is_prefill


def test_token_budget_bounds_admission():
    s = make_scheduler(budget=64, chunk=64)
    a, b, c = seq_of(40), seq_of(40), seq_of(40)
    for x in (a, b, c):
        s.add(x)
    batch = s.schedule()
    assert batch.seqs == [a]  # 40+40 > 64
    assert batch.q_lens == [40]


def test_eos_finishes_sequence():
    s = make_scheduler(eos=2)
    a = seq_of(4, max_tokens=100, ignore_eos=False)
    s.add(a)
    s.postprocess(s.schedule(), [7])
    s.postprocess(s.schedule(), [[2]])  # EOS
    assert a.is_finished
    assert s.is_finished()


def test_max_tokens_finishes_sequence():
    s = make_scheduler()
    a = seq_of(4, max_tokens=2, ignore_eos=True)
    s.add(a)
    s.postprocess(s.schedule(), [7])
    s.postprocess(s.schedule(), [[7]])
    assert a.is_finished


def test_preemption_under_block_pressure():
    # 4 blocks of 16 tokens; two seqs of 30 tokens (2 blocks each) fill it.
    s = make_scheduler(num_blocks=4, block_size=16, chunk=64, prefix_cache=False)
    a, b = seq_of(30, max_tokens=64), seq_of(30, max_tokens=64)
    s.add(a), s.add(b)
    s.postprocess(s.schedule(), [9, 9])  # both prefilled: len 31 each
    # decode to len 32 (fills block 2), then 33 -> each needs a 3rd block; none
    # free -> tail preemption must kick in.
    s.postprocess(s.schedule(), [[9], [9]])  # len 32
    s.postprocess(s.schedule(), [[9], [9]])  # len 33: next write needs block 3
    batch = s.schedule()  # needs new blocks
    assert len(batch.seqs) == 1  # one seq preempted
    assert len(s.waiting) == 1
    preempted = s.waiting[0]
    assert preempted.status == SequenceStatus.WAITING
    assert preempted.num_computed_tokens == 0
    assert preempted.block_table == []


def test_preempted_seq_recomputes_all_tokens():
    s = make_scheduler(num_blocks=64, chunk=64, prefix_cache=False)
    a = seq_of(10, max_tokens=64)
    s.add(a)
    s.postprocess(s.schedule(), [9])
    s.postprocess(s.schedule(), [[9]])  # len 12
    s.preempt(a)
    batch = s.schedule()
    assert batch.is_prefill
    assert batch.q_lens == [12]  # prompt + generated tokens recomputed


def test_scheduler_output_order_is_stable():
    s = make_scheduler()
    seqs = [seq_of(5) for _ in range(4)]
    for x in seqs:
        s.add(x)
    s.postprocess(s.schedule(), [0, 0, 0, 0])
    batch = s.schedule()
    assert batch.seqs == seqs  # decode preserves running order


def test_multi_step_decode_window():
    s = make_scheduler(steps=8)
    a = seq_of(10, max_tokens=20)
    s.add(a)
    s.postprocess(s.schedule(), [0])  # prefill, len 11
    b = s.schedule()
    assert not b.is_prefill and b.num_steps == 8
    s.postprocess(b, [[1, 2, 3, 4, 5, 6, 7, 8]])
    assert a.num_completion_tokens == 9
    assert a.num_remaining_tokens == 1


def test_multi_step_truncates_past_eos():
    s = make_scheduler(steps=8, eos=2)
    a = seq_of(4, max_tokens=100, ignore_eos=False)
    s.add(a)
    s.postprocess(s.schedule(), [7])
    b = s.schedule()
    s.postprocess(b, [[9, 2, 9, 9, 9, 9, 9, 9]])  # EOS at window step 2
    assert a.is_finished
    assert a.completion_token_ids == [7, 9, 2]


def test_multi_step_truncates_past_max_tokens():
    s = make_scheduler(steps=8)
    a = seq_of(4, max_tokens=3, ignore_eos=True)
    s.add(a)
    s.postprocess(s.schedule(), [7])
    b = s.schedule()
    s.postprocess(b, [[1, 2, 3, 4, 5, 6, 7, 8]])
    assert a.is_finished
    assert a.completion_token_ids == [7, 1, 2]
