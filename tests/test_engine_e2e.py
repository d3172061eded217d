"""End-to-end engine tests on a tiny random-weight model (CPU backend).

Exercises the full stack: scheduler → block manager → runner prepare →
jitted forward (paged attention, KV scatter) → sampler → postprocess.
"""

import numpy as np
import pytest

from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig
from glm4_moe_nano_vllm_tpu.engine.llm_engine import LLMEngine
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

TINY = ModelConfig(
    architecture="qwen3",
    vocab_size=128,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=2048,
    tie_word_embeddings=True,
    eos_token_id=0,
)

TINY_MOE = ModelConfig(
    architecture="glm4_moe",
    vocab_size=128,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=2048,
    partial_rotary_factor=0.5,
    use_qk_norm=True,
    attention_bias=True,
    tie_word_embeddings=True,
    eos_token_id=0,
    n_routed_experts=8,
    num_experts_per_tok=2,
    moe_intermediate_size=32,
    n_shared_experts=1,
    first_k_dense_replace=1,
    routed_scaling_factor=1.5,
)


def make_engine(mc, **kw):
    defaults = dict(
        model="",
        model_config=mc,
        max_num_batched_tokens=512,
        max_num_seqs=8,
        max_model_len=256,
        kvcache_block_size=16,
        num_kvcache_blocks=128,
        prefill_chunk_size=64,
        enforce_eager=True,
        dtype="float32",
        kv_cache_dtype="float32",
        decode_buckets=(1, 2, 4, 8),
        prefill_seq_buckets=(1, 2, 4, 8),
        prefill_len_buckets=(16, 32, 64),
    )
    defaults.update(kw)
    return LLMEngine(**defaults)


@pytest.fixture(scope="module")
def engine():
    return make_engine(TINY)


def gen(engine, prompts, **sp):
    params = SamplingParams(**{"temperature": 0.0, "max_tokens": 8, **sp})
    outs = engine.generate(prompts, params, use_tqdm=False)
    return [o["token_ids"] for o in outs]


def test_greedy_generation_runs(engine):
    outs = gen(engine, [[1, 2, 3, 4], [5, 6, 7]], ignore_eos=True)
    assert len(outs) == 2
    assert all(len(o) == 8 for o in outs)
    assert all(0 <= t < TINY.vocab_size for o in outs for t in o)


def test_greedy_is_deterministic_and_batch_invariant(engine):
    a = gen(engine, [[1, 2, 3, 4]], ignore_eos=True)[0]
    b = gen(engine, [[1, 2, 3, 4], [9, 8, 7, 6, 5]], ignore_eos=True)[0]
    assert a == b, "same prompt must decode identically regardless of batching"


def test_prefix_cache_does_not_change_output(engine):
    prompt = list(range(1, 40))  # spans 2 full blocks of 16
    first = gen(engine, [prompt], ignore_eos=True)[0]
    again = gen(engine, [prompt], ignore_eos=True)[0]  # now prefix-cached
    assert first == again


def test_chunked_prefill_matches_single_shot():
    long_prompt = [(i * 7) % 120 + 1 for i in range(150)]  # > chunk 64
    e_chunked = make_engine(TINY, prefill_chunk_size=64)
    e_whole = make_engine(TINY, prefill_chunk_size=256, max_num_batched_tokens=512)
    a = gen(e_chunked, [long_prompt], ignore_eos=True)[0]
    b = gen(e_whole, [long_prompt], ignore_eos=True)[0]
    assert a == b


def test_sampled_generation_with_temperature(engine):
    outs = gen(engine, [[1, 2, 3]], temperature=1.0, ignore_eos=True)
    assert len(outs[0]) == 8


def test_mixed_greedy_and_sampled_batch(engine):
    prompts = [[1, 2, 3, 4], [1, 2, 3, 4]]
    params = [
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
        SamplingParams(temperature=5.0, max_tokens=8, ignore_eos=True),
    ]
    outs = engine.generate(prompts, params, use_tqdm=False)
    greedy_alone = gen(engine, [[1, 2, 3, 4]], ignore_eos=True)[0]
    assert outs[0]["token_ids"] == greedy_alone


def test_many_sequences_continuous_batching(engine):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 120, size=rng.integers(3, 60)).tolist() for _ in range(20)]
    outs = gen(engine, prompts, max_tokens=5, ignore_eos=True)
    assert len(outs) == 20
    assert all(len(o) == 5 for o in outs)


def test_multi_step_decode_matches_single_step():
    """num_scheduler_steps > 1 must be outcome-invariant for greedy."""
    prompts = [[1, 2, 3, 4], [9, 8, 7, 6, 5]]
    e1 = make_engine(TINY, num_scheduler_steps=1)
    e8 = make_engine(TINY, num_scheduler_steps=8)
    a = gen(e1, prompts, max_tokens=13, ignore_eos=True)
    b = gen(e8, prompts, max_tokens=13, ignore_eos=True)
    assert a == b


def test_multi_step_decode_with_eos():
    e8 = make_engine(TINY, num_scheduler_steps=4)
    outs = gen(e8, [[1, 2, 3]], max_tokens=50, ignore_eos=False)
    # whatever the model emits, lengths respect max_tokens and EOS rules
    assert 1 <= len(outs[0]) <= 50
    if 0 in outs[0]:
        assert outs[0].index(0) == len(outs[0]) - 1  # EOS terminates


@pytest.mark.slow
def test_glm4_moe_generation():
    e = make_engine(TINY_MOE)
    outs = gen(e, [[1, 2, 3, 4], [5, 6, 7]], ignore_eos=True)
    assert all(len(o) == 8 for o in outs)
    a = gen(e, [[1, 2, 3, 4]], ignore_eos=True)[0]
    assert a == outs[0]


@pytest.mark.slow
def test_public_api_tensor_parallel_matches_single_device():
    """`LLM(tensor_parallel_size=..., data_parallel_size=...)` — the public
    engine path that builds the mesh itself (reference: per-rank processes,
    llm_engine.py:23-30) — must produce the same greedy tokens as tp=1."""
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9], list(range(1, 40))]
    base = gen(make_engine(TINY_MOE), prompts)
    e = make_engine(TINY_MOE, tensor_parallel_size=2, data_parallel_size=2)
    assert e.model_runner.mesh is not None
    assert gen(e, prompts) == base


@pytest.mark.slow
def test_preemption_under_pressure_matches_unconstrained():
    """A starved block pool forces preemption/recompute churn mid-decode;
    greedy outputs must be identical to an unconstrained engine (the
    reference's tail-preemption semantics, scheduler.py:60-63, preserved)."""
    rng = np.random.default_rng(3)
    # short prompts all admit at once, then decode growth (96 tokens each)
    # outgrows the 18-block pool -> tail preemption + recompute mid-stream
    prompts = [rng.integers(1, 120, size=int(n)).tolist()
               for n in rng.integers(3, 8, size=8)]
    base = gen(make_engine(TINY_MOE, num_kvcache_blocks=256), prompts,
               max_tokens=96)
    starved = make_engine(TINY_MOE, num_kvcache_blocks=18,
                          enable_prefix_caching=False)
    out = gen(starved, prompts, max_tokens=96)
    assert out == base
    assert starved.metrics.num_preemptions > 0  # the pressure was real


@pytest.mark.slow
def test_sp_prefill_with_preemption_pressure():
    """Sequence-parallel prefill + starved pool + prefix caching together."""
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 120, size=int(n)).tolist()
               for n in rng.integers(30, 90, size=5)]
    base = gen(make_engine(TINY_MOE, num_kvcache_blocks=256), prompts,
               max_tokens=16)
    e = make_engine(TINY_MOE, num_kvcache_blocks=48, prefill_sp_degree=3,
                    prefill_chunk_size=16)
    assert gen(e, prompts, max_tokens=16) == base


# ---- capacity-error handling (the reference dies on a scheduler assert;
# see VERDICT item 7) ---------------------------------------------------------


def test_over_capacity_prompt_rejected_at_add():
    eng = make_engine(TINY, num_kvcache_blocks=4, max_model_len=256)
    # 4 blocks x 16 = 64 token capacity; a 64-token prompt needs a 65th slot
    with pytest.raises(ValueError, match="KV blocks"):
        eng.add_request(list(range(1, 65)), SamplingParams(max_tokens=4))


def test_context_outgrowing_capacity_fails_gracefully():
    # capacity 4 blocks = 64 tokens; prompt 60 + max_tokens 16 overflows.
    # The engine must finish the request with an error, not crash.
    eng = make_engine(TINY, num_kvcache_blocks=4, max_model_len=256,
                      num_scheduler_steps=4)
    prompts = [list(range(1, 61))]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0, max_tokens=16,
                                                ignore_eos=True),
                        use_tqdm=False)
    assert "error" in outs[0]
    assert "capacity" in outs[0]["error"]
    # the tokens generated before overflow are still returned
    assert 0 < len(outs[0]["token_ids"]) <= 5
    # engine remains usable afterwards
    ok = eng.generate([[1, 2, 3]], SamplingParams(temperature=0.0, max_tokens=4,
                                                  ignore_eos=True),
                      use_tqdm=False)
    assert len(ok[0]["token_ids"]) == 4 and "error" not in ok[0]


def test_scheduler_fails_impossible_waiting_seq():
    from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
    from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence

    cfg = Config(
        model="", model_config=TINY, max_num_seqs=4, max_model_len=4096,
        kvcache_block_size=16, num_kvcache_blocks=4, prefill_chunk_size=32,
        max_num_batched_tokens=512,
    )
    sched = Scheduler(cfg)
    sched.add(Sequence(list(range(1, 200)), SamplingParams(max_tokens=4)))
    sched.add(Sequence([1, 2, 3], SamplingParams(max_tokens=4)))
    batch = sched.schedule()  # must fail seq 0 and still schedule seq 1
    assert batch is not None and len(batch.seqs) == 1
    assert len(sched.just_failed) == 1
    assert sched.just_failed[0].error is not None


def test_preemption_to_empty_then_resume():
    # Two seqs under extreme block pressure: the tail seq preempts, the
    # engine keeps making progress, and both eventually finish.
    eng = make_engine(TINY, num_kvcache_blocks=6, max_model_len=96,
                      num_scheduler_steps=2)
    outs = eng.generate([list(range(1, 33)), list(range(40, 72))],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True),
                        use_tqdm=False)
    for o in outs:
        assert "error" not in o
        assert len(o["token_ids"]) == 8


def test_warmup_covers_serving_programs():
    # With warmup on (enforce_eager=False), a full generate run must hit only
    # AOT-compiled programs: zero serve-time compiles (VERDICT item 2).
    eng = make_engine(TINY, enforce_eager=False, num_scheduler_steps=4,
                      num_kvcache_blocks=64)
    assert len(eng.model_runner._compiled) > 0
    eng.metrics.reset()
    outs = eng.generate([list(range(1, 40)), [5, 6, 7]],
                        SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
                        use_tqdm=False)
    assert all(len(o["token_ids"]) == 6 for o in outs)
    assert eng.metrics.jit_serve_compiles == 0, eng.metrics.summary()


def test_fused_qkv_matches_unfused():
    """ModelRunner._fuse_qkv_projections (single-chip init pass) must not
    change outputs: AWQ groups run along K, so the q|k|v N-concat is
    column-exact vs three separate projections."""
    from dataclasses import replace

    from glm4_moe_nano_vllm_tpu.config import QuantConfig
    from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner

    mc_q = replace(TINY_MOE, quant=QuantConfig(method="awq", bits=4,
                                               group_size=16))
    prompts = [[1, 2, 3, 4], [5, 6, 7], list(range(1, 40))]
    fused = make_engine(mc_q)
    assert "wqkv" in fused.model_runner.params["moe_layers"]
    assert "wq" not in fused.model_runner.params["moe_layers"]
    out_fused = gen(fused, prompts, ignore_eos=True)

    orig = ModelRunner._fuse_qkv_projections
    try:
        ModelRunner._fuse_qkv_projections = lambda self: None
        plain = make_engine(mc_q)
        assert "wq" in plain.model_runner.params["moe_layers"]
        out_plain = gen(plain, prompts, ignore_eos=True)
    finally:
        ModelRunner._fuse_qkv_projections = orig
    assert out_fused == out_plain
