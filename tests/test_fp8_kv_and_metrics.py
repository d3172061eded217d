"""Scaled (FP8 / INT8) paged KV cache + engine metrics tests."""

import numpy as np

from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig
from glm4_moe_nano_vllm_tpu.engine.llm_engine import LLMEngine
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

TINY = ModelConfig(
    architecture="qwen3", vocab_size=128, hidden_size=64, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
    max_position_embeddings=2048, tie_word_embeddings=True, eos_token_id=0,
)


def make_engine(kv_dtype="float32", **kw):
    defaults = dict(
        model="", model_config=TINY, max_num_batched_tokens=512, max_num_seqs=8,
        max_model_len=128, kvcache_block_size=16, num_kvcache_blocks=64,
        prefill_chunk_size=64, enforce_eager=True, dtype="float32",
        kv_cache_dtype=kv_dtype, decode_buckets=(1, 2, 4),
        prefill_seq_buckets=(1, 2, 4), prefill_len_buckets=(16, 32, 64),
    )
    defaults.update(kw)
    return LLMEngine(**defaults)


import pytest


@pytest.mark.parametrize("kvd", ["float8_e4m3fn", "int8"])
def test_scaled_kv_cache_generates_and_tracks_fp32(kvd):
    import jax.numpy as jnp

    e8 = make_engine(kvd)
    # scaled caches are {data, scale} dicts with per-row scales
    assert e8.model_runner.caches["k"]["data"].dtype == jnp.dtype(kvd)
    assert e8.model_runner.caches["k"]["scale"].dtype == jnp.float32
    e32 = make_engine("float32")
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out8 = e8.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    out32 = e32.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    assert len(out8) == 8
    # fp8 KV is lossy; on this tiny random model at least the first tokens
    # should agree with fp32 (same argmax despite KV rounding)
    assert out8[0] == out32[0]


def test_fp8_kv_config_warns_toward_int8():
    """VERDICT r4 item 8: fp8 KV costs 1.61x decode on v5e-class chips where
    int8 serves the same capacity at 1.066x — config emits a steering
    warning for fp8 (and stays silent for int8/bf16)."""
    import warnings

    def cfg_warnings(kvd):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            Config(model="", model_config=TINY, kv_cache_dtype=kvd,
                   max_num_seqs=4, max_model_len=64)
            return [str(x.message) for x in w]

    fp8_w = cfg_warnings("float8_e4m3fn")
    assert any("int8" in m and "1.6" in m for m in fp8_w), fp8_w
    assert not cfg_warnings("int8")
    assert not cfg_warnings("bfloat16")


def test_metrics_summary():
    e = make_engine()
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    e.generate([[1, 2, 3], [4, 5, 6, 7]], sp, use_tqdm=False)
    s = e.metrics.summary()
    assert s["num_prefill_steps"] >= 1
    assert s["num_decode_steps"] >= 1  # multi-step windows batch decode steps
    assert s["prefill_tokens"] == 7
    assert s["decode_tokens"] >= 6
    assert s["ttft_p50_s"] > 0
    assert s["e2e_p50_s"] >= s["ttft_p50_s"]
    assert s["decode_tok_per_s"] > 0


# ---- per-row scaled fp8 storage (VERDICT item 6) ---------------------------


def _rand_kv(rng, t, h, d, spread=True):
    import jax.numpy as jnp

    x = rng.normal(size=(t, h, d)).astype(np.float32)
    if spread:
        # widely varying row magnitudes: a direct e4m3 cast would lose small
        # rows entirely; per-row scales must recover them
        x *= (10.0 ** rng.uniform(-4, 3, size=(t, h, 1))).astype(np.float32)
    return jnp.asarray(x)


@pytest.mark.parametrize("kvd,rtol", [("float8_e4m3fn", 0.13),
                                      ("int8", None)])
def test_scaled_write_gather_roundtrip_accuracy(kvd, rtol):
    import jax.numpy as jnp

    from glm4_moe_nano_vllm_tpu.ops.kv_cache import (
        gather_kv,
        make_kv_cache,
        write_kv,
    )

    rng = np.random.default_rng(0)
    h, nb, bs, d, t = 2, 8, 16, 32, 24
    kc = make_kv_cache((h, nb, bs, d), jnp.dtype(kvd))
    vc = make_kv_cache((h, nb, bs, d), jnp.dtype(kvd))
    k = _rand_kv(rng, t, h, d)
    v = _rand_kv(rng, t, h, d)
    slots = jnp.asarray(np.arange(t, dtype=np.int32))  # blocks 0..1
    kc, vc = write_kv(kc, vc, k, v, slots)
    bt = jnp.asarray(np.arange(nb, dtype=np.int32))[None, :]
    kg, vg = gather_kv(kc, vc, bt)  # [H, 1, nb*bs, D]
    got = np.asarray(kg[:, 0, :t]).transpose(1, 0, 2)
    want = np.asarray(k, np.float32)
    if rtol is not None:
        # e4m3: RELATIVE error <= 2^-3 per element after per-row scaling
        # (subnormals keep small within-row elements alive)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-9)
    else:
        # int8: ABSOLUTE error <= amax_row/254 per element (uniform steps —
        # tighter than e4m3 near amax, but within-row elements below half a
        # step round to 0, so a relative bound cannot hold)
        amax = np.abs(want).max(axis=-1, keepdims=True)
        assert np.all(np.abs(got - want) <= amax / 254 + 1e-12)
    # a direct (unscaled) cast would flush the small ROWS to ~0; check the
    # smallest-magnitude row survived with fidelity
    mags = np.abs(want).max(axis=(1, 2))
    r = int(np.argmin(mags))
    if rtol is not None:
        np.testing.assert_allclose(got[r], want[r], rtol=rtol, atol=1e-12)
    else:
        amax_r = np.abs(want[r]).max(axis=-1, keepdims=True)
        assert np.all(np.abs(got[r] - want[r]) <= amax_r / 254 + 1e-30)


@pytest.mark.parametrize("kvd", ["float8_e4m3fn", "int8"])
def test_scaled_write_kv_pallas_matches_xla(kvd):
    import jax.numpy as jnp

    from glm4_moe_nano_vllm_tpu.ops.kv_cache import make_kv_cache, write_kv
    from glm4_moe_nano_vllm_tpu.ops.kv_write_pallas import write_kv_pallas

    rng = np.random.default_rng(1)
    h, nb, bs, d = 2, 8, 16, 128
    b, s = 2, 16
    k = _rand_kv(rng, b * s, h, d)
    v = _rand_kv(rng, b * s, h, d)
    # two sequences writing [0, 16) at different blocks
    bt = jnp.asarray(np.array([[0, 1], [2, 3]], np.int32))
    pos0 = jnp.asarray(np.array([0, 0], np.int32))
    ctx = jnp.asarray(np.array([16, 16], np.int32))
    slots = jnp.asarray(np.concatenate([
        np.arange(16, dtype=np.int32),            # block 0 rows 0-15
        2 * bs + np.arange(16, dtype=np.int32),   # block 2 rows 0-15
    ]))

    mk = lambda: (make_kv_cache((h, nb, bs, d), jnp.dtype(kvd)),
                  make_kv_cache((h, nb, bs, d), jnp.dtype(kvd)))
    kc1, vc1 = write_kv(*mk(), k, v, slots)
    kc2, vc2 = write_kv_pallas(*mk(), k, v, bt, pos0, ctx, interpret=True)
    for a, b_ in ((kc1, kc2), (vc1, vc2)):
        np.testing.assert_array_equal(
            np.asarray(a["data"].astype(jnp.float32)),
            np.asarray(b_["data"].astype(jnp.float32)))
        np.testing.assert_allclose(np.asarray(a["scale"]),
                                   np.asarray(b_["scale"]), rtol=1e-6)


@pytest.mark.parametrize("kvd", ["float8_e4m3fn", "int8"])
@pytest.mark.parametrize("bs", [128, 32])
def test_scaled_pallas_attention_kernels_match_ref(bs, kvd):
    """Decode + prefill Pallas kernels (interpret mode) on a scaled cache ==
    the XLA oracle reading the same quantized cache. bs=32 pins the
    round-3 any-block-size path (scale pages land one per sublane); the
    round-2 kernel required bs % 128 == 0."""
    import jax.numpy as jnp

    from glm4_moe_nano_vllm_tpu.ops.attention_ref import paged_attention_ref
    from glm4_moe_nano_vllm_tpu.ops.kv_cache import make_kv_cache, write_kv
    from glm4_moe_nano_vllm_tpu.ops.paged_attention_pallas import (
        paged_attention_decode,
    )
    from glm4_moe_nano_vllm_tpu.ops.prefill_pallas import paged_prefill

    rng = np.random.default_rng(2)
    h, nb, d, g = 2, 8, 128, 2
    kc = make_kv_cache((h, nb, bs, d), jnp.dtype(kvd))
    vc = make_kv_cache((h, nb, bs, d), jnp.dtype(kvd))
    # seq 0: 20 ctx tokens in blocks 0-1; seq 1: 9 tokens in block 2
    k = _rand_kv(rng, 29, h, d)
    v = _rand_kv(rng, 29, h, d)
    slots = jnp.asarray(np.concatenate([
        np.arange(20, dtype=np.int32), 2 * bs + np.arange(9, dtype=np.int32)
    ]))
    kc, vc = write_kv(kc, vc, k, v, slots)
    bt = jnp.asarray(np.array([[0, 1], [2, 0]], np.int32))
    ctx = jnp.asarray(np.array([20, 9], np.int32))

    # decode: one query per seq at the last position
    q = jnp.asarray(rng.normal(size=(2, h * g, d)).astype(np.float32))
    want = paged_attention_ref(q[:, None], kc, vc, bt, ctx,
                               positions=(ctx - 1)[:, None], sm_scale=0.11)
    got = paged_attention_decode(q, kc, vc, bt, ctx, sm_scale=0.11,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, 0]),
                               rtol=2e-5, atol=2e-5)

    # prefill: last 8 tokens of each seq are the query span
    sq = 8
    qp = jnp.asarray(rng.normal(size=(2, sq, h * g, d)).astype(np.float32))
    q_lens = jnp.asarray(np.array([8, 8], np.int32))
    pos = (ctx - q_lens)[:, None] + jnp.arange(sq)[None, :]
    want = paged_attention_ref(qp, kc, vc, bt, ctx, positions=pos,
                               sm_scale=0.11)
    got = paged_prefill(qp, kc, vc, bt, ctx, q_lens, sm_scale=0.11,
                        interpret=True)
    # both sides read the SAME quantized cache; the bound is float-ordering
    # noise only (int8 at bs=32 lands one element at 2e-4 relative)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
