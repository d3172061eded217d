"""Quantization tests: bit-exact AWQ unpack, roundtrips, quantized engine
end-to-end, and the PPL acceptance gate.

Mirrors the reference's hermetic dequant test
(`/root/reference/nanovllm/examples/linear_test.py`: random qweight/qzeros/
scales, independent reference dequant, tolerance compare) plus gates the
reference never had (PPL delta, generation parity).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from glm4_moe_nano_vllm_tpu.config import Config, QuantConfig
from glm4_moe_nano_vllm_tpu.ops.quant import (
    AWQ_ORDER,
    awq_dequantize,
    awq_pack_cols,
    awq_unpack_cols,
    quantize_awq,
    quantize_int8,
    repack_awq_for_tpu,
)
from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize, quant_matmul


def reference_awq_dequant(qweight, qzeros, scales, group_size):
    """Independent re-implementation of the reference Triton kernel semantics
    (linear_awq_new.py:60-118): per-int32 shifts from the reverse AWQ order,
    (w - z) * s."""
    k, m8 = qweight.shape
    m = m8 * 8
    out = np.zeros((k, m), np.float32)
    shifts = [AWQ_ORDER[c] * 4 for c in range(8)]
    for row in range(k):
        for j in range(m8):
            packed_w = int(np.uint32(qweight[row, j]))
            packed_z = int(np.uint32(qzeros[row // group_size, j]))
            for c in range(8):
                w = (packed_w >> shifts[c]) & 0xF
                z = (packed_z >> shifts[c]) & 0xF
                s = float(scales[row // group_size, j * 8 + c])
                out[row, j * 8 + c] = (w - z) * s
    return out


def test_unpack_matches_reference_semantics():
    rng = np.random.default_rng(0)
    k, m, g = 8, 16, 4
    qweight = rng.integers(-2**31, 2**31, size=(k, m // 8), dtype=np.int64).astype(np.int32)
    qzeros = rng.integers(-2**31, 2**31, size=(k // g, m // 8), dtype=np.int64).astype(np.int32)
    scales = rng.normal(size=(k // g, m)).astype(np.float16)
    ref = reference_awq_dequant(qweight, qzeros, scales, g)
    ours = awq_dequantize(qweight, qzeros, scales)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    nibbles = rng.integers(0, 16, size=(32, 64), dtype=np.int64).astype(np.uint8)
    assert np.array_equal(awq_unpack_cols(awq_pack_cols(nibbles)), nibbles)


def test_quantize_dequantize_error_bound():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.02
    qweight, qzeros, scales = quantize_awq(w, group_size=64)
    wd = awq_dequantize(qweight, qzeros, scales)
    # max error bounded by half a quantization step per group
    step = (w.reshape(4, 64, 128).max(1) - w.reshape(4, 64, 128).min(1)) / 15
    err = np.abs(wd - w).reshape(4, 64, 128).max(1)
    assert np.all(err <= step * 0.51 + 1e-6)


def test_tpu_repack_matches_dequant():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    qweight, qzeros, scales = quantize_awq(w, group_size=16)
    ref = awq_dequantize(qweight, qzeros, scales)
    qw, zp, scale = repack_awq_for_tpu(qweight, qzeros, scales)
    qp = {
        "qw": jnp.asarray(qw),
        "zp": jnp.asarray(zp),
        "scale": jnp.asarray(scale),
    }
    got = np.asarray(dequantize(qp, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_quant_matmul_matches_dense():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(128, 64)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    qweight, qzeros, scales = quantize_awq(w, group_size=32)
    qw, zp, scale = repack_awq_for_tpu(qweight, qzeros, scales)
    qp = {
        "qw": jnp.asarray(qw),
        "zp": jnp.asarray(zp),
        "scale": jnp.asarray(scale),
    }
    dense = np.asarray(x) @ awq_dequantize(qweight, qzeros, scales)
    got = np.asarray(quant_matmul(x, qp))
    np.testing.assert_allclose(got, dense, rtol=1e-4, atol=1e-4)


def test_int8_quantize_error():
    rng = np.random.default_rng(5)
    w = rng.normal(size=(128, 64)).astype(np.float32) * 0.02
    qw, scale = quantize_int8(w, group_size=32)
    wd = np.asarray(
        dequantize({"qw": jnp.asarray(qw), "scale": jnp.asarray(scale, jnp.float32)},
                   jnp.float32)
    )
    assert np.max(np.abs(wd - w)) <= np.max(scale) * 0.51


# ---- end-to-end: quantized engine + PPL gate --------------------------------

@pytest.fixture(scope="module")
def qwen3_ckpt(tmp_path_factory):
    import torch
    from transformers.models.qwen3 import Qwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=1024, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype="float32",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("qwen3_tiny_q")
    model.save_pretrained(path)
    return str(path)


def _load(path, quant):
    from glm4_moe_nano_vllm_tpu.config import ModelConfig
    from glm4_moe_nano_vllm_tpu.models.registry import build_model
    from glm4_moe_nano_vllm_tpu.utils.loader import load_params

    mc = ModelConfig.from_pretrained(path)
    mc.quant = quant
    model = build_model(mc, jnp.float32)
    params = load_params(model, path)
    return model, params


@pytest.mark.parametrize("method", ["int8", "awq"])
def test_quantized_ppl_delta(qwen3_ckpt, method):
    from glm4_moe_nano_vllm_tpu.utils.ppl import perplexity

    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, 250, size=48).tolist() for _ in range(4)]
    model_fp, params_fp = _load(qwen3_ckpt, None)
    ppl_fp = perplexity(model_fp, params_fp, seqs)
    model_q, params_q = _load(qwen3_ckpt, QuantConfig(method=method, bits=8 if method == "int8" else 4, group_size=16))
    ppl_q = perplexity(model_q, params_q, seqs)
    # acceptance gate: BASELINE.md's 0.1-absolute bar targets real models at
    # PPL ~5-10; this random-init tiny model sits at PPL ~260, so gate on the
    # equivalent relative delta (0.1/8 ≈ 1.2%; require much tighter).
    rel = abs(ppl_q - ppl_fp) / ppl_fp
    assert rel <= (0.0005 if method == "int8" else 0.002), (ppl_fp, ppl_q, rel)


def test_quantized_engine_generates(qwen3_ckpt):
    from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig, QuantConfig
    from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
    from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
    from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
    from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

    mc = ModelConfig.from_pretrained(qwen3_ckpt)
    mc.quant = QuantConfig(method="awq", bits=4, group_size=16)
    cfg = Config(
        model=qwen3_ckpt, model_config=mc, max_num_seqs=4, max_model_len=128,
        kvcache_block_size=16, num_kvcache_blocks=32, prefill_chunk_size=32,
        enforce_eager=True, dtype="float32", kv_cache_dtype="float32",
        decode_buckets=(1, 2, 4), prefill_seq_buckets=(1, 2, 4),
        prefill_len_buckets=(16, 32),
    )
    runner, sched = ModelRunner(cfg), Scheduler(cfg)
    seq = Sequence([5, 6, 7, 8], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    sched.add(seq)
    while not sched.is_finished():
        batch = sched.schedule()
        sched.postprocess(batch, runner.run(batch))
    assert len(seq.completion_token_ids) == 6


# ---- quantized LM head / tied embedding (QuantConfig.quantize_lm_head) ------

@pytest.mark.parametrize("method", ["awq", "int8"])
def test_quant_gather_rows_matches_dequant(method):
    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import quant_gather_rows

    rng = np.random.default_rng(7)
    k, v, g = 64, 40, 16
    w = rng.normal(size=(k, v)).astype(np.float32) * 0.02
    if method == "awq":
        qp = {}
        qw, qz, sc = quantize_awq(w, g)
        qw2, zp2, sc2 = repack_awq_for_tpu(qw, qz, sc)
        qp = {"qw": jnp.asarray(qw2), "zp": jnp.asarray(zp2),
              "scale": jnp.asarray(sc2, jnp.float32)}
    else:
        qw, sc = quantize_int8(w, g)
        qp = {"qw": jnp.asarray(qw), "scale": jnp.asarray(sc, jnp.float32)}
    ids = jnp.asarray([0, 3, 39, 7, 3], jnp.int32)
    got = np.asarray(quant_gather_rows(qp, ids, jnp.float32))
    want = np.asarray(dequantize(qp, jnp.float32)).T[np.asarray(ids)]
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def qwen3_tied_ckpt(tmp_path_factory):
    import torch
    from transformers.models.qwen3 import Qwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

    torch.manual_seed(1)
    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=1024, rope_theta=10000.0,
        tie_word_embeddings=True, torch_dtype="float32",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("qwen3_tiny_tied")
    model.save_pretrained(path)
    return str(path)


@pytest.mark.parametrize("tied", [True, False])
def test_quantized_lm_head_ppl(qwen3_ckpt, qwen3_tied_ckpt, tied):
    """quantize_lm_head replaces embed/lm_head with a [H, V] quant dict; the
    PPL stays within the same relative gate as weight quantization."""
    from glm4_moe_nano_vllm_tpu.utils.ppl import perplexity

    path = qwen3_tied_ckpt if tied else qwen3_ckpt
    rng = np.random.default_rng(1)
    seqs = [rng.integers(1, 250, size=48).tolist() for _ in range(4)]
    model_fp, params_fp = _load(path, None)
    ppl_fp = perplexity(model_fp, params_fp, seqs)

    model_q, params_q = _load(
        path, QuantConfig(method="awq", bits=4, group_size=16,
                          quantize_lm_head=True))
    assert isinstance(params_q["lm_head"], dict)
    assert ("embed" in params_q) == (not tied)
    ppl_q = perplexity(model_q, params_q, seqs)
    rel = abs(ppl_q - ppl_fp) / ppl_fp
    assert rel <= 0.01, (ppl_fp, ppl_q, rel)


def test_quantized_lm_head_engine_generates(qwen3_tied_ckpt):
    from glm4_moe_nano_vllm_tpu.config import Config, ModelConfig, QuantConfig
    from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
    from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
    from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
    from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

    mc = ModelConfig.from_pretrained(qwen3_tied_ckpt)
    mc.quant = QuantConfig(method="awq", bits=4, group_size=16,
                           quantize_lm_head=True)
    cfg = Config(
        model=qwen3_tied_ckpt, model_config=mc, max_num_seqs=4,
        max_model_len=128, kvcache_block_size=16, num_kvcache_blocks=32,
        prefill_chunk_size=32, enforce_eager=True, dtype="float32",
        kv_cache_dtype="float32", decode_buckets=(1, 2, 4),
        prefill_seq_buckets=(1, 2, 4), prefill_len_buckets=(16, 32),
    )
    runner, sched = ModelRunner(cfg), Scheduler(cfg)
    seq = Sequence([5, 6, 7, 8], SamplingParams(temperature=0.0, max_tokens=6,
                                                ignore_eos=True))
    sched.add(seq)
    while not sched.is_finished():
        batch = sched.schedule()
        sched.postprocess(batch, runner.run(batch))
    assert len(seq.completion_token_ids) == 6


@pytest.mark.parametrize("method", ["awq", "int8"])
def test_quant_dense_matmul_kernel(method):
    """Pipelined dense kernel (interpret mode) == dequantize-then-dot."""
    from glm4_moe_nano_vllm_tpu.ops.quant_dense_pallas import quant_dense_matmul

    rng = np.random.default_rng(11)
    b, k, n, g = 5, 64, 96, 16
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    if method == "awq":
        qw, qz, sc = quantize_awq(w, g)
        qw2, zp2, sc2 = repack_awq_for_tpu(qw, qz, sc)
        qp = {"qw": jnp.asarray(qw2), "zp": jnp.asarray(zp2),
              "scale": jnp.asarray(sc2, jnp.float32)}
    else:
        qw, sc = quantize_int8(w, g)
        qp = {"qw": jnp.asarray(qw), "scale": jnp.asarray(sc, jnp.float32)}
    x = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    got = np.asarray(quant_dense_matmul(x, qp, interpret=True))
    want = np.asarray(x @ dequantize(qp, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method", ["int8", "awq"])
def test_structured_weights_ppl_delta(method):
    """ΔPPL gate on trained-like (NOT i.i.d.) weights: per-channel log-normal
    scale spread + outlier channels — the statistics that make group
    quantization hard on real checkpoints (VERDICT item 5). Gate: relative
    ΔPPL within the BASELINE.md bar's equivalent (0.1 absolute at PPL≈8 →
    1.25% relative)."""
    from dataclasses import replace

    from glm4_moe_nano_vllm_tpu.config import ModelConfig
    from glm4_moe_nano_vllm_tpu.models.registry import build_model
    from glm4_moe_nano_vllm_tpu.utils.ppl import perplexity
    from glm4_moe_nano_vllm_tpu.utils.structured import (
        quantize_params,
        structure_params,
    )

    mc = ModelConfig(
        architecture="glm4_moe", vocab_size=512, hidden_size=128,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=32,
        intermediate_size=256, max_position_embeddings=1024,
        partial_rotary_factor=0.5, use_qk_norm=True, attention_bias=True,
        tie_word_embeddings=True, eos_token_id=0, n_routed_experts=8,
        num_experts_per_tok=2, moe_intermediate_size=128, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.5,
    )
    import jax

    model_fp = build_model(mc, jnp.float32)
    params = model_fp.init_params(jax.random.PRNGKey(3))
    params = structure_params(params, seed=7, num_layers=mc.num_layers)
    # sharpen the (tied) head so logits are peaky, then evaluate on
    # sequences the fp model GENERATES itself: the model assigns high
    # probability to its own samples, so PPL sits far below vocab-uniform
    # and quantization error actually moves it (random token sequences give
    # near-uniform logits — the emptiness VERDICT item 5 calls out)
    params["embed"] = params["embed"] * 6.0
    seqs = _self_generated_sequences(mc, params)
    ppl_fp = perplexity(model_fp, params, seqs)

    mc_q = replace(mc, quant=QuantConfig(
        method=method, bits=8 if method == "int8" else 4, group_size=128))
    model_q = build_model(mc_q, jnp.float32)
    params_q = quantize_params(model_q, params)
    ppl_q = perplexity(model_q, params_q, seqs)
    delta = ppl_q - ppl_fp
    # the model's own samples give PPL ~2.8 here (peaky logits), so the
    # BASELINE.md absolute bar applies directly; int8 must be ~noise
    assert ppl_fp < 6.0, f"eval distribution not peaky (ppl={ppl_fp})"
    bound = 0.02 if method == "int8" else 0.1
    assert abs(delta) <= bound, (ppl_fp, ppl_q, delta)


def _self_generated_sequences(mc, params, n=4, length=64):
    from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
    from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
    from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
    from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

    cfg = Config(
        model="", model_config=mc, max_num_seqs=n, max_model_len=256,
        max_num_batched_tokens=512, kvcache_block_size=16,
        num_kvcache_blocks=128, prefill_chunk_size=64, enforce_eager=True,
        dtype="float32", kv_cache_dtype="float32", decode_buckets=(n,),
        prefill_seq_buckets=(n,), prefill_len_buckets=(16,), rng_seed=11,
    )
    runner = ModelRunner(cfg, params=params)
    sched = Scheduler(cfg)
    rng = np.random.default_rng(5)
    sp = SamplingParams(temperature=0.9, max_tokens=length, ignore_eos=True)
    seqs = [Sequence(rng.integers(1, 500, size=4).tolist(), sp)
            for _ in range(n)]
    for q in seqs:
        sched.add(q)
    while not sched.is_finished():
        batch = sched.schedule()
        sched.postprocess(batch, runner.run(batch))
    return [q.token_ids for q in seqs]


def test_quant_gather_rows_transposed_matches_straight():
    """embed_t (transposed [V, K] storage, quant_gather_rows_t) returns
    bit-identical embedding rows to the straight column gather."""
    import jax
    import numpy as np

    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import (
        quant_gather_rows,
        quant_gather_rows_t,
        transpose_quant_dict,
    )
    from glm4_moe_nano_vllm_tpu.ops import quant

    rng = np.random.default_rng(11)
    k, v, g = 256, 96, 64
    w = rng.normal(size=(k, v)).astype(np.float32) * 0.05
    qw, qz, sc = quant.quantize_awq(w, g)
    a, b, c = quant.repack_awq_for_tpu(qw, qz, sc)
    qp = {"qw": jnp.asarray(a), "zp": jnp.asarray(b),
          "scale": jnp.asarray(c)}
    ids = jnp.asarray(rng.integers(0, v, size=17), jnp.int32)
    want = quant_gather_rows(qp, ids, jnp.float32)
    got = quant_gather_rows_t(transpose_quant_dict(qp), ids, jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quant_dense_matmul_ragged_n():
    """N with no 128-aligned divisor (GLM-4.5-Air dense MLP N=10944 shape
    class): the dense kernel pads the last N tile; output must match the
    XLA dequant path exactly on the real columns."""
    import jax.numpy as jnp

    from glm4_moe_nano_vllm_tpu.ops import quant
    from glm4_moe_nano_vllm_tpu.ops.quant_dense_pallas import (
        quant_dense_matmul,
    )
    from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize

    rng = np.random.default_rng(7)
    k, n = 256, 576  # 576 % 128 != 0 and no aligned divisor <= 512
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    qw, qz, sc = quant.quantize_awq(w, 64)
    qw2, zp2, sc2 = quant.repack_awq_for_tpu(qw, qz, sc)
    qp = {"qw": jnp.asarray(qw2), "zp": jnp.asarray(zp2),
          "scale": jnp.asarray(sc2)}
    x = jnp.asarray(rng.normal(size=(13, k)), jnp.bfloat16)
    got = quant_dense_matmul(x, qp, interpret=True)
    want = jnp.dot(x, dequantize(qp, jnp.bfloat16),
                   preferred_element_type=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.03, atol=0.03)
