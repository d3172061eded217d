"""Fused dense-mode MoE kernel vs the XLA dense-mode reference path.

Covers all three weight variants (bf16 / AWQ int4 / int8) in interpret mode
(tests run on CPU, conftest.py). The kernel must reproduce
`ops/moe.py::moe_experts_dense` semantics: every expert applied to every
token, outputs combined with the top-k weight map.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from glm4_moe_nano_vllm_tpu.layers.activation import silu_and_mul
from glm4_moe_nano_vllm_tpu.ops import quant
from glm4_moe_nano_vllm_tpu.ops.moe import _dense_weights, moe_experts_dense
from glm4_moe_nano_vllm_tpu.ops.moe_dense_fused_pallas import moe_dense_fused
from glm4_moe_nano_vllm_tpu.ops.quant_matmul import dequantize

T, H, I, E, K, G = 13, 256, 128, 8, 4, 128


def _routing(rng):
    idx = jnp.asarray(rng.integers(0, E, (T, K)), jnp.int32)
    tw = jnp.asarray(rng.random((T, K)), jnp.float32)
    return idx, tw, _dense_weights(idx, tw, T, E)


def test_fused_dense_moe_bf16():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.bfloat16)
    wg = jnp.asarray(rng.standard_normal((E, H, I)) * 0.05, jnp.bfloat16)
    wu = jnp.asarray(rng.standard_normal((E, H, I)) * 0.05, jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.bfloat16)
    idx, tw, wc = _routing(rng)

    ref = moe_experts_dense(x, idx, tw, wg, wu, wd)
    got = moe_dense_fused(x, wg, wu, wd, wc, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


def _qstack(rng, k, n, method):
    qws, zps, scs = [], [], []
    for _ in range(E):
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
        if method == "awq":
            qw, qz, sc = quant.quantize_awq(w, G)
            qw2, zp2, sc2 = quant.repack_awq_for_tpu(qw, qz, sc)
            qws.append(qw2), zps.append(zp2), scs.append(sc2)
        else:
            q8, sc = quant.quantize_int8(w, G)
            qws.append(q8), scs.append(sc.astype(np.float32))
    d = {"qw": jnp.asarray(np.stack(qws)), "scale": jnp.asarray(np.stack(scs))}
    if method == "awq":
        d["zp"] = jnp.asarray(np.stack(zps))
    return d


def test_fused_dense_moe_with_shared():
    """Shared expert fused in-kernel (weight 1.0) == routed + separate MLP."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.bfloat16)
    wg = jnp.asarray(rng.standard_normal((E, H, I)) * 0.05, jnp.bfloat16)
    wu = jnp.asarray(rng.standard_normal((E, H, I)) * 0.05, jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.bfloat16)
    i_sh = 2 * I  # n_shared = 2: wider shared intermediate
    sg = jnp.asarray(rng.standard_normal((H, i_sh)) * 0.05, jnp.bfloat16)
    su = jnp.asarray(rng.standard_normal((H, i_sh)) * 0.05, jnp.bfloat16)
    sd = jnp.asarray(rng.standard_normal((i_sh, H)) * 0.05, jnp.bfloat16)
    idx, tw, wc = _routing(rng)

    from glm4_moe_nano_vllm_tpu.models.common import mlp_block

    ref = (moe_experts_dense(x, idx, tw, wg, wu, wd).astype(np.float32)
           + mlp_block(x, sg, su, sd).astype(np.float32))
    got = moe_dense_fused(x, wg, wu, wd, wc, shared=(sg, su, sd),
                          interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.08, rtol=0.08,
    )


@pytest.mark.parametrize("method", ["awq", "int8"])
def test_fused_dense_moe_quant(method):
    rng = np.random.default_rng(1)
    qg = _qstack(rng, H, I, method)
    qu = _qstack(rng, H, I, method)
    qd = _qstack(rng, I, H, method)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.bfloat16)
    idx, tw, wc = _routing(rng)

    # reference: dequantized stacks through the XLA dense-mode einsums
    wg, wu, wd = (dequantize(q, jnp.bfloat16) for q in (qg, qu, qd))
    g = jnp.einsum("th,ehi->tei", x, wg, preferred_element_type=x.dtype)
    u = jnp.einsum("th,ehi->tei", x, wu, preferred_element_type=x.dtype)
    h = silu_and_mul(g, u).astype(x.dtype)
    o = jnp.einsum("tei,eih->teh", h, wd,
                   preferred_element_type=x.dtype).astype(jnp.float32)
    ref = jnp.einsum("teh,te->th", o, wc).astype(x.dtype)

    got = moe_dense_fused(x, qg, qu, qd, wc, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.06, rtol=0.06,
    )
