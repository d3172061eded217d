"""Perplexity harness (teacher-forced, all positions).

The acceptance bar for quantization is PPL(quant) - PPL(bf16) <= 0.1 at the
same bit-width (BASELINE.md; the reference has no PPL tooling at all,
SURVEY §4). Runs the model's prefill path over whole sequences and projects
logits at every position.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from glm4_moe_nano_vllm_tpu.engine.batch import BatchInfo
from glm4_moe_nano_vllm_tpu.layers.normalization import rms_norm


def _full_logits(model, params, hidden):
    lm_head = params.get("lm_head")
    if lm_head is None:
        lm_head = params["embed"].T
    h = rms_norm(hidden, params["final_norm"], model.cfg.rms_norm_eps)
    if isinstance(lm_head, dict):  # QuantConfig.quantize_lm_head
        from glm4_moe_nano_vllm_tpu.ops.quant_matmul import quant_matmul

        return quant_matmul(h, lm_head).astype(jnp.float32)
    return jnp.dot(h, lm_head, preferred_element_type=jnp.float32)


def sequence_nll(model, params, token_ids: list[int], block_size: int = 16,
                 kv_dtype=jnp.bfloat16):
    """Total negative log-likelihood (nats) and token count for one sequence.

    ``kv_dtype`` selects the KV-cache storage dtype: int8/fp8 runs the
    scaled write-quantize + in-kernel dequant attention path, putting the
    serving KV pipeline inside the PPL gate (VERDICT r4 item 7)."""
    t = len(token_ids)
    num_blocks = (t + block_size - 1) // block_size
    caches = model.init_caches(num_blocks + 1, block_size, kv_dtype)
    pos = np.arange(t, dtype=np.int32)
    batch = BatchInfo(
        token_ids=jnp.asarray(np.asarray(token_ids, np.int32)[None]),
        positions=jnp.asarray(pos[None]),
        slot_mapping=jnp.asarray(pos),  # blocks 0..n in order
        block_tables=jnp.asarray(np.arange(num_blocks, dtype=np.int32)[None]),
        context_lens=jnp.asarray([t], np.int32),
        last_q_idx=jnp.asarray([t - 1], np.int32),
        temperatures=jnp.zeros((1,), np.float32),
    )
    hidden, _ = model.forward(params, caches, batch, return_hidden=True)
    logits = _full_logits(model, params, hidden)[0]  # [T, V]
    logp = jax.nn.log_softmax(logits, axis=-1)
    targets = jnp.asarray(token_ids[1:], jnp.int32)
    nll = -jnp.take_along_axis(logp[:-1], targets[:, None], axis=-1).sum()
    return float(nll), t - 1


def perplexity(model, params, sequences: list[list[int]], block_size: int = 16,
               kv_dtype=jnp.bfloat16) -> float:
    total_nll, total_tok = 0.0, 0
    for seq in sequences:
        nll, n = sequence_nll(model, params, seq, block_size, kv_dtype)
        total_nll += nll
        total_tok += n
    return float(np.exp(total_nll / max(total_tok, 1)))
