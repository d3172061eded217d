"""Qwen3 dense causal LM (functional JAX, layer-stacked + lax.scan).

Capability parity with `/root/reference/nanovllm/models/qwen3.py:14-210`:
per-head q/k RMS-norm, full rotary, SiLU-gated MLP, optional tied embeddings.
Weight names follow the HF checkpoint layout; the loader maps
``model.layers.{i}.self_attn.q_proj.weight`` etc. into stacked arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glm4_moe_nano_vllm_tpu.config import ModelConfig
from glm4_moe_nano_vllm_tpu.engine.batch import BatchInfo
from glm4_moe_nano_vllm_tpu.layers.normalization import rms_norm
from glm4_moe_nano_vllm_tpu.layers.rotary import rope_cos_sin, rope_inv_freq
from glm4_moe_nano_vllm_tpu.models.common import (
    attention_block,
    compute_logits,
    embed,
    init_linear,
    init_weight,
    mlp_block,
    mlp_block_stacked,
)


class Qwen3ForCausalLM:
    def __init__(self, cfg: ModelConfig, dtype=jnp.bfloat16):
        assert not cfg.is_moe
        self.cfg = cfg
        self.dtype = dtype
        # set by ModelRunner when running sharded
        self.mesh = None
        self.pp = 1
        self.pp_microbatches = 0
        self.pipeline_stack = "layers"
        self.pipeline_cache_keys = ("k", "v")
        self.pipeline_stack_size = cfg.num_layers

    # ---- parameters ------------------------------------------------------

    def init_params(self, key: jax.Array):
        cfg, dt = self.cfg, self.dtype
        L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        ks = jax.random.split(key, 8)
        qc = cfg.quant
        layers = {
            "input_norm": jnp.ones((L, H), dt),
            "post_norm": jnp.ones((L, H), dt),
            "wq": init_weight(ks[0], (L, H, nq * d), dt, qc),
            "wk": init_weight(ks[1], (L, H, nkv * d), dt, qc),
            "wv": init_weight(ks[2], (L, H, nkv * d), dt, qc),
            "wo": init_weight(ks[3], (L, nq * d, H), dt, qc),
            "gate": init_weight(ks[4], (L, H, I), dt, qc),
            "up": init_weight(ks[5], (L, H, I), dt, qc),
            "down": init_weight(ks[6], (L, I, H), dt, qc),
        }
        if cfg.use_qk_norm:
            layers["q_norm"] = jnp.ones((L, d), dt)
            layers["k_norm"] = jnp.ones((L, d), dt)
        if cfg.attention_bias:
            layers["bq"] = jnp.zeros((L, nq * d), dt)
            layers["bk"] = jnp.zeros((L, nkv * d), dt)
            layers["bv"] = jnp.zeros((L, nkv * d), dt)
        params = {
            "layers": layers,
            "final_norm": jnp.ones((H,), dt),
        }
        q_head = qc is not None and qc.quantize_lm_head
        if q_head:
            # [H, V] quant dict; when tied it also serves the embedding
            # gather (models/common.py embed)
            params["lm_head"] = init_weight(
                jax.random.fold_in(key, 99), (H, cfg.vocab_size), dt, qc
            )
        if q_head and cfg.tie_word_embeddings:
            from glm4_moe_nano_vllm_tpu.ops.quant_matmul import (
                transpose_quant_dict,
            )

            params["embed_t"] = transpose_quant_dict(params["lm_head"])
        if not (q_head and cfg.tie_word_embeddings):
            params["embed"] = init_linear(ks[7], (cfg.vocab_size, H), dt)
        if not cfg.tie_word_embeddings and not q_head:
            params["lm_head"] = init_linear(
                jax.random.fold_in(key, 99), (H, cfg.vocab_size), dt
            )
        return params

    def init_caches(self, num_blocks: int, block_size: int, kv_dtype=None):
        cfg = self.cfg
        # head-major, layer-flat paged layout (layer l's blocks at
        # [l*num_blocks, (l+1)*num_blocks)), see ops/kv_cache.py
        shape = (cfg.num_kv_heads, cfg.num_layers * num_blocks, block_size,
                 cfg.head_dim)
        dt = kv_dtype or self.dtype
        self.num_blocks = num_blocks
        from glm4_moe_nano_vllm_tpu.ops.kv_cache import make_kv_cache

        return {"k": make_kv_cache(shape, dt), "v": make_kv_cache(shape, dt)}

    # ---- forward ---------------------------------------------------------

    def forward(self, params, caches, batch: BatchInfo, return_hidden: bool = False):
        cfg = self.cfg
        rotary_dim = int(cfg.head_dim * cfg.partial_rotary_factor)
        inv_freq = rope_inv_freq(rotary_dim, cfg.rope_theta)
        cos_sin = rope_cos_sin(batch.positions, inv_freq)
        if "embed" in params:
            x = embed(batch.token_ids, params["embed"], self.dtype)
        elif "embed_t" in params:
            x = embed(batch.token_ids, params["embed_t"], self.dtype,
                      transposed=True)
        else:
            x = embed(batch.token_ids, params["lm_head"], self.dtype)

        nb = self.num_blocks

        def body(carry, xs, batch, cs=None):
            # KV caches ride the scan carry (in-place scatter, no full-cache
            # rewrite); xs carries only this layer's params + index.
            x, kc, vc = carry
            lp, li = xs
            h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            a, kc, vc = attention_block(h, lp, kc, vc, batch, cfg, inv_freq,
                                        li, nb, attn_stacks=self._full_attn,
                                        cos_sin=cs)
            x = x + a
            h = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            st = self._full_attn
            x = x + mlp_block_stacked(h, st, lp, li)
            return (x, kc, vc), None

        # quantized weight stacks stay out of the scan xs (layer selected
        # in-kernel) — per-layer XLA slices of quant stacks are real HBM
        # copies (a custom call can't fuse the slice): measured 7.5 ms of a
        # 29 ms Qwen3-8B INT8 decode step when gate/up/down rode the xs
        self._full_attn = None
        attn_keys = ()
        if self.pp == 1:
            attn_keys = tuple(
                k for k in ("wq", "wk", "wv", "wqkv", "wo",
                            "gate", "up", "down", "wgu")
                if isinstance(params["layers"].get(k), dict)
            )
            if attn_keys:
                self._full_attn = {k: params["layers"][k] for k in attn_keys}
                params = dict(params)
                params["layers"] = {k: v for k, v in params["layers"].items()
                                    if k not in attn_keys}

        layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        if self.pp > 1:
            from glm4_moe_nano_vllm_tpu.parallel.pipeline import pipeline_forward

            def stage_fn(x_mb, lp_local, kc_local, vc_local, batch_mb):
                kd = (kc_local["data"] if isinstance(kc_local, dict)
                      else kc_local)  # fp8 caches are {data, scale}
                n_local = kd.shape[1] // nb  # layers in this stage
                # microbatch-sliced positions: per-stage rope tables
                cs_mb = rope_cos_sin(batch_mb.positions, inv_freq)
                (x_out, kc, vc), _ = jax.lax.scan(
                    lambda c, xs: body(c, xs, batch_mb, cs_mb),
                    (x_mb, kc_local, vc_local),
                    (lp_local, jnp.arange(n_local, dtype=jnp.int32)),
                )
                return x_out, kc, vc

            x, k_new, v_new = pipeline_forward(
                self.mesh, stage_fn, x, params["layers"],
                caches["k"], caches["v"], batch,
                num_mb=self.pp_microbatches,
            )
        else:
            (x, k_new, v_new), _ = jax.lax.scan(
                lambda c, xs: body(c, xs, batch, cos_sin),
                (x, caches["k"], caches["v"]),
                (params["layers"], layer_ids),
            )
        if return_hidden:
            return x, {"k": k_new, "v": v_new}
        lm_head = params.get("lm_head")
        if lm_head is None:
            lm_head = params["embed"].T
        logits = compute_logits(
            x, params["final_norm"], lm_head, batch.last_q_idx, cfg.rms_norm_eps
        )
        return logits, {"k": k_new, "v": v_new}
