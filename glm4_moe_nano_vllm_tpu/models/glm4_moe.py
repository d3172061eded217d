"""GLM-4 MoE causal LM (e.g. GLM-4.5-Air), functional JAX.

Capability parity with `/root/reference/nanovllm/models/glm4_moe/`:
  * first ``first_k_dense_replace`` decoder layers use a dense MLP, the rest
    use MoE (decode_layer.py:25-36) — here: two layer stacks, two scans;
  * sigmoid top-k router with e_score_correction_bias selection semantics and
    one shared expert added to the routed output (moe.py:28-69, 165-171);
  * partial rotary (factor 0.5), optional per-head q/k norm, optional
    attention bias (attention_new.py:83-98);
  * unlike the reference's debug state (model.py:20-22 loads only 2 layers and
    reads golden tensors from dev paths), this is a complete implementation.
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
from glm4_moe_nano_vllm_tpu.ops.moe import moe_experts, moe_experts_ep, route_topk


class Glm4MoeForCausalLM:
    def __init__(self, cfg: ModelConfig, dtype=jnp.bfloat16):
        assert cfg.is_moe
        assert cfg.n_group == 1 and cfg.topk_group == 1, (
            "grouped expert selection not used by GLM-4.5 (reference moe.py:21-22)"
        )
        self.cfg = cfg
        self.dtype = dtype
        self.num_dense = cfg.first_k_dense_replace
        self.num_moe = cfg.num_layers - self.num_dense
        # set by ModelRunner when running sharded; EP shards experts on E
        self.mesh = None
        self.moe_ep = False
        self.ep_dispatch = "auto"  # large-T EP path (Config.ep_dispatch)
        # pipeline parallelism: the MoE stack is the pipelined stage stack
        # (dense first-k layers are replicated — ~1/46 of the model)
        self.pp = 1
        self.pp_microbatches = 0
        self.pipeline_stack = "moe_layers"
        self.pipeline_cache_keys = ("moe_k", "moe_v")
        self.pipeline_stack_size = self.num_moe

    # ---- parameters ------------------------------------------------------

    def _attn_params(self, key, n_layers):
        cfg, dt = self.cfg, self.dtype
        H = cfg.hidden_size
        nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        ks = jax.random.split(key, 4)
        qc = cfg.quant
        p = {
            "input_norm": jnp.ones((n_layers, H), dt),
            "post_norm": jnp.ones((n_layers, H), dt),
            "wq": init_weight(ks[0], (n_layers, H, nq * d), dt, qc),
            "wk": init_weight(ks[1], (n_layers, H, nkv * d), dt, qc),
            "wv": init_weight(ks[2], (n_layers, H, nkv * d), dt, qc),
            "wo": init_weight(ks[3], (n_layers, nq * d, H), dt, qc),
        }
        if cfg.use_qk_norm:
            p["q_norm"] = jnp.ones((n_layers, d), dt)
            p["k_norm"] = jnp.ones((n_layers, d), dt)
        if cfg.attention_bias:
            p["bq"] = jnp.zeros((n_layers, nq * d), dt)
            p["bk"] = jnp.zeros((n_layers, nkv * d), dt)
            p["bv"] = jnp.zeros((n_layers, nkv * d), dt)
        return p

    def init_params(self, key: jax.Array):
        cfg, dt = self.cfg, self.dtype
        H, I = cfg.hidden_size, cfg.intermediate_size
        E, Im = cfg.n_routed_experts, cfg.moe_intermediate_size
        Is = Im * max(cfg.n_shared_experts, 1)
        Ld, Lm = self.num_dense, self.num_moe
        ks = jax.random.split(key, 12)

        qc = cfg.quant
        dense_layers = {}
        if Ld > 0:
            dense_layers = self._attn_params(ks[0], Ld)
            dense_layers.update({
                "gate": init_weight(ks[1], (Ld, H, I), dt, qc),
                "up": init_weight(ks[2], (Ld, H, I), dt, qc),
                "down": init_weight(ks[3], (Ld, I, H), dt, qc),
            })

        moe_layers = self._attn_params(ks[4], Lm)
        moe_layers.update({
            "router_w": init_linear(ks[5], (Lm, E, H), jnp.float32),
            "router_bias": jnp.zeros((Lm, E), jnp.float32),
            "expert_gate": init_weight(ks[6], (Lm, E, H, Im), dt, qc),
            "expert_up": init_weight(ks[7], (Lm, E, H, Im), dt, qc),
            "expert_down": init_weight(ks[8], (Lm, E, Im, H), dt, qc),
            "shared_gate": init_weight(ks[9], (Lm, H, Is), dt, qc),
            "shared_up": init_weight(ks[10], (Lm, H, Is), dt, qc),
            "shared_down": init_weight(ks[11], (Lm, Is, H), dt, qc),
        })

        params = {
            "dense_layers": dense_layers,
            "moe_layers": moe_layers,
            "final_norm": jnp.ones((H,), dt),
        }
        q_head = qc is not None and qc.quantize_lm_head
        if q_head:
            # [H, V] quant dict; when tied it also serves the embedding
            # gather (models/common.py embed)
            params["lm_head"] = init_weight(
                jax.random.fold_in(key, 2), (H, cfg.vocab_size), dt, qc
            )
            if cfg.tie_word_embeddings:
                from glm4_moe_nano_vllm_tpu.ops.quant_matmul import (
                    transpose_quant_dict,
                )

                params["embed_t"] = transpose_quant_dict(params["lm_head"])
        if not (q_head and cfg.tie_word_embeddings):
            params["embed"] = init_linear(
                jax.random.fold_in(key, 1), (cfg.vocab_size, H), dt
            )
        if not cfg.tie_word_embeddings and not q_head:
            params["lm_head"] = init_linear(
                jax.random.fold_in(key, 2), (H, cfg.vocab_size), dt
            )
        return params

    def init_caches(self, num_blocks: int, block_size: int, kv_dtype=None):
        cfg = self.cfg
        dt = kv_dtype or self.dtype
        kd, hd = cfg.num_kv_heads, cfg.head_dim
        self.num_blocks = num_blocks

        from glm4_moe_nano_vllm_tpu.ops.kv_cache import make_kv_cache

        def zeros(n):
            # head-major, layer-flat paged layout (layer l's blocks at
            # [l*num_blocks, (l+1)*num_blocks)), see ops/kv_cache.py;
            # fp8 caches carry per-row scales ({data, scale} dict leaves)
            return make_kv_cache((kd, n * num_blocks, block_size, hd), dt)

        return {
            "dense_k": zeros(self.num_dense), "dense_v": zeros(self.num_dense),
            "moe_k": zeros(self.num_moe), "moe_v": zeros(self.num_moe),
        }

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

        def dense_body(carry, xs, batch):
            x, kc, vc = carry
            lp, li = xs
            st = self._full_dense  # quant stacks out of the xs (see below)
            st_attn = st if st is not None and (
                "wq" in st or "wqkv" in st) else None
            hh = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            a, kc, vc = attention_block(hh, lp, kc, vc, batch, cfg, inv_freq,
                                        li, nb, attn_stacks=st_attn,
                                        cos_sin=cos_sin)
            x = x + a
            hh = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            x = x + mlp_block_stacked(hh, st, lp, li)
            return (x, kc, vc), None

        def moe_body(carry, xs, batch, cs=None):
            x, kc, vc = carry
            lp, li = xs
            b, s, h = x.shape
            hh = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            a, kc, vc = attention_block(hh, lp, kc, vc, batch, cfg, inv_freq,
                                        li, nb,
                                        attn_stacks=self._full_attn,
                                        cos_sin=cs)
            x = x + a
            hh = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            flat = hh.reshape(b * s, h)
            topk_idx, topk_w = route_topk(
                flat, lp["router_w"], lp["router_bias"],
                cfg.num_experts_per_tok, cfg.routed_scaling_factor,
                cfg.norm_topk_prob,
            )
            qg = cfg.quant.group_size if cfg.quant is not None else None
            if self.moe_ep:
                # expert stacks stay OUT of the scan xs here too (sliced xs
                # feeding pallas_call materialize per-layer copies); the
                # shard_map shards the full [L, E, ...] stacks on E
                fe = self._full_experts
                routed = moe_experts_ep(
                    flat, topk_idx, topk_w,
                    fe["expert_gate"], fe["expert_up"], fe["expert_down"],
                    self.mesh, layer_idx=li, dispatch=self.ep_dispatch,
                    quant_group=qg,
                )
            elif "expert_gate" in lp:  # pp stage stacks travel as scan xs
                routed = moe_experts(
                    flat, topk_idx, topk_w,
                    lp["expert_gate"], lp["expert_up"], lp["expert_down"],
                    quant_group=qg,
                )
            else:
                # expert stacks stay OUT of the scan xs: sliced xs feeding a
                # pallas_call materialize a per-layer copy of the whole
                # stack (ops/moe.py::moe_experts) — pass full stacks + li
                fe = self._full_experts
                shared_args = None
                if "shared_gate" in fe:  # fused path: shared expert in-kernel
                    shared_args = (fe["shared_gate"], fe["shared_up"],
                                   fe["shared_down"])
                routed = moe_experts(
                    flat, topk_idx, topk_w,
                    fe["expert_gate"], fe["expert_up"], fe["expert_down"],
                    layer_idx=li, shared=shared_args, quant_group=qg,
                )
                if shared_args is not None:
                    x = x + routed.reshape(b, s, h)
                    return (x, kc, vc), None
            shared = mlp_block(
                flat, lp["shared_gate"], lp["shared_up"], lp["shared_down"]
            )
            x = x + (routed + shared).reshape(b, s, h)
            return (x, kc, vc), None

        new_caches = dict(caches)
        self._full_attn = None  # set for the non-pp MoE stack below
        self._full_dense = None
        if self.num_dense > 0:
            dl = params["dense_layers"]
            # quant stacks out of the scan xs (per-layer XLA slices of quant
            # stacks feeding custom calls are real HBM copies — same rule as
            # the MoE stack below; ~165 MB of dense-layer weights per step
            # at Air widths)
            dkeys = tuple(
                k for k in ("wq", "wk", "wv", "wqkv", "wo",
                            "gate", "up", "down", "wgu")
                if isinstance(dl.get(k), dict)
            )
            if self.pp == 1 and dkeys:
                self._full_dense = {k: dl[k] for k in dkeys}
                dl = {k: v for k, v in dl.items() if k not in dkeys}
            (x, kd, vd), _ = jax.lax.scan(
                lambda c, xs: dense_body(c, xs, batch),
                (x, caches["dense_k"], caches["dense_v"]),
                (dl, jnp.arange(self.num_dense, dtype=jnp.int32)),
            )
            new_caches["dense_k"], new_caches["dense_v"] = kd, vd
        if self.pp > 1:
            from glm4_moe_nano_vllm_tpu.parallel.pipeline import pipeline_forward

            def stage_fn(x_mb, lp_local, kc_local, vc_local, batch_mb):
                kd = (kc_local["data"] if isinstance(kc_local, dict)
                      else kc_local)  # fp8 caches are {data, scale}
                n_local = kd.shape[1] // nb  # layers in this stage
                # microbatch-sliced positions: per-stage rope tables
                cs_mb = rope_cos_sin(batch_mb.positions, inv_freq)
                (x_out, kc, vc), _ = jax.lax.scan(
                    lambda c, xs: moe_body(c, xs, batch_mb, cs_mb),
                    (x_mb, kc_local, vc_local),
                    (lp_local, jnp.arange(n_local, dtype=jnp.int32)),
                )
                return x_out, kc, vc

            x, km, vm = pipeline_forward(
                self.mesh, stage_fn, x, params["moe_layers"],
                caches["moe_k"], caches["moe_v"], batch,
                num_mb=self.pp_microbatches,
            )
        else:
            from glm4_moe_nano_vllm_tpu.ops.moe import (
                can_fuse_dense,
                use_fused_dispatch,
            )

            expert_keys = ("expert_gate", "expert_up", "expert_down")
            num_tokens = x.shape[0] * x.shape[1]
            eg = params["moe_layers"]["expert_gate"]
            if not self.moe_ep and (
                    use_fused_dispatch(num_tokens, eg,
                                       cfg.num_experts_per_tok)
                    or can_fuse_dense(num_tokens, eg)):
                # shared expert rides the fused kernel too (weight 1.0);
                # under EP the shared expert stays Im-sharded outside the
                # E-sharded shard_map region
                expert_keys += ("shared_gate", "shared_up", "shared_down")
            self._full_experts = {k: params["moe_layers"][k]
                                  for k in expert_keys}
            # quantized attention projections also stay out of the scan xs:
            # the dense Pallas kernel selects the layer in-kernel
            attn_keys = tuple(
                k for k in ("wq", "wk", "wv", "wqkv", "wo")
                if isinstance(params["moe_layers"].get(k), dict)
            )
            if attn_keys:
                self._full_attn = {k: params["moe_layers"][k]
                                   for k in attn_keys}
            scan_params = {k: v for k, v in params["moe_layers"].items()
                           if k not in expert_keys + attn_keys}
            (x, km, vm), _ = jax.lax.scan(
                lambda c, xs: moe_body(c, xs, batch, cos_sin),
                (x, caches["moe_k"], caches["moe_v"]),
                (scan_params,
                 jnp.arange(self.num_moe, dtype=jnp.int32)),
            )
        new_caches["moe_k"], new_caches["moe_v"] = km, vm

        if return_hidden:
            return x, new_caches
        lm_head = params.get("lm_head")
        if lm_head is None:
            lm_head = params["embed"].T
        logits = compute_logits(
            x, params["final_norm"], lm_head, batch.last_q_idx, cfg.rms_norm_eps
        )
        return logits, new_caches
