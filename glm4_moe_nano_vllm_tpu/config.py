"""Engine and model configuration.

``Config`` preserves the reference's constructor contract
(`/root/reference/nanovllm/config.py:7-26`): ``model`` path plus
``max_num_batched_tokens / max_num_seqs / max_model_len /
gpu_memory_utilization / tensor_parallel_size / enforce_eager /
kvcache_block_size`` keyword knobs, with the same validation rules.
TPU-specific knobs (mesh shape, dtypes, bucketing) are additive.

``ModelConfig`` is our own architecture description, parsed directly from a
HuggingFace ``config.json`` (the reference leans on ``AutoConfig``,
config.py:24; we parse the json so the device path has no transformers
dependency) or constructed directly in tests.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass
class QuantConfig:
    """Weight-only quantization description.

    ``method``: "awq" (INT4 group-quantized, zero-point), "int8" (symmetric
    per-channel/group), or None. AWQ layout/nibble-order compatibility targets
    real AWQ checkpoints, i.e. the reference's *active* variant
    (`linear_awq_new.py:205-222`): qweight [in, out/8] int32, scales
    [in/group, out], qzeros [in/group, out/8] int32, nibble order
    [0, 4, 1, 5, 2, 6, 3, 7].
    """

    method: str = "awq"
    bits: int = 4
    group_size: int = 128
    zero_point: bool = True
    # Quantize the LM head (and, when tied, the embedding table) with the
    # same scheme. AWQ checkpoints ship an fp16 lm_head; at decode it is
    # re-read every micro-step (bf16 [H, V] streams ~0.5-1 GB at production
    # vocab sizes). Quantizing at load time cuts that read 4x (int4) at a
    # small logits-precision cost; the tied embedding gather dequantizes
    # the same table, so embed/logits stay consistent.
    quantize_lm_head: bool = False
    # Storage dtype for the per-group scale planes ("bfloat16" | "float32").
    # AWQ checkpoints ship fp16 scales; bf16 storage halves the scale bytes
    # of every weight stream (f32 scales are ~3-6% of the packed INT4
    # stream: 540 KB of a 9.3 MB Air expert, 8.4 MB of the 145 MB INT4 LM
    # head) at a <=2^-9 relative scale rounding — noise next to the int4
    # quantization step. Set "float32" to keep full-precision scales.
    scale_dtype: str = "bfloat16"

    @staticmethod
    def from_hf(qc: dict | None) -> "QuantConfig | None":
        if not qc:
            return None
        method = qc.get("quant_method", qc.get("method", "awq"))
        if method not in ("awq", "int8"):
            return None
        return QuantConfig(
            method=method,
            bits=int(qc.get("bits", qc.get("w_bit", 4))),
            group_size=int(qc.get("group_size", qc.get("q_group_size", 128))),
            zero_point=bool(qc.get("zero_point", True)),
        )


@dataclass
class ModelConfig:
    architecture: str = "qwen3"  # "qwen3" | "glm4_moe"
    vocab_size: int = 151936
    hidden_size: int = 1024
    num_layers: int = 28
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    max_position_embeddings: int = 40960
    partial_rotary_factor: float = 1.0  # GLM-4 MoE uses 0.5 (rotary_embedding.py:68-70)
    use_qk_norm: bool = True
    attention_bias: bool = False
    tie_word_embeddings: bool = True
    eos_token_id: int = -1
    # MoE (GLM-4 MoE semantics, moe.py:13-69)
    n_routed_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    n_shared_experts: int = 0
    first_k_dense_replace: int = 0
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = True
    n_group: int = 1
    topk_group: int = 1
    # quantization
    quant: QuantConfig | None = None

    @property
    def is_moe(self) -> bool:
        return self.n_routed_experts > 0

    @staticmethod
    def from_hf_dict(hf: dict) -> "ModelConfig":
        """Build from a parsed HuggingFace config.json dict."""
        arch_list = hf.get("architectures", [])
        model_type = hf.get("model_type", "")
        if model_type == "glm4_moe" or any("Glm4Moe" in a for a in arch_list):
            arch = "glm4_moe"
        elif model_type == "qwen3" or any("Qwen3" in a for a in arch_list):
            arch = "qwen3"
        else:
            raise ValueError(f"unsupported architecture: {model_type} / {arch_list}")

        num_heads = hf["num_attention_heads"]
        head_dim = hf.get("head_dim") or hf["hidden_size"] // num_heads
        eos = hf.get("eos_token_id", -1)
        if isinstance(eos, list):
            eos = eos[0]
        mc = ModelConfig(
            architecture=arch,
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=num_heads,
            num_kv_heads=hf.get("num_key_value_heads", num_heads),
            head_dim=head_dim,
            intermediate_size=hf["intermediate_size"],
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 10000.0),
            max_position_embeddings=hf.get("max_position_embeddings", 4096),
            partial_rotary_factor=hf.get("partial_rotary_factor", 1.0),
            use_qk_norm=hf.get("use_qk_norm", arch == "qwen3"),
            attention_bias=hf.get("attention_bias", False),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            eos_token_id=eos,
            quant=QuantConfig.from_hf(hf.get("quantization_config")),
        )
        if arch == "glm4_moe":
            mc.n_routed_experts = hf.get("n_routed_experts", 0)
            mc.num_experts_per_tok = hf.get("num_experts_per_tok", 0)
            mc.moe_intermediate_size = hf.get("moe_intermediate_size", 0)
            mc.n_shared_experts = hf.get("n_shared_experts", 0)
            mc.first_k_dense_replace = hf.get("first_k_dense_replace", 0)
            mc.routed_scaling_factor = hf.get("routed_scaling_factor", 1.0)
            mc.norm_topk_prob = hf.get("norm_topk_prob", True)
            mc.n_group = hf.get("n_group", 1)
            mc.topk_group = hf.get("topk_group", 1)
        return mc

    @staticmethod
    def from_pretrained(path: str) -> "ModelConfig":
        with open(os.path.join(path, "config.json")) as f:
            return ModelConfig.from_hf_dict(json.load(f))


# Decode batch-size buckets; same sane default ladder as the reference's CUDA
# graph capture list (`model_runner.py:235`: [1, 2, 4, 8] + range(16, 512+1, 16)),
# thinned to powers-of-two-ish steps since each bucket is one XLA compile.
DEFAULT_DECODE_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)
# Prefill (num_seqs, seq_len) bucket ladders.
DEFAULT_PREFILL_SEQ_BUCKETS = (1, 2, 4, 8, 16, 32, 64)
DEFAULT_PREFILL_LEN_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)


@dataclass
class Config:
    model: str
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 512
    max_model_len: int = 4096
    gpu_memory_utilization: float = 0.9  # fraction of HBM for weights+KV
    tensor_parallel_size: int = 1
    enforce_eager: bool = False  # if True, skip warmup AOT compilation
    kvcache_block_size: int = 256
    num_kvcache_blocks: int = -1
    # --- TPU-specific additions ---
    data_parallel_size: int = 1
    expert_parallel_size: int = 1  # resolved at runner init (reported, not set)
    # pipeline parallelism: layer stages over the pp mesh axis (the layer
    # count of the pipelined stack must divide evenly). 0 microbatches =
    # one per stage; more microbatches shrink the pipeline bubble.
    pipeline_parallel_size: int = 1
    pp_microbatches: int = 0
    # MoE sharding over the tp axis: "ep" = experts sharded on E (full-Im
    # grouped matmul per device, ops/moe.py moe_experts_ep), "im" = expert
    # intermediate dim sharded, "auto" = ep when n_routed_experts % tp == 0.
    moe_parallel: str = "auto"
    # EP large-token (prefill) path: "auto"/"a2a" = ragged all-to-all token
    # dispatch to expert owners (per-device ICI volume shrinks with mesh
    # size), "psum" = replicated-activation local-span GMM + psum combine
    # (competitive when the EP axis is narrow; see ARCHITECTURE.md). Small-
    # token (decode) steps always use dense mode + psum, which is volume-
    # optimal there.
    ep_dispatch: str = "auto"
    dtype: str = "bfloat16"
    kv_cache_dtype: str = "bfloat16"  # or "int8" / "float8_e4m3fn" (halved
    # KV bytes + per-row scale planes; int8 converts natively on v5e — fp8
    # e4m3 measured 1.6x decode cost from its element-wise convert)
    enable_prefix_caching: bool = True
    enable_chunked_prefill: bool = True
    prefill_chunk_size: int = 4096  # max new tokens prefilled per step per seq
    # sequence-parallel prefill: schedule up to this many chunks of ONE prompt
    # as sibling rows of the same step (rows are dp-sharded, so a long prompt
    # prefills across the dp axis in one program). 1 = one chunk per step.
    prefill_sp_degree: int = 1
    # Length-grouped prefill admission: prefill programs are [B, S]-padded,
    # so one long row pads every row in the step to its len bucket. When
    # True the queue head's chunk fixes each step's bucket; longer prompts
    # chunk down to it and shorter waiting prompts defer to a later step.
    prefill_len_grouping: bool = True
    decode_buckets: tuple = DEFAULT_DECODE_BUCKETS
    prefill_seq_buckets: tuple = DEFAULT_PREFILL_SEQ_BUCKETS
    prefill_len_buckets: tuple = DEFAULT_PREFILL_LEN_BUCKETS
    block_bucket_policy: str = "full"  # "full" (one compile) | "pow2"
    # decode tokens generated per device program (multi-step scheduling):
    # amortizes the host<->device round trip, which dominates decode latency
    # on remote-attached accelerators. Overshoot past EOS is truncated.
    num_scheduler_steps: int = 8
    # prefill warmup coverage: "frontier" (largest + smallest reachable seq
    # bucket per len bucket), "all" (every reachable (seq, len) combo), "off"
    warmup_prefill: str = "frontier"
    # AOT-warmup compile concurrency: >1 overlaps the ladder's XLA compiles
    # across a thread pool via buffer-free lower().compile() before the
    # serial cache-populating executions (the 14-program toy ladder measured
    # 99.9 s fully serial over the remote-compile tunnel). The overlap only
    # pays when the persistent compilation cache is enabled (the serial
    # executions then re-compile from cache in ~ms) — without it every
    # program compiles twice, so the default is serial; bench.py opts in.
    warmup_compile_workers: int = 0
    # Pallas decode-attention compute-chunk size in tokens (pages per grid
    # step x block_size); larger chunks batch page DMAs, smaller ones bound
    # over-read past short contexts.
    pa_chunk_tokens: int = 256
    hbm_bytes: int = -1  # override detected per-chip HBM size (testing)
    # --- multi-host (JAX multi-controller; parallel/multihost.py) ---
    # num_processes > 1 makes the engine call jax.distributed.initialize at
    # construction; every host then runs this same engine code replicated
    # (deterministic scheduler + seeded in-graph sampling keep replicas in
    # lockstep — the TPU-native replacement for the reference's SHM pickle
    # RPC control plane, model_runner.py:49-91). process_id -1 = auto-detect.
    num_processes: int = 1
    process_id: int = -1
    coordinator_address: str = ""
    # write a jax.profiler trace of the first generate() here (view with
    # tensorboard/xprof); "" = off. SURVEY §5: the reference has no tracing.
    profile_dir: str = ""
    model_config: ModelConfig | None = None
    eos: int = -1
    rng_seed: int = 0

    def __post_init__(self):
        # Same invariants as the reference (`config.py:20-26`), minus the
        # CUDA-specific tp<=8 cap (a TPU slice can shard wider).
        assert self.kvcache_block_size % 16 == 0
        assert self.tensor_parallel_size >= 1
        if self.model_config is None:
            assert os.path.isdir(self.model), f"model path not found: {self.model}"
            self.model_config = ModelConfig.from_pretrained(self.model)
        self.max_model_len = min(
            self.max_model_len, self.model_config.max_position_embeddings
        )
        assert self.max_num_batched_tokens >= self.prefill_chunk_size
        # SP sibling chunk rows must land on block boundaries: the Pallas
        # KV-write kernel RMWs whole blocks, and two same-step rows sharing a
        # block would race within a DMA group (ops/kv_write_pallas.py).
        if self.prefill_sp_degree > 1:
            assert self.prefill_chunk_size % self.kvcache_block_size == 0, (
                "prefill_chunk_size must be a multiple of kvcache_block_size "
                "when prefill_sp_degree > 1",
                self.prefill_chunk_size, self.kvcache_block_size,
            )
            # Under pp, sibling SP rows could land in different microbatches
            # and be pipelined out of order (a later chunk would attend KV
            # its sibling has not written yet) — the combination is rejected.
            assert self.pipeline_parallel_size == 1, (
                "prefill_sp_degree > 1 is not supported with pipeline "
                "parallelism"
            )
        if self.eos == -1:
            self.eos = self.model_config.eos_token_id
        if self.kv_cache_dtype.startswith("float8"):
            # Steer users off fp8 KV on chips without a native e4m3->f32
            # vector convert (v5e measured 1.61x bf16 decode cost;
            # kv_cache_dtype="int8" gives the identical capacity halving at
            # 1.066x — BENCHMARKS.md round 4). The code stays for
            # fp8-native chip generations.
            import warnings

            warnings.warn(
                "kv_cache_dtype='float8_e4m3fn' costs ~1.6x decode on "
                "chips without native e4m3 vector converts (v5e-class); "
                "'int8' provides the same KV capacity at ~1.07x. "
                "See BENCHMARKS.md.",
                stacklevel=2,
            )
        # Bucket ladders must cover the config's extremes (a clamped bucket
        # would silently truncate a batch).
        if self.decode_buckets[-1] < self.max_num_seqs:
            self.decode_buckets = tuple(self.decode_buckets) + (self.max_num_seqs,)
        if self.prefill_seq_buckets[-1] < self.max_num_seqs:
            self.prefill_seq_buckets = tuple(self.prefill_seq_buckets) + (self.max_num_seqs,)
        # prefill q_len is bounded by the chunk size: trim + cap the ladder
        self.prefill_len_buckets = tuple(
            [x for x in self.prefill_len_buckets if x < self.prefill_chunk_size]
            + [self.prefill_chunk_size]
        )
        # Self-tuning seq-bucket ladder (round 5): admission fills steps to
        # the TOKEN budget, so a full prefill step at len bucket s carries
        # ~max_num_batched_tokens/s rows. If the seq ladder lacks that rung,
        # the runner pads rows up to the next bucket and the padded tokens
        # run through the whole MoE/linear stack — measured 8x padded
        # compute on the Air b256 config ((16,256) ladder, 32 real rows at
        # s=128 padded to 256). Insert the exact reachable full-step row
        # count per len bucket.
        reach = {
            min(self.max_num_seqs,
                max(1, self.max_num_batched_tokens // s))
            for s in self.prefill_len_buckets
        }
        self.prefill_seq_buckets = tuple(sorted(
            set(self.prefill_seq_buckets) | reach
        ))

    @property
    def max_blocks_per_seq(self) -> int:
        return (self.max_model_len + self.kvcache_block_size - 1) // self.kvcache_block_size
