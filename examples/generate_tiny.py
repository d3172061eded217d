"""Drive the engine end-to-end on a tiny random-weight model.

Works on any backend (TPU chip included). This is the package-boundary
equivalent of the reference's example.py smoke scripts.
"""

import numpy as np

from glm4_moe_nano_vllm_tpu import LLM, SamplingParams
from glm4_moe_nano_vllm_tpu.config import ModelConfig

mc = ModelConfig(
    architecture="glm4_moe",
    vocab_size=1024,
    hidden_size=256,
    num_layers=4,
    num_heads=8,
    num_kv_heads=4,
    head_dim=64,
    intermediate_size=512,
    max_position_embeddings=4096,
    partial_rotary_factor=0.5,
    use_qk_norm=True,
    attention_bias=True,
    tie_word_embeddings=True,
    eos_token_id=0,
    n_routed_experts=16,
    num_experts_per_tok=4,
    moe_intermediate_size=128,
    n_shared_experts=1,
    first_k_dense_replace=1,
    routed_scaling_factor=1.5,
)

llm = LLM(
    model="",
    model_config=mc,
    max_num_seqs=16,
    max_model_len=512,
    kvcache_block_size=16,
    num_kvcache_blocks=256,
    prefill_chunk_size=128,
    enforce_eager=True,
    decode_buckets=(1, 2, 4, 8, 16),
    prefill_seq_buckets=(1, 2, 4, 8),
    prefill_len_buckets=(16, 32, 64, 128),
)

rng = np.random.default_rng(0)
prompts = [rng.integers(1, 1000, size=n).tolist() for n in (5, 37, 190)]
outs = llm.generate(
    prompts,
    SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True),
    use_tqdm=False,
)
for i, o in enumerate(outs):
    print(f"seq{i}: prompt_len={len(prompts[i])} completion={o['token_ids']}")

# determinism check: same prompt alone must match the batched run
solo = llm.generate(
    [prompts[0]], SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True),
    use_tqdm=False,
)[0]
assert solo["token_ids"] == outs[0]["token_ids"], "batch-invariance violated"
print("greedy batch-invariance: OK")
print("backend:", __import__("jax").default_backend())
