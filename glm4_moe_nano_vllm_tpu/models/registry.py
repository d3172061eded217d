"""Architecture registry (reference: model_type dispatch at
`/root/reference/nanovllm/engine/model_runner.py:33-40`)."""

from glm4_moe_nano_vllm_tpu.config import ModelConfig
from glm4_moe_nano_vllm_tpu.models.glm4_moe import Glm4MoeForCausalLM
from glm4_moe_nano_vllm_tpu.models.qwen3 import Qwen3ForCausalLM

_REGISTRY = {
    "qwen3": Qwen3ForCausalLM,
    "glm4_moe": Glm4MoeForCausalLM,
}


def build_model(cfg: ModelConfig, dtype):
    try:
        cls = _REGISTRY[cfg.architecture]
    except KeyError:
        raise ValueError(
            f"unknown architecture {cfg.architecture!r}; have {sorted(_REGISTRY)}"
        ) from None
    return cls(cfg, dtype=dtype)
