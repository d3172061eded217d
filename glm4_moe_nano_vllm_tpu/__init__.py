"""glm4_moe_nano_vllm_tpu — a TPU-native LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
2419322417/GLM4_MOE_nano-vllm (an offline continuous-batching inference
engine serving GLM-4 MoE with AWQ INT4 quantization).

Public API mirrors the reference (`/root/reference/nanovllm/__init__.py:1-2`):

    from glm4_moe_nano_vllm_tpu import LLM, SamplingParams
    llm = LLM("/path/to/model", tensor_parallel_size=1)
    outs = llm.generate(["hello"], SamplingParams(temperature=0.6, max_tokens=64))
"""

from glm4_moe_nano_vllm_tpu.llm import LLM
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

__version__ = "0.1.0"

__all__ = ["LLM", "SamplingParams"]
