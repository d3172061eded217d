"""User-facing facade (reference: `/root/reference/nanovllm/llm.py:4`)."""

from glm4_moe_nano_vllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    pass
