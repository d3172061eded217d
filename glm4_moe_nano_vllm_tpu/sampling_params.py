"""Per-request sampling parameters.

Mirrors the reference API (`/root/reference/nanovllm/sampling_params.py:5-8`):
``temperature``, ``max_tokens``, ``ignore_eos``. ``temperature == 0`` means
greedy decoding (the reference deliberately allows it, sampling_params.py:11).
"""

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False

    def __post_init__(self):
        assert self.temperature >= 0.0, "temperature must be >= 0 (0 = greedy)"
        assert self.max_tokens >= 1
