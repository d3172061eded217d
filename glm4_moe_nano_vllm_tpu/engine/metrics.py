"""Engine metrics & observability.

The reference has none (SURVEY §5: only a live tqdm postfix,
`/root/reference/nanovllm/engine/llm_engine.py:76-84`). This module tracks
per-step timings and token counts, derives throughput / TTFT / latency
percentiles, and exposes an optional ``jax.profiler`` trace hook.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class EngineMetrics:
    num_prefill_steps: int = 0
    num_decode_steps: int = 0
    prefill_tokens: int = 0
    decode_tokens: int = 0
    prefill_time_s: float = 0.0
    decode_time_s: float = 0.0
    # per-request TTFT (first token latency): seq_id -> seconds
    _arrival: dict = field(default_factory=dict)
    ttft_s: list = field(default_factory=list)
    e2e_s: list = field(default_factory=list)
    num_preemptions: int = 0
    # XLA programs compiled while serving (i.e. shapes warmup missed)
    jit_serve_compiles: int = 0
    # host time spent building batch arrays (ModelRunner.prepare)
    host_prep_s: float = 0.0
    # warmup cost (ModelRunner.warmup): programs AOT-compiled + seconds
    warmup_programs: int = 0
    warmup_time_s: float = 0.0

    def reset(self) -> None:
        """Zero all counters (e.g. after a compile-heavy warmup run).
        Warmup cost fields survive (they describe engine init, not a run)."""
        arrivals = self._arrival
        wp, wt = self.warmup_programs, self.warmup_time_s
        self.__init__()
        self._arrival = arrivals
        self.warmup_programs, self.warmup_time_s = wp, wt

    def on_request(self, seq_id: int) -> None:
        self._arrival[seq_id] = time.perf_counter()

    def on_step(self, is_prefill: bool, num_tokens: int, elapsed_s: float) -> None:
        if is_prefill:
            self.num_prefill_steps += 1
            self.prefill_tokens += num_tokens
            self.prefill_time_s += elapsed_s
        else:
            self.num_decode_steps += 1
            self.decode_tokens += num_tokens
            self.decode_time_s += elapsed_s

    def on_first_token(self, seq_id: int) -> None:
        t0 = self._arrival.get(seq_id)
        if t0 is not None:
            self.ttft_s.append(time.perf_counter() - t0)

    def on_finished(self, seq_id: int) -> None:
        t0 = self._arrival.pop(seq_id, None)
        if t0 is not None:
            self.e2e_s.append(time.perf_counter() - t0)

    @staticmethod
    def _pct(xs: list, p: float) -> float:
        if not xs:
            return 0.0
        xs = sorted(xs)
        i = min(int(len(xs) * p), len(xs) - 1)
        return xs[i]

    def summary(self) -> dict:
        return {
            "prefill_tok_per_s": self.prefill_tokens / self.prefill_time_s
            if self.prefill_time_s else 0.0,
            "decode_tok_per_s": self.decode_tokens / self.decode_time_s
            if self.decode_time_s else 0.0,
            "prefill_tokens": self.prefill_tokens,
            "decode_tokens": self.decode_tokens,
            "num_prefill_steps": self.num_prefill_steps,
            "num_decode_steps": self.num_decode_steps,
            "ttft_p50_s": self._pct(self.ttft_s, 0.5),
            "ttft_p99_s": self._pct(self.ttft_s, 0.99),
            "e2e_p50_s": self._pct(self.e2e_s, 0.5),
            "num_preemptions": self.num_preemptions,
            "jit_serve_compiles": self.jit_serve_compiles,
            "host_prep_s": self.host_prep_s,
            "warmup_programs": self.warmup_programs,
            "warmup_time_s": self.warmup_time_s,
        }


class ProfilerHook:
    """Wraps jax.profiler tracing around a span of engine steps."""

    def __init__(self, trace_dir: str | None):
        self.trace_dir = trace_dir
        self._active = False

    def start(self):
        if self.trace_dir and not self._active:
            import jax

            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def stop(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
