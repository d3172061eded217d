"""Top-level engine: request intake, step loop, detokenization.

API parity with the reference engine
(`/root/reference/nanovllm/engine/llm_engine.py:17-93`):
``add_request(prompt | token_ids, sampling_params)``, ``step() -> (outputs,
num_tokens)`` with the same sign contract (>0 = prefill tokens, <0 = -decode
tokens, llm_engine.py:48-54), ``generate`` returning ``{"text", "token_ids"}``
dicts in request order, live prefill/decode throughput display.

No worker processes: the runner drives a (possibly multi-device) jitted
program from this single controller (multi-host replicates this engine via
jax.distributed — deterministic scheduling + seeded sampling keep replicas in
lockstep, replacing the reference's SHM pickle RPC, model_runner.py:49-91).
"""

from __future__ import annotations

import atexit
import logging
import time

from glm4_moe_nano_vllm_tpu.config import Config
from glm4_moe_nano_vllm_tpu.engine.metrics import EngineMetrics
from glm4_moe_nano_vllm_tpu.engine.model_runner import ModelRunner
from glm4_moe_nano_vllm_tpu.engine.scheduler import Scheduler
from glm4_moe_nano_vllm_tpu.engine.sequence import Sequence
from glm4_moe_nano_vllm_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class LLMEngine:
    def __init__(self, model: str, **kwargs):
        config_fields = {f for f in Config.__dataclass_fields__}
        config_kwargs = {k: v for k, v in kwargs.items() if k in config_fields}
        unknown = set(kwargs) - set(config_kwargs)
        if unknown:
            raise TypeError(f"unknown engine arguments: {sorted(unknown)}")
        config = Config(model, **config_kwargs)

        self.tokenizer = None
        if model:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(model)
            if config.eos in (-1, None) and self.tokenizer.eos_token_id is not None:
                config.eos = self.tokenizer.eos_token_id

        self.config = config
        if config.num_processes > 1:
            from glm4_moe_nano_vllm_tpu.parallel.multihost import (
                initialize_multihost,
            )

            initialize_multihost(
                coordinator_address=config.coordinator_address or None,
                num_processes=config.num_processes,
                process_id=config.process_id if config.process_id >= 0 else None,
            )
        mesh = None
        if (config.tensor_parallel_size * config.data_parallel_size
                * config.pipeline_parallel_size > 1):
            from glm4_moe_nano_vllm_tpu.parallel.sharding import make_mesh

            mesh = make_mesh(dp=config.data_parallel_size,
                             tp=config.tensor_parallel_size,
                             pp=config.pipeline_parallel_size)
        self.model_runner = ModelRunner(config, mesh=mesh)
        self.scheduler = Scheduler(config)
        self.metrics = EngineMetrics()
        self._profiled = False  # one jax.profiler trace per engine
        self.scheduler.metrics = self.metrics
        self.model_runner.metrics = self.metrics
        if not config.enforce_eager:
            self.model_runner.warmup()
        atexit.register(self.exit)

    def exit(self):
        pass  # no worker processes / shared memory to tear down

    # ---- request intake --------------------------------------------------

    def add_request(self, prompt: str | list[int], sampling_params: SamplingParams):
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "string prompts need a tokenizer"
            prompt = self.tokenizer.encode(prompt)
        if not prompt:
            raise ValueError("prompt must contain at least one token")
        if len(prompt) >= self.config.max_model_len:
            raise ValueError(
                f"prompt length {len(prompt)} exceeds max_model_len "
                f"{self.config.max_model_len} (need >=1 slot for generation)"
            )
        bs = self.config.kvcache_block_size
        need = (len(prompt) + 1 + bs - 1) // bs
        if need > self.config.num_kvcache_blocks:
            raise ValueError(
                f"prompt needs {need} KV blocks but the cache has only "
                f"{self.config.num_kvcache_blocks} (prompt length {len(prompt)})"
            )
        seq = Sequence(prompt, sampling_params,
                       block_size=self.config.kvcache_block_size)
        self.scheduler.add(seq)
        self.metrics.on_request(seq.seq_id)
        return seq

    # ---- stepping --------------------------------------------------------

    def step(self):
        """Run one engine iteration.

        Returns ``(outputs, num_tokens)`` where outputs are the finished
        sequences' ``(seq_id, completion_token_ids)`` and num_tokens follows
        the reference sign convention (prefill positive / decode negative).
        """
        t0 = time.perf_counter()
        batch = self.scheduler.schedule()
        outputs = []
        for seq in self.scheduler.just_failed:
            logger.warning("request %d failed: %s", seq.seq_id, seq.error)
            self.metrics.on_finished(seq.seq_id)
            outputs.append((seq.seq_id, seq.completion_token_ids))
        self.scheduler.just_failed.clear()
        if batch is None:  # every request failed on capacity
            return outputs, 0
        token_ids = self.model_runner.run(batch)
        self.scheduler.postprocess(batch, token_ids)
        self.metrics.on_step(batch.is_prefill, batch.num_tokens,
                             time.perf_counter() - t0)
        seen = set()
        for seq in batch.seqs:
            # sequence-parallel prefill may schedule one seq as several rows
            if seq.seq_id in seen:
                continue
            seen.add(seq.seq_id)
            if seq.num_completion_tokens == 1:
                self.metrics.on_first_token(seq.seq_id)
            if seq.is_finished:
                self.metrics.on_finished(seq.seq_id)
                outputs.append((seq.seq_id, seq.completion_token_ids))
        # Reference contract: > 0 = prefill tokens, < 0 = decode
        # (llm_engine.py:48-54). Decode magnitude is total tokens generated
        # this step (= seqs x num_steps under multi-step scheduling; the
        # reference always decodes one per seq).
        num_tokens = batch.num_tokens if batch.is_prefill else -batch.num_tokens
        return outputs, num_tokens

    def is_finished(self) -> bool:
        return self.scheduler.is_finished()

    # ---- generate --------------------------------------------------------

    def generate(
        self,
        prompts: list[str] | list[list[int]],
        sampling_params: SamplingParams | list[SamplingParams],
        use_tqdm: bool = True,
    ) -> list[dict]:
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        seqs = [self.add_request(p, sp) for p, sp in zip(prompts, sampling_params)]
        order = {seq.seq_id: i for i, seq in enumerate(seqs)}

        pbar = None
        if use_tqdm:
            try:
                from tqdm.auto import tqdm

                pbar = tqdm(total=len(seqs), desc="Generating", dynamic_ncols=True)
            except ImportError:
                pass

        profiling = False
        if getattr(self.config, "profile_dir", "") and not self._profiled:
            # one trace per engine (jax.profiler supports a single session);
            # view with tensorboard or xprof
            import jax

            jax.profiler.start_trace(self.config.profile_dir)
            profiling = self._profiled = True

        outputs: dict[int, list[int]] = {}
        prefill_tput = decode_tput = 0.0
        while not self.is_finished():
            t0 = time.perf_counter()
            done, num_tokens = self.step()
            dt = time.perf_counter() - t0
            if num_tokens > 0:
                prefill_tput = num_tokens / dt
            else:
                decode_tput = -num_tokens / dt
            for seq_id, completion in done:
                outputs[seq_id] = completion
                if pbar:
                    pbar.set_postfix({
                        "Prefill": f"{int(prefill_tput)}tok/s",
                        "Decode": f"{int(decode_tput)}tok/s",
                    })
                    pbar.update(1)
        if pbar:
            pbar.close()
        if profiling:
            import jax

            jax.profiler.stop_trace()

        results = []
        for seq in seqs:
            t = outputs[seq.seq_id]
            r = {
                "text": self.tokenizer.decode(t) if self.tokenizer else "",
                "token_ids": t,
            }
            if seq.error is not None:
                r["error"] = seq.error
            results.append(r)
        return results
