"""Model runner: batch preparation + jitted fixed-shape step programs.

TPU-native counterpart of the reference ModelRunner
(`/root/reference/nanovllm/engine/model_runner.py`):
  * ``prepare`` builds padded numpy arrays for a bucket shape — replacing
    prepare_prefill/prepare_decode's flat varlen pinned-CPU tensors
    (model_runner.py:133-187);
  * one ``jax.jit``-compiled step per (num_seqs, q_len, max_blocks) bucket
    replaces CUDA-graph capture/replay (model_runner.py:223-258): XLA
    compiles the whole forward+sample program, caches by shape, and the
    warmup loop AOT-compiles the decode bucket ladder;
  * KV cache sizing from the device HBM budget replaces the
    free-VRAM-derived allocation (model_runner.py:108-125);
  * the KV cache pytree is donated every step, so XLA updates it in place.

There is no per-rank worker process or SHM RPC (model_runner.py:49-91): on
TPU, sharding is expressed with a device mesh inside one controller process
(multi-host uses JAX's multi-controller runtime with this same code running
replicated on every host).
"""

from __future__ import annotations

import bisect
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from glm4_moe_nano_vllm_tpu.config import Config
from glm4_moe_nano_vllm_tpu.engine.batch import BatchInfo
from glm4_moe_nano_vllm_tpu.engine.scheduler import ScheduledBatch
from glm4_moe_nano_vllm_tpu.layers.sampler import sample
from glm4_moe_nano_vllm_tpu.models.registry import build_model

logger = logging.getLogger(__name__)

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "int8": jnp.int8,  # scaled KV cache with native v5e int8->f32 convert
}


def bucket_of(n: int, buckets: tuple) -> int:
    """Smallest bucket >= n (last bucket if n exceeds all)."""
    i = bisect.bisect_left(buckets, n)
    return buckets[min(i, len(buckets) - 1)]


class ModelRunner:
    def __init__(self, config: Config, mesh=None, params=None):
        self.config = config
        mc = config.model_config
        self.dtype = _DTYPES[config.dtype]
        self.kv_dtype = _DTYPES[config.kv_cache_dtype]
        self.mesh = mesh
        try:  # engine-scoped decode-attention chunk size (traced-in shape)
            from glm4_moe_nano_vllm_tpu.ops.paged_attention_pallas import (
                set_pa_chunk,
            )

            set_pa_chunk(config.pa_chunk_tokens)
        except Exception:  # pallas import can fail off-TPU; XLA path then
            pass
        self.model = build_model(mc, self.dtype)

        t0 = time.perf_counter()
        if params is not None:
            # rebuild the container structure (leaves shared): the runner
            # restructures the pytree in place below (scale-row padding,
            # scale casts, qkv fusion deletes wq/wk/wv) and must not
            # mutate the caller's dicts
            self.params = jax.tree.map(lambda x: x, params)
        elif config.model:
            from glm4_moe_nano_vllm_tpu.utils.loader import load_params

            self.params = load_params(self.model, config.model, mesh=mesh)
        else:
            self.params = self.model.init_params(jax.random.PRNGKey(0))
        self._pad_expert_scale_rows()
        self._cast_quant_scales()
        if mesh is None:
            self._fuse_qkv_projections()
            self._fuse_gate_up()
        logger.info("params ready in %.1fs", time.perf_counter() - t0)

        self.num_blocks = self._compute_num_blocks()
        config.num_kvcache_blocks = self.num_blocks
        self.caches = self.model.init_caches(
            self.num_blocks, config.kvcache_block_size, self.kv_dtype
        )
        self._min_bucket = 1
        self._batch_shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding

            from glm4_moe_nano_vllm_tpu.parallel.sharding import (
                batch_specs,
                cache_specs,
                param_specs,
                resolve_moe_parallel,
                shard_tree,
                validate_model_for_mesh,
            )

            pp = mesh.shape.get("pp", 1)
            moe_ep = resolve_moe_parallel(
                mc, mesh.shape["tp"], config.moe_parallel, pp
            )
            replicate_kv = validate_model_for_mesh(mc, mesh.shape["tp"], moe_ep)
            config.expert_parallel_size = mesh.shape["tp"] if moe_ep else 1
            self.model.mesh = mesh
            if mc.is_moe:
                self.model.moe_ep = moe_ep
                self.model.ep_dispatch = config.ep_dispatch
            pp_stack = None
            pp_cache_keys = ()
            if pp > 1:
                assert self.model.pipeline_stack_size % pp == 0, (
                    self.model.pipeline_stack_size, pp,
                )
                self.model.pp = pp
                self.model.pp_microbatches = config.pp_microbatches
                pp_stack = self.model.pipeline_stack
                pp_cache_keys = self.model.pipeline_cache_keys
            self.params = shard_tree(
                self.params,
                param_specs(self.params, replicate_kv, moe_ep, pp_stack),
                mesh,
            )
            self.caches = shard_tree(
                self.caches, cache_specs(self.caches, replicate_kv, pp_cache_keys),
                mesh,
            )
            self._batch_shardings = jax.tree.map(
                lambda s: NamedSharding(mesh, s), batch_specs(None)
            )
            # batch buckets must be divisible by dp (and by the microbatch
            # grid dp·num_mb when pipelining)
            self._min_bucket = mesh.shape["dp"] * (
                (config.pp_microbatches or pp) if pp > 1 else 1
            )
        self.block_size = config.kvcache_block_size
        # Block-table bucket ladder. Default: one full-size bucket — the
        # Pallas kernels bound their loops by context_len, so padding the
        # table costs nothing, and every extra bucket is a full XLA program
        # compile. "pow2" trades compiles for smaller XLA-path gathers.
        mb = config.max_blocks_per_seq
        if config.block_bucket_policy == "pow2":
            self.block_buckets = tuple(sorted(
                {min(2 ** i, mb) for i in range(0, 32) if 2 ** (i - 1) < mb} | {mb}
            ))
        else:
            self.block_buckets = (mb,)
        self._base_key = jax.random.PRNGKey(config.rng_seed)
        self._step_counter = 0

        self._jit_step = jax.jit(self._step_fn, donate_argnums=(1,))
        self._jit_multi = jax.jit(
            self._multi_step_fn, donate_argnums=(1,), static_argnums=(4,)
        )
        # program shapes executed so far; after warmup, any new key is a
        # serve-time XLA compile (reported via EngineMetrics)
        self._compiled: set = set()
        self.metrics = None  # optionally set by the engine

    def _pad_expert_scale_rows(self):
        """Pad INT4 expert zp/scale KG rows to the sublane tiling ONCE.

        The MoE Pallas kernels need 8-aligned KG blocks; padding at trace
        time re-executes per scanned layer per micro-step (measured
        5.8 ms/step at Air widths — the f32 scale stack is 117 MB). The
        kernels receive the true group via ``quant_group`` (the model
        passes cfg.quant.group_size), so padded rows are never read."""
        mc = self.config.model_config
        ml = self.params.get("moe_layers") if isinstance(self.params, dict) \
            else None
        if not (mc.is_moe and mc.quant is not None and ml):
            return
        for key in ("expert_gate", "expert_up", "expert_down"):
            d = ml.get(key)
            if not (isinstance(d, dict) and "zp" in d):
                continue  # int4 only; int8 v1 kernels expect unpadded rows
            for leaf in ("zp", "scale"):
                arr = d[leaf]
                kg = arr.shape[-2]
                if kg % 8 == 0:
                    continue
                pad = [(0, 0)] * arr.ndim
                pad[-2] = (0, -(-kg // 8) * 8 - kg)
                d[leaf] = jnp.pad(arr, pad)

    def _cast_quant_scales(self):
        """Cast quant-dict scale planes to QuantConfig.scale_dtype ONCE.

        The decode step re-reads every weight stream per micro-step, and
        f32 scale planes are 3-6% of the packed INT4 bytes; bf16 storage
        halves them. The cast must happen at init — the kernels cast the
        per-block scale refs back to f32 in-VMEM (a per-group-row op, ~1/kt
        of the per-weight work), and a trace-time astype would materialize
        a full f32 copy per scanned layer per step (the KG-pad lesson,
        _pad_expert_scale_rows)."""
        qc = self.config.model_config.quant
        if qc is None or qc.scale_dtype in ("float32", "fp32"):
            return
        dt = _DTYPES[qc.scale_dtype]

        def walk(node):
            if isinstance(node, dict):
                if "qw" in node and "scale" in node:
                    node["scale"] = node["scale"].astype(dt)
                else:
                    for v in node.values():
                        walk(v)
            elif isinstance(node, (list, tuple)):
                # quant dicts nested in sequences would otherwise be
                # silently skipped (f32 scales: correct but slower)
                for v in node:
                    walk(v)

        walk(self.params)

    def _fuse_qkv_projections(self):
        """Concatenate quantized q/k/v projection weights along N ONCE so
        decode runs ONE dense-kernel call per layer instead of three.

        The Air decode profile attributes ~0.4 ms/micro-step to the fixed
        per-call cost of the 24 extra `_dense_call` launches (wk/wv stream
        only ~2.4 MB each — far below the pipeline's amortization point).
        AWQ quant groups run along K, so an N-concat never crosses a group:
        each output column keeps exactly its own qw/zp/scale columns and the
        fused matmul is bit-identical per column to the three it replaces.

        Single-chip only (``mesh is None``): under tp the three weights
        shard on different head counts (nq vs nkv), which a flat N-concat
        cannot express as one PartitionSpec."""
        if self.mesh is not None or not isinstance(self.params, dict):
            return
        for stack in ("layers", "moe_layers", "dense_layers"):
            p = self.params.get(stack)
            if not isinstance(p, dict) or not isinstance(p.get("wq"), dict):
                continue
            if not (isinstance(p.get("wk"), dict)
                    and isinstance(p.get("wv"), dict)):
                continue
            wq, wk, wv = p["wq"], p["wk"], p["wv"]
            p["wqkv"] = {
                key: jnp.concatenate([wq[key], wk[key], wv[key]], axis=-1)
                for key in wq
            }
            del p["wq"], p["wk"], p["wv"]
            if "bq" in p:
                p["bqkv"] = jnp.concatenate(
                    [p.pop("bq"), p.pop("bk"), p.pop("bv")], axis=-1)

    def _fuse_gate_up(self):
        """Concatenate quantized gate/up MLP weights along N ONCE so the
        dense-layer MLP runs one matmul for the SiLU pair (same argument as
        _fuse_qkv_projections: AWQ/int8 groups run along K, so an N-concat
        never crosses a group and each output column is bit-identical).
        Single-chip only: under tp gate/up shard on I independently."""
        if self.mesh is not None or not isinstance(self.params, dict):
            return
        for stack in ("layers", "dense_layers"):
            p = self.params.get(stack)
            if not isinstance(p, dict) or not isinstance(p.get("gate"), dict):
                continue
            if not isinstance(p.get("up"), dict):
                continue
            g, u = p["gate"], p["up"]
            p["wgu"] = {
                key: jnp.concatenate([g[key], u[key]], axis=-1) for key in g
            }
            del p["gate"], p["up"]

    # ---- device programs ---------------------------------------------------

    def _replicated(self, tokens):
        """Constrain sampled tokens to a fully-replicated layout: under dp
        the sample is row-sharded, but the (replicated, deterministic) host
        scheduler on every process needs all of it (multi-host: the
        all-gather of a few hundred int32s rides ICI, not the host)."""
        if self.mesh is None:
            return tokens
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            tokens, NamedSharding(self.mesh, P())
        )

    def _step_fn(self, params, caches, batch: BatchInfo, key):
        logits, caches = self.model.forward(params, caches, batch)
        tokens = sample(logits, batch.temperatures, key)
        return self._replicated(tokens), caches

    def _multi_step_fn(self, params, caches, batch: BatchInfo, key, n_steps: int):
        """n_steps decode iterations in one program (multi-step scheduling):
        each step feeds its sampled token to the next; only the [n, B] token
        block crosses back to the host. Replaces n host round trips with one
        (the round trip dominates decode latency on remote accelerators)."""
        bs = self.block_size
        b = batch.num_seqs
        rows = jnp.arange(b, dtype=jnp.int32)
        zeros_b = jnp.zeros((b,), jnp.int32)

        def body(carry, s):
            caches, tok, pos, ctx = carry
            active = ctx > 0  # padded rows never write
            slot = jnp.where(
                active,
                batch.block_tables[rows, pos // bs] * bs + pos % bs,
                -1,
            )
            info = BatchInfo(
                token_ids=tok[:, None],
                positions=pos[:, None],
                slot_mapping=slot,
                block_tables=batch.block_tables,
                context_lens=ctx,
                last_q_idx=zeros_b,
                temperatures=batch.temperatures,
            )
            logits, caches = self.model.forward(params, caches, info)
            nxt = sample(logits, batch.temperatures, jax.random.fold_in(key, s))
            pos = jnp.where(active, pos + 1, pos)
            ctx = jnp.where(active, ctx + 1, ctx)
            return (caches, nxt, pos, ctx), nxt

        init = (caches, batch.token_ids[:, 0], batch.positions[:, 0],
                batch.context_lens)
        (caches, *_), tokens = jax.lax.scan(
            body, init, jnp.arange(n_steps, dtype=jnp.int32)
        )
        return self._replicated(tokens), caches  # tokens [n_steps, B]

    # ---- memory ----------------------------------------------------------

    def _kv_bytes_per_block(self) -> int:
        mc = self.config.model_config
        itemsize = jnp.dtype(self.kv_dtype).itemsize
        bs = self.config.kvcache_block_size
        per_block = bs * mc.head_dim * itemsize
        from glm4_moe_nano_vllm_tpu.ops.kv_cache import (
            SCALED_KV_QMAX,
            scale_lanes,
        )

        if jnp.dtype(self.kv_dtype) in SCALED_KV_QMAX:
            per_block += scale_lanes(bs) * 4  # f32 scale plane per block
        return 2 * mc.num_layers * mc.num_kv_heads * per_block

    def _compute_num_blocks(self) -> int:
        cfg = self.config
        if cfg.num_kvcache_blocks > 0:
            return cfg.num_kvcache_blocks
        # HBM budget: total * utilization - live bytes (params), like the
        # reference's free-VRAM computation (model_runner.py:108-119).
        dev = jax.devices()[0]
        total = cfg.hbm_bytes
        used = sum(
            x.nbytes for x in jax.tree.leaves(self.params)
        )
        if total <= 0:
            stats = getattr(dev, "memory_stats", lambda: None)() or {}
            total = stats.get("bytes_limit", 0)
        if total <= 0:
            # CPU / unknown backend: modest default
            n = max((cfg.max_model_len * cfg.max_num_seqs) // cfg.kvcache_block_size, 16)
            return min(n, 4096)
        budget = int(total * cfg.gpu_memory_utilization) - used
        n = budget // self._kv_bytes_per_block()
        assert n > 0, "no HBM left for KV cache"
        return n

    # ---- batch preparation ----------------------------------------------

    def prepare(self, batch: ScheduledBatch) -> BatchInfo:
        seqs, q_lens = batch.seqs, batch.q_lens
        cfg = self.config
        if batch.is_prefill:
            b = bucket_of(len(seqs), cfg.prefill_seq_buckets)
            s = bucket_of(max(q_lens), cfg.prefill_len_buckets)
        else:
            b = bucket_of(len(seqs), cfg.decode_buckets)
            s = 1
        # round up to the dp (× pp-microbatch) grid
        m = self._min_bucket
        b = -(-max(b, m) // m) * m

        starts = batch.q_starts or [seq.num_computed_tokens for seq in seqs]
        window = 0 if batch.is_prefill else batch.num_steps - 1
        max_ctx_blocks = max(
            (start + q + window + self.block_size - 1) // self.block_size
            for start, q in zip(starts, q_lens)
        )
        mb = bucket_of(max_ctx_blocks, self.block_buckets)
        self._last_shape = (batch.is_prefill, b, s, mb)

        token_ids = np.zeros((b, s), np.int32)
        positions = np.zeros((b, s), np.int32)
        block_tables = np.zeros((b, mb), np.int32)
        context_lens = np.zeros((b,), np.int32)
        last_q_idx = np.zeros((b,), np.int32)
        temperatures = np.zeros((b,), np.float32)

        # only the ragged per-seq data (token slices, block tables) needs a
        # Python loop; everything else is batched numpy below (a 256-seq
        # prefill step used to spend O(B) fancy-indexing ops here)
        for i, (seq, q, start) in enumerate(zip(seqs, q_lens, starts)):
            token_ids[i, :q] = seq.token_ids[start:start + q]
            bt = seq.block_table
            # bt may cover the whole prompt while this chunk's context doesn't
            n_bt = min(len(bt), mb)
            block_tables[i, :n_bt] = bt[:n_bt]

        nr = len(seqs)
        starts_np = np.asarray(starts, np.int32)
        q_np = np.asarray(q_lens, np.int32)
        ar = np.arange(s, dtype=np.int32)[None, :]
        valid = ar < q_np[:, None]
        pos = np.where(valid, starts_np[:, None] + ar, 0)
        positions[:nr] = pos
        bs_ = self.block_size
        slots = (np.take_along_axis(block_tables[:nr], pos // bs_, axis=1)
                 * bs_ + pos % bs_)
        slot_mapping = np.full((b, s), -1, np.int32)
        slot_mapping[:nr] = np.where(valid, slots, -1)
        context_lens[:nr] = starts_np + q_np
        last_q_idx[:nr] = q_np - 1
        temperatures[:nr] = np.fromiter(
            (seq.temperature for seq in seqs), np.float32, count=nr
        )

        info = BatchInfo(
            token_ids=jnp.asarray(token_ids),
            positions=jnp.asarray(positions),
            slot_mapping=jnp.asarray(slot_mapping.reshape(-1)),
            block_tables=jnp.asarray(block_tables),
            context_lens=jnp.asarray(context_lens),
            last_q_idx=jnp.asarray(last_q_idx),
            temperatures=jnp.asarray(temperatures),
        )
        if self._batch_shardings is not None:
            info = jax.device_put(info, self._batch_shardings)
        return info

    # ---- execution -------------------------------------------------------

    def run(self, batch: ScheduledBatch):
        """Prefill: returns [B] sampled token ids. Decode: returns a per-seq
        list of ``batch.num_steps`` token ids."""
        t_prep = time.perf_counter()
        info = self.prepare(batch)
        if self.metrics is not None:
            self.metrics.host_prep_s += time.perf_counter() - t_prep
        key = jax.random.fold_in(self._base_key, self._step_counter)
        self._step_counter += 1
        n = len(batch.seqs)
        prog = self._last_shape + (1 if batch.is_prefill else batch.num_steps,)
        if prog not in self._compiled:
            self._compiled.add(prog)
            if self.metrics is not None:
                self.metrics.jit_serve_compiles += 1
                logger.info("serve-time compile: prefill=%s b=%d s=%d mb=%d "
                            "steps=%d", *prog)
        if batch.is_prefill:
            tokens, self.caches = self._jit_step(self.params, self.caches, info, key)
            return np.asarray(tokens)[:n].tolist()
        if batch.num_steps == 1:
            tokens, self.caches = self._jit_step(self.params, self.caches, info, key)
            return [[t] for t in np.asarray(tokens)[:n].tolist()]
        tokens, self.caches = self._jit_multi(
            self.params, self.caches, info, key, batch.num_steps
        )
        return np.asarray(tokens).T[:n].tolist()  # [B][n_steps]

    def _dummy_info(self, b: int, s: int, mb: int) -> BatchInfo:
        """Bucket-shaped batch whose writes are all slot == -1 no-ops (the
        reference's padding convention for graph capture, model_runner.py:207)."""
        return BatchInfo(
            token_ids=jnp.zeros((b, s), jnp.int32),
            positions=jnp.zeros((b, s), jnp.int32),
            slot_mapping=jnp.full((b * s,), -1, jnp.int32),
            block_tables=jnp.zeros((b, mb), jnp.int32),
            context_lens=jnp.zeros((b,), jnp.int32),
            last_q_idx=jnp.zeros((b,), jnp.int32),
            temperatures=jnp.zeros((b,), jnp.float32),
        )

    def warmup(self):
        """AOT-compile every program the serving loop can reach (TPU stand-in
        for CUDA-graph capture + max-shape prefill warmup, reference
        model_runner.py:99-106, 223-258):
          * decode at every (bucket, block-bucket, window) — the default
            decode path is the ``_jit_multi`` multi-step scan, and the
            scheduler emits any power-of-two window <= num_scheduler_steps;
          * prefill at the reachable (seq-bucket, len-bucket) *frontier*: for
            each len bucket, the largest seq bucket under the token budget
            plus the smallest bucket (queue-tail steps). Set
            ``warmup_prefill="all"`` for the exhaustive product, "off" to
            skip.
        Serve-time compiles after warmup are counted in EngineMetrics
        (``jit_serve_compiles``)."""
        t0 = time.perf_counter()
        cfg = self.config
        key = jax.random.PRNGKey(0)
        tokens = None
        shapes: list = []

        def run_shape(is_prefill, b, s, mb, steps):
            # collection pass: execution happens after the parallel
            # precompile below
            self._compiled.add((is_prefill, b, s, mb, steps))
            shapes.append((is_prefill, b, s, mb, steps))

        def execute(shape):
            nonlocal tokens
            is_pf, b, s, mb, steps = shape
            info = self._dummy_info(b, s, mb)
            if steps == 1:
                tokens, self.caches = self._jit_step(
                    self.params, self.caches, info, key)
            else:
                tokens, self.caches = self._jit_multi(
                    self.params, self.caches, info, key, steps)

        def precompile():
            """AOT-compile the ladder CONCURRENTLY before the serial
            executions below. ``lower().compile()`` is buffer-free (no
            donation hazards), the remote/XLA compiles overlap across a
            thread pool, and results land in the persistent compilation
            cache — the serial run_shape calls then re-compile from cache
            in ~ms while populating the jit dispatch caches. Measured on
            the driver bench: 14 programs 99.9 s serial → overlapped
            (VERDICT r4 item 5c)."""
            if cfg.warmup_compile_workers <= 1 or not shapes:
                return
            from concurrent.futures import ThreadPoolExecutor

            # Tracing (lower) runs SERIALLY: the models keep the out-of-xs
            # weight stacks on mutable attributes during a trace, so
            # concurrent traces race and leak tracers. Only the backend
            # compile — the expensive remote/XLA part — is pooled.
            lowered = []
            for shape in shapes:
                is_pf, b, s, mb, steps = shape
                info = self._dummy_info(b, s, mb)
                try:
                    if steps == 1:
                        lowered.append(self._jit_step.lower(
                            self.params, self.caches, info, key))
                    else:
                        lowered.append(self._jit_multi.lower(
                            self.params, self.caches, info, key, steps))
                except Exception as e:  # noqa: BLE001 — warmup best-effort
                    logger.warning("warmup lower failed for %s: %r",
                                   shape, e)

            def one(lo):
                try:
                    lo.compile()
                except Exception as e:  # noqa: BLE001
                    logger.warning("warmup precompile failed: %r", e)

            with ThreadPoolExecutor(cfg.warmup_compile_workers) as pool:
                list(pool.map(one, lowered))

        windows = [1]
        while windows[-1] * 2 <= cfg.num_scheduler_steps:
            windows.append(windows[-1] * 2)
        m = self._min_bucket
        seen = set()
        for b in cfg.decode_buckets:
            if b > cfg.max_num_seqs:
                break
            b = -(-max(b, m) // m) * m  # dp/microbatch grid (as prepare())
            if b in seen:
                continue
            seen.add(b)
            for mb in self.block_buckets:
                for w in windows:
                    run_shape(False, b, 1, mb, w)

        if cfg.warmup_prefill != "off":
            mb = self.block_buckets[-1] if len(self.block_buckets) == 1 else None
            for s in cfg.prefill_len_buckets:
                bs = [b for b in cfg.prefill_seq_buckets
                      if b * s <= cfg.max_num_batched_tokens and b <= cfg.max_num_seqs]
                if not bs:
                    bs = [cfg.prefill_seq_buckets[0]]
                if cfg.warmup_prefill != "all":
                    bs = sorted({bs[0], bs[-1]})
                for b in bs:
                    b = -(-max(b, m) // m) * m
                    # a prefill of b rows x s tokens can touch at most this
                    # many blocks per row (chunked continuations can start
                    # deeper: warm the full table when one bucket exists)
                    row_mb = mb if mb is not None else bucket_of(
                        (s + self.block_size - 1) // self.block_size,
                        self.block_buckets,
                    )
                    if (True, b, s, row_mb, 1) not in self._compiled:
                        run_shape(True, b, s, row_mb, 1)

        precompile()
        for shape in shapes:
            execute(shape)
        if tokens is not None:
            tokens.block_until_ready()
        dt = time.perf_counter() - t0
        if self.metrics is not None:  # cold-start cost, auditable in bench
            self.metrics.warmup_programs = len(self._compiled)
            self.metrics.warmup_time_s = dt
        logger.info("warmup compiled %d programs in %.1fs",
                    len(self._compiled), dt)
