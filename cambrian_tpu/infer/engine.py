"""Inference runtime: jitted prefill + KV-cache decode with greedy/sampling.

Replaces the reference's HF ``generate`` path (cambrian_llama.py:437-483):
prefill runs towers + SVA + decoder once and fills the cache; decode steps are
a separate jitted function over static shapes. Vision features are explicit
carries — the reference's ``self.``-stash (cambrian_llama.py:471-474) is
incompatible with batching >1 request (SURVEY.md §7 hard-part 6).

The decode loop runs on host with a jitted step (recompile-free across steps
and requests of the same batch shape); a fully-on-device ``lax.while_loop``
variant is used by ``generate_on_device`` for throughput benches.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.cambrian import CambrianLM
from ..models.language.llama import init_kv_cache


@dataclass
class GenerationConfig:
    max_new_tokens: int = 128
    temperature: float = 0.0        # 0 => greedy
    top_p: float = 1.0
    eos_token_id: Optional[int] = None
    pad_token_id: int = 0
    seed: int = 0
    # streaming: tokens decoded per device dispatch (generate_stream). Each
    # host round trip costs ~30 ms on tunneled chips and one dispatch on any
    # chip; chunking amortizes it while keeping incremental text. 1 = legacy
    # per-token streaming. Ignored (forced to 1) when a Python-side stopping
    # callable is supplied, so stopping criteria keep per-token granularity.
    stream_chunk: int = 8


def sample_token(logits: jnp.ndarray, rng, temperature: float, top_p: float):
    """[B, V] -> [B] next tokens (greedy when temperature==0)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def sample_token_per_slot(logits: jnp.ndarray, rng, temps: jnp.ndarray,
                          top_ps: jnp.ndarray) -> jnp.ndarray:
    """Per-row ``sample_token``: [B, V] logits with per-slot temperature /
    top_p vectors [B] -> [B] int32. Rows with temperature 0 are greedy.
    Used by the continuous-batching chunked decode, where slots with
    different generation configs advance in one compiled program."""
    greedy = jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_ps[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    filtered = jnp.where((top_ps[:, None] < 1.0) & (scaled < cutoff),
                         -jnp.inf, scaled)
    sampled = jax.random.categorical(rng, filtered, axis=-1)
    return jnp.where(temps == 0.0, greedy, sampled).astype(jnp.int32)


class GenerationEngine:
    """Batched multimodal generation over a fixed-size KV cache."""

    def __init__(self, model: CambrianLM, params, towers: Sequence = (),
                 max_len: int = 4096, cache_dtype=jnp.bfloat16, mesh=None):
        """``mesh``: optional (data, fsdp, model) Mesh for sharded inference
        (34B-class decoders on small slices — SURVEY.md §7 hard-part 7).
        Params are sharded by the training rules (dim-0 FSDP + TP); the KV
        cache shards batch over (data, fsdp) and kv heads over model."""
        self.model = model
        self.towers = list(towers)
        self.max_len = max_len
        self.cache_dtype = cache_dtype
        self.mesh = mesh

        if mesh is not None:
            from ..parallel.sharding import infer_param_shardings

            self._param_sh = infer_param_shardings(params, mesh)
            self.params = jax.device_put(params, self._param_sh)
        else:
            self.params = params

        self._prefill = self._jit(self._prefill_impl)
        self._step = self._jit(self._step_impl)
        self._encode = self._jit(self._encode_impl)
        self._on_device_fns = {}
        self._chunk_fns = {}

    def _jit(self, fn, **jit_kwargs):
        """jit that traces (and runs) under ``jax.set_mesh(self.mesh)``.

        The mesh context, not just sharded inputs, must be live during
        tracing: flash_attention consults ``get_abstract_mesh()`` to wrap its
        pallas_call in a shard_map (GSPMD cannot auto-partition Mosaic
        kernels), and the quant matmuls use it to pick their partitionable
        XLA form."""
        jfn = jax.jit(fn, **jit_kwargs)
        if self.mesh is None:
            return jfn

        def call(*args, **kwargs):
            with jax.set_mesh(self.mesh):
                return jfn(*args, **kwargs)

        return call

    def init_cache(self, batch: int, k_len: int):
        cache = init_kv_cache(self.model.cfg, batch, k_len, self.cache_dtype)
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding, PartitionSpec as P

        kvh = self.model.cfg.num_key_value_heads
        dp = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
        spec = P(
            ("data", "fsdp") if batch % dp == 0 and dp > 1 else None,
            None,
            "model" if kvh % self.mesh.shape["model"] == 0 else None,
            None,
        )
        sh = NamedSharding(self.mesh, spec)
        return jax.tree.map(lambda x: jax.device_put(x, sh), cache)

    # -- jitted impls -------------------------------------------------------

    def _encode_impl(self, tower_params, images):
        return [t.apply(tp, px)
                for t, tp, px in zip(self.towers, tower_params, images)]

    def _prefill_impl(self, params, input_ids, attention_mask, position_ids,
                      cache, aux_features, aux_masks):
        return self.model.apply(
            params, input_ids, attention_mask, position_ids, cache,
            aux_features, aux_masks, method=CambrianLM.prefill,
        )

    def _step_impl(self, params, token, position, cache, cache_valid, cache_index):
        return self.model.apply(
            params, token, position, cache, cache_valid, cache_index,
            method=CambrianLM.decode_step,
        )

    def _generate_on_device_impl(self, params, input_ids, attention_mask,
                                 position_ids, cache, aux_features, aux_masks,
                                 rng, *, max_new_tokens, temperature, top_p,
                                 eos_token_id, pad_token_id):
        """Whole generation (prefill + decode loop) as ONE compiled program.

        Removes the per-step host round trip (30 ms on tunneled chips —
        docs/PERF_NOTES.md lever 4); used by generate() when no Python-side
        stopping criteria is installed. Greedy/sampling, per-sample eos.
        """
        b, s = input_ids.shape
        k_len = cache[0][0].shape[1]
        logits, cache = self.model.apply(
            params, input_ids, attention_mask, position_ids, cache,
            aux_features, aux_masks, method=CambrianLM.prefill,
        )
        last_idx = jnp.max(
            jnp.where(attention_mask, jnp.arange(s)[None, :], 0), axis=1
        )
        next_logits = jnp.take_along_axis(
            logits, last_idx[:, None, None], axis=1)[:, 0]
        next_pos = jnp.max(position_ids, axis=1) + 1
        cache_valid = jnp.zeros((b, k_len), dtype=bool)
        cache_valid = cache_valid.at[:, :s].set(attention_mask.astype(bool))

        tokens0 = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
        finished0 = jnp.zeros((b,), bool)
        lengths0 = jnp.zeros((b,), jnp.int32)

        def body(t, carry):
            tokens, lengths, next_logits, cache, cache_valid, finished, rng = carry
            rng, sub = jax.random.split(rng)
            token = sample_token(next_logits, sub, temperature, top_p).astype(
                jnp.int32)
            if eos_token_id is not None:
                finished = finished | (token == eos_token_id)
            tokens = tokens.at[:, t].set(jnp.where(finished, pad_token_id, token))
            lengths = lengths + (~finished).astype(jnp.int32)
            write_index = s + t
            cache_valid = cache_valid.at[:, write_index].set(~finished)
            window = self.model.cfg.sliding_window
            if window is not None:
                # retire slots beyond the attention window (mistral/phi3)
                keep = jnp.arange(k_len)[None, :] > (write_index - window)
                cache_valid = cache_valid & keep
            next_logits, cache = self.model.apply(
                params, token[:, None], (next_pos + t)[:, None], cache,
                cache_valid, write_index, method=CambrianLM.decode_step,
            )
            return tokens, lengths, next_logits, cache, cache_valid, finished, rng

        carry = (tokens0, lengths0, next_logits, cache, cache_valid, finished0, rng)
        # Capacity guard: past k_len the cache's dynamic_update_slice CLAMPS
        # its index, which would silently overwrite the last row (and count
        # the corrupt tokens in lengths). Clamp the step budget instead —
        # same contract as generate_stream's `s + t + chunk <= k_len` bound.
        steps = max(0, min(max_new_tokens, k_len - s))
        tokens, lengths, *_ = jax.lax.fori_loop(0, steps, body, carry)
        return tokens, lengths

    def _decode_chunk_impl(self, params, next_logits, cache, cache_valid,
                           next_pos, base_index, finished, rng, *, chunk,
                           temperature, top_p, eos_token_id, pad_token_id):
        """``chunk`` decode steps as ONE compiled program (serving streaming:
        amortizes the per-step dispatch without giving up incremental text).

        ``base_index``: dynamic cache write offset of the chunk's first token
        (prompt length + tokens already generated) — dynamic so every chunk
        reuses one compiled program.
        """

        def body(j, carry):
            tokens, lengths, next_logits, cache, cache_valid, finished, rng = carry
            rng, sub = jax.random.split(rng)
            token = sample_token(next_logits, sub, temperature, top_p).astype(
                jnp.int32)
            if eos_token_id is not None:
                finished = finished | (token == eos_token_id)
            tokens = tokens.at[:, j].set(
                jnp.where(finished, pad_token_id, token))
            lengths = lengths + (~finished).astype(jnp.int32)
            write_index = base_index + j
            cache_valid = cache_valid.at[:, write_index].set(~finished)
            window = self.model.cfg.sliding_window
            if window is not None:
                k_len = cache_valid.shape[1]
                keep = jnp.arange(k_len)[None, :] > (write_index - window)
                cache_valid = cache_valid & keep
            next_logits, cache = self.model.apply(
                params, token[:, None], (next_pos + j)[:, None], cache,
                cache_valid, write_index, method=CambrianLM.decode_step,
            )
            return tokens, lengths, next_logits, cache, cache_valid, finished, rng

        b = next_logits.shape[0]
        tokens0 = jnp.full((b, chunk), pad_token_id, jnp.int32)
        lengths0 = jnp.zeros((b,), jnp.int32)
        carry = (tokens0, lengths0, next_logits, cache, cache_valid, finished, rng)
        return jax.lax.fori_loop(0, chunk, body, carry)

    # -- public API ---------------------------------------------------------

    def encode_images(self, tower_params, images):
        return self._encode(tower_params, images)

    def generate(
        self,
        input_ids: np.ndarray,          # [B, S] packed prompt
        attention_mask: np.ndarray,     # [B, S]
        position_ids: np.ndarray,       # [B, S]
        aux_features: Optional[Sequence] = None,
        aux_masks: Optional[Sequence] = None,
        config: Optional[GenerationConfig] = None,
        stopping: Optional[Callable[[np.ndarray], bool]] = None,
        on_device: bool = True,
    ) -> np.ndarray:
        """Returns generated token ids [B, <=max_new_tokens] (prompt excluded).

        Per-sample generated lengths (tokens before eos / budget exhaustion)
        are left in ``self.last_lengths`` [B] after every call — columns past a
        sample's length are pad. Trailing columns where *every* sample has
        finished are trimmed (by the tracked lengths, not by pad-matching, so
        a legitimately generated token equal to pad_token_id is never dropped).

        With no Python-side stopping criteria the whole generation runs as one
        compiled program (prefill + lax.fori_loop decode)."""
        cfg = config or GenerationConfig()
        if on_device and stopping is None:
            b, s = input_ids.shape
            k_len = min(self.max_len, s + cfg.max_new_tokens)
            cache = self.init_cache(b, k_len)
            key = (cfg.max_new_tokens, cfg.temperature, cfg.top_p,
                   cfg.eos_token_id, cfg.pad_token_id)
            if key not in self._on_device_fns:
                import functools

                self._on_device_fns[key] = self._jit(functools.partial(
                    self._generate_on_device_impl,
                    max_new_tokens=cfg.max_new_tokens,
                    temperature=cfg.temperature, top_p=cfg.top_p,
                    eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
                ))
            tokens, lengths = self._on_device_fns[key](
                self.params, jnp.asarray(input_ids), jnp.asarray(attention_mask),
                jnp.asarray(position_ids), cache, aux_features, aux_masks,
                jax.random.PRNGKey(cfg.seed),
            )
            tokens = np.asarray(tokens)
            self.last_lengths = np.asarray(lengths)
            last = max(1, int(self.last_lengths.max()))
            return tokens[:, :last]

        out = None
        for out in self.generate_stream(input_ids, attention_mask, position_ids,
                                        aux_features, aux_masks, config, stopping):
            pass
        return out if out is not None else np.zeros((input_ids.shape[0], 0), np.int32)

    def generate_stream(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        position_ids: np.ndarray,
        aux_features: Optional[Sequence] = None,
        aux_masks: Optional[Sequence] = None,
        config: Optional[GenerationConfig] = None,
        stopping: Optional[Callable[[np.ndarray], bool]] = None,
    ):
        """Yields the generated ids so far [B, t] after every decode step
        (feeds the serving tier's incremental text streaming,
        model_worker.py:170-196 semantics).

        ``stream_chunk`` > 1 decodes whole chunks per device dispatch; a
        Python-side ``stopping`` callable forces per-token stepping so the
        criterion is observed at every token. When the cache capacity
        (``max_len``) binds mid-chunk, the tail past the last whole chunk runs
        per-token — chunked cache writes never exceed ``k_len`` (a clamped
        dynamic_update_slice would silently corrupt the last cache row)."""
        cfg = config or GenerationConfig()
        b, s = input_ids.shape
        chunk = 1 if stopping is not None else max(1, int(cfg.stream_chunk))
        # round the cache up to whole chunks so chunked writes never overflow
        # (capped by max_len; the capped tail is decoded per-token below)
        n_new = -(-cfg.max_new_tokens // chunk) * chunk
        k_len = min(self.max_len, s + n_new)

        cache = self.init_cache(b, k_len)
        logits, cache = self._prefill(
            self.params, jnp.asarray(input_ids), jnp.asarray(attention_mask),
            jnp.asarray(position_ids), cache, aux_features, aux_masks,
        )
        # next-token logits come from the last *valid* slot of each prompt
        # (validity is interleaved: masked image-padding rows sit mid-sequence)
        mask_np = np.asarray(attention_mask).astype(bool)
        last_idx = (mask_np * np.arange(s)[None, :]).max(axis=1).astype(np.int32)
        next_logits = jnp.take_along_axis(
            logits, jnp.asarray(last_idx)[:, None, None], axis=1
        )[:, 0]

        rng = jax.random.PRNGKey(cfg.seed)
        next_pos = jnp.asarray(position_ids.max(axis=1) + 1, jnp.int32)
        cache_valid = jnp.zeros((b, k_len), dtype=bool)
        cache_valid = cache_valid.at[:, :s].set(jnp.asarray(attention_mask))

        cols: List[np.ndarray] = []
        finished = np.zeros(b, dtype=bool)
        lengths = np.zeros(b, dtype=np.int32)
        self.last_lengths = lengths
        t = 0

        if chunk > 1:
            import functools

            key = (chunk, cfg.temperature, cfg.top_p, cfg.eos_token_id,
                   cfg.pad_token_id)
            if key not in self._chunk_fns:
                self._chunk_fns[key] = self._jit(functools.partial(
                    self._decode_chunk_impl, chunk=chunk,
                    temperature=cfg.temperature, top_p=cfg.top_p,
                    eos_token_id=cfg.eos_token_id,
                    pad_token_id=cfg.pad_token_id,
                ))
            finished_dev = jnp.asarray(finished)
            # whole chunks only: every write of a chunk starting at t lands in
            # [s+t, s+t+chunk), which must fit the cache
            while t < cfg.max_new_tokens and s + t + chunk <= k_len:
                (tokens, chunk_lengths, next_logits, cache, cache_valid,
                 finished_dev, rng) = self._chunk_fns[key](
                    self.params, next_logits, cache, cache_valid,
                    next_pos + t, jnp.int32(s + t), finished_dev, rng)
                cols.append(np.asarray(tokens))
                lengths = lengths + np.asarray(chunk_lengths)
                t += chunk
                done = bool(np.asarray(finished_dev).all())
                cum = np.concatenate(cols, axis=1)[:, :cfg.max_new_tokens]
                lengths = np.minimum(lengths, cfg.max_new_tokens)
                self.last_lengths = lengths
                if done:
                    cum = cum[:, : max(1, int(lengths.max()))]
                yield cum
                if done:
                    return
            if t >= cfg.max_new_tokens:
                return
            # max_len bound the cache mid-chunk: finish the tail per-token
            finished = np.asarray(finished_dev)

        while t < cfg.max_new_tokens:
            rng, sub = jax.random.split(rng)
            token = sample_token(next_logits, sub, cfg.temperature, cfg.top_p)
            tok_np = np.asarray(token)
            if cfg.eos_token_id is not None:
                finished |= tok_np == cfg.eos_token_id
            lengths = lengths + (~finished).astype(np.int32)
            self.last_lengths = lengths
            cols.append(np.where(finished, cfg.pad_token_id, tok_np)[:, None]
                        .astype(np.int32))
            cum = np.concatenate(cols, axis=1)
            if finished.all():
                yield cum[:, : max(1, int(lengths.max()))]
                return
            yield cum
            if stopping is not None and stopping(cum):
                return

            write_index = s + t
            if write_index >= k_len:
                return
            cache_valid = cache_valid.at[:, write_index].set(
                jnp.asarray(~finished))
            window = self.model.cfg.sliding_window
            if window is not None and write_index - window >= 0:
                # sliding-window models: retire cache slots beyond the window
                cache_valid = cache_valid.at[:, : write_index - window + 1].set(False)
            next_logits, cache = self._step(
                self.params, token[:, None], (next_pos + t)[:, None],
                cache, cache_valid, jnp.int32(write_index),
            )
            t += 1
