"""Continuous-batching inference engine.

The reference's serving path stashes vision features on the model object
(cambrian_llama.py:471-474) and therefore serves one request at a time per
worker (SURVEY.md §7 hard-part 6). Here requests occupy slots of a shared KV
cache: a new request prefills into its slot while other slots keep decoding;
every decode step advances ALL active slots in one jitted call with per-slot
write positions. Vision features only matter during prefill (the in-decoder
SVA injection runs on the prompt's latent window), so slots carry no vision
state afterwards.

Design:
- cache: per-layer (k, v) of shape [num_slots, max_len, kv_heads, head_dim]
- per-slot host state: length, positions, finished, generated tokens
- ``decode_step`` uses vector cache_index (models/language/llama.py) so slots
  at different depths advance together
- prefill runs batch-1 into a scratch cache, then scatters the rows into the
  slot (one jitted copy)

Greedy/sampling parity with the sequential engine is covered by tests.
"""

import queue
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..models.cambrian import CambrianLM
from ..models.language.llama import init_kv_cache
from .engine import GenerationConfig, sample_token, sample_token_per_slot


@dataclass
class Request:
    request_id: int
    input_ids: np.ndarray          # [S] packed prompt
    attention_mask: np.ndarray     # [S]
    position_ids: np.ndarray       # [S]
    aux_features: Optional[Sequence] = None
    aux_masks: Optional[Sequence] = None
    config: GenerationConfig = field(default_factory=GenerationConfig)
    # outputs
    tokens: List[int] = field(default_factory=list)
    finished: bool = False
    on_token: Optional[Callable[[int], None]] = None


class ContinuousBatchingEngine:
    def __init__(self, model: CambrianLM, params, num_slots: int = 4,
                 max_len: int = 4096, cache_dtype=jnp.bfloat16):
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.cache_dtype = cache_dtype

        self.cache = init_kv_cache(model.cfg, num_slots, max_len, cache_dtype)
        self.cache_valid = jnp.zeros((num_slots, max_len), dtype=bool)
        self.next_logits = jnp.zeros((num_slots, model.cfg.vocab_size),
                                     jnp.float32)
        self.slot_request: List[Optional[Request]] = [None] * num_slots
        self.slot_pos = np.zeros(num_slots, np.int32)     # next position id
        self.slot_len = np.zeros(num_slots, np.int32)     # next cache index
        self._rng = jax.random.PRNGKey(0)
        self._pending: "queue.Queue[Request]" = queue.Queue()
        self._next_id = 0
        self._lock = threading.Lock()

        self._jit_prefill = jax.jit(self._prefill_impl)
        self._jit_scatter = jax.jit(self._scatter_impl, donate_argnums=(0,))
        self._jit_decode = jax.jit(self._decode_impl, donate_argnums=(2,))
        self._chunk_fns: Dict[int, Any] = {}

    # -- jitted pieces -------------------------------------------------------

    def _prefill_impl(self, params, input_ids, attention_mask, position_ids,
                      scratch_cache, aux_features, aux_masks):
        return self.model.apply(
            params, input_ids, attention_mask, position_ids, scratch_cache,
            aux_features, aux_masks, method=CambrianLM.prefill,
        )

    def _scatter_impl(self, cache, one_cache, slot):
        return jax.tree.map(
            lambda big, small: big.at[slot].set(small[0].astype(big.dtype)),
            cache, one_cache,
        )

    def _decode_impl(self, params, tokens, cache, cache_valid, positions,
                     write_index):
        return self.model.apply(
            params, tokens, positions, cache, cache_valid, write_index,
            method=CambrianLM.decode_step,
        )

    def _decode_chunk_impl(self, params, next_logits, cache, cache_valid,
                           positions, write_index, active, remaining, temps,
                           top_ps, eos_ids, rng, *, chunk):
        """``chunk`` lockstep decode steps for ALL slots as one compiled
        program (per-slot sampling configs, per-slot eos / budget). Each host
        round trip costs ~30 ms on tunneled chips and one dispatch anywhere;
        chunking amortizes it for the multi-request serving path exactly as
        ``GenerationEngine.generate_stream`` does for single requests.

        Tokens for slots that were inactive (or finished mid-chunk) are -1.
        Finished slots' trailing cache writes are cleared by the host when it
        retires the slot, so the stray eos-token KV row is never attended.
        """
        num_slots = next_logits.shape[0]

        def body(j, carry):
            toks, next_logits, cache, cache_valid, active, remaining, rng = carry
            rng, sub = jax.random.split(rng)
            token = sample_token_per_slot(next_logits, sub, temps, top_ps)
            toks = toks.at[:, j].set(jnp.where(active, token, -1))
            hit_eos = (eos_ids >= 0) & (token == eos_ids)
            remaining = jnp.where(active, remaining - 1, remaining)
            new_active = active & ~hit_eos & (remaining > 0)
            wi = write_index + j
            bidx = jnp.arange(num_slots)
            cache_valid = cache_valid.at[bidx, wi].set(active)
            feed = jnp.where(active, token, 0)
            logits, cache = self.model.apply(
                params, feed[:, None], (positions + j)[:, None], cache,
                cache_valid, wi, method=CambrianLM.decode_step)
            next_logits = jnp.where(active[:, None], logits, next_logits)
            return toks, next_logits, cache, cache_valid, new_active, remaining, rng

        toks0 = jnp.full((num_slots, chunk), -1, jnp.int32)
        carry = (toks0, next_logits, cache, cache_valid, active, remaining, rng)
        return jax.lax.fori_loop(0, chunk, body, carry)

    # -- public API -----------------------------------------------------------

    def submit(self, input_ids, attention_mask, position_ids,
               aux_features=None, aux_masks=None,
               config: Optional[GenerationConfig] = None,
               on_token=None) -> Request:
        with self._lock:
            req = Request(self._next_id, np.asarray(input_ids),
                          np.asarray(attention_mask), np.asarray(position_ids),
                          aux_features, aux_masks,
                          config or GenerationConfig(), on_token=on_token)
            self._next_id += 1
        self._pending.put(req)
        return req

    def _free_slots(self):
        return [i for i, r in enumerate(self.slot_request) if r is None]

    def _admit(self):
        """Prefill pending requests into free slots."""
        for slot in self._free_slots():
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                return
            s = req.input_ids.shape[0] if req.input_ids.ndim == 1 else \
                req.input_ids.shape[1]
            ids = np.atleast_2d(req.input_ids)
            amask = np.atleast_2d(req.attention_mask)
            pos = np.atleast_2d(req.position_ids)

            scratch = init_kv_cache(self.model.cfg, 1, self.max_len,
                                    self.cache_dtype)
            logits, scratch = self._jit_prefill(
                self.params, jnp.asarray(ids), jnp.asarray(amask),
                jnp.asarray(pos), scratch, req.aux_features, req.aux_masks,
            )
            self.cache = self._jit_scatter(self.cache, scratch, slot)

            mask_np = amask[0].astype(bool)
            last_idx = int((mask_np * np.arange(s)).max())
            self.next_logits = self.next_logits.at[slot].set(logits[0, last_idx])
            self.cache_valid = self.cache_valid.at[slot].set(False)
            self.cache_valid = self.cache_valid.at[slot, :s].set(
                jnp.asarray(mask_np))
            self.slot_request[slot] = req
            self.slot_len[slot] = s
            self.slot_pos[slot] = int(pos[0].max()) + 1

    def _retire(self, slot: int):
        self.slot_request[slot] = None
        self.cache_valid = self.cache_valid.at[slot].set(False)

    def step_chunk(self, chunk: int) -> int:
        """Admit pending work and advance every active slot up to ``chunk``
        tokens in ONE device dispatch. New requests are admitted at chunk
        boundaries (standard continuous-batching granularity tradeoff).
        Returns the number of active slots afterwards."""
        self._admit()
        active_idx = [i for i, r in enumerate(self.slot_request)
                      if r is not None]
        if not active_idx:
            return 0
        chunk_eff = max(1, int(chunk))
        if chunk_eff == 1:
            return self.step()

        s = self.num_slots
        active = np.zeros(s, bool)
        remaining = np.zeros(s, np.int32)
        temps = np.ones(s, np.float32)
        top_ps = np.ones(s, np.float32)
        eos_ids = np.full(s, -1, np.int32)
        for i in active_idx:
            req = self.slot_request[i]
            active[i] = True
            # per-slot budget: generation budget AND remaining cache capacity.
            # A nearly-full slot caps only ITSELF (it goes inactive mid-chunk
            # and is retired below) instead of degrading the whole batch to
            # per-token stepping; its post-inactive lockstep writes land out
            # of bounds and are dropped by the scatter (llama.py vector-index
            # path), never clamped into live rows.
            remaining[i] = min(req.config.max_new_tokens - len(req.tokens),
                               self.max_len - int(self.slot_len[i]))
            temps[i] = req.config.temperature
            top_ps[i] = req.config.top_p
            if req.config.eos_token_id is not None:
                eos_ids[i] = req.config.eos_token_id

        if chunk_eff not in self._chunk_fns:
            import functools

            self._chunk_fns[chunk_eff] = jax.jit(functools.partial(
                self._decode_chunk_impl, chunk=chunk_eff),
                donate_argnums=(2,))
        self._rng, sub = jax.random.split(self._rng)
        (toks, self.next_logits, self.cache, self.cache_valid, _, _,
         _) = self._chunk_fns[chunk_eff](
            self.params, self.next_logits, self.cache, self.cache_valid,
            jnp.asarray(self.slot_pos), jnp.asarray(self.slot_len),
            jnp.asarray(active), jnp.asarray(remaining), jnp.asarray(temps),
            jnp.asarray(top_ps), jnp.asarray(eos_ids), sub)

        toks_np = np.asarray(toks)
        n_active = 0
        for i in active_idx:
            req = self.slot_request[i]
            emitted = 0
            done = False
            for j in range(chunk_eff):
                tok = int(toks_np[i, j])
                if tok < 0:
                    break
                emitted += 1
                req.tokens.append(tok)
                if req.on_token:
                    req.on_token(tok)
                eos = req.config.eos_token_id
                if (eos is not None and tok == eos) or \
                        len(req.tokens) >= req.config.max_new_tokens:
                    done = True
                    break
            self.slot_len[i] += emitted
            self.slot_pos[i] += emitted
            if done or int(self.slot_len[i]) >= self.max_len:
                req.finished = True
                self._retire(i)
            else:
                n_active += 1
        return n_active

    def step(self) -> int:
        """Admit pending work and advance every active slot one token.
        Returns the number of active slots after the step."""
        self._admit()
        active = [i for i, r in enumerate(self.slot_request) if r is not None]
        if not active:
            return 0

        self._rng, sub = jax.random.split(self._rng)
        # all slots sample from their own logits; inactive slots are ignored
        temps = {r.config.temperature for i, r in enumerate(self.slot_request)
                 if r is not None}
        # mixed temperature batches: sample per group (rare; loop is cheap)
        tokens = np.zeros(self.num_slots, np.int32)
        for t in temps:
            idx = [i for i in active if self.slot_request[i].config.temperature == t]
            toks = np.asarray(sample_token(
                self.next_logits[np.asarray(idx)], sub, t,
                self.slot_request[idx[0]].config.top_p))
            tokens[np.asarray(idx)] = toks

        write_index = self.slot_len.copy()
        positions = self.slot_pos.copy()

        # record tokens + finish bookkeeping on host
        still_active = []
        for i in active:
            req = self.slot_request[i]
            tok = int(tokens[i])
            req.tokens.append(tok)
            if req.on_token:
                req.on_token(tok)
            eos = req.config.eos_token_id
            done = (eos is not None and tok == eos) or \
                len(req.tokens) >= req.config.max_new_tokens or \
                int(write_index[i]) + 1 >= self.max_len
            if done:
                req.finished = True
                self._retire(i)
            else:
                still_active.append(i)

        if not still_active:
            return 0

        # mark the new tokens' slots valid and decode all active slots
        cv = self.cache_valid
        for i in still_active:
            cv = cv.at[i, int(write_index[i])].set(True)
        self.cache_valid = cv

        logits, self.cache = self._jit_decode(
            self.params, jnp.asarray(tokens[:, None]), self.cache,
            self.cache_valid, jnp.asarray(positions[:, None]),
            jnp.asarray(write_index),
        )
        for i in still_active:
            self.next_logits = self.next_logits.at[i].set(logits[i])
            self.slot_len[i] += 1
            self.slot_pos[i] += 1
        return len(still_active)

    def run_until_complete(self, requests: Sequence[Request], chunk: int = 1):
        """Drive steps until the given requests all finish. ``chunk`` > 1
        advances all slots multiple tokens per device dispatch."""
        while not all(r.finished for r in requests):
            n = self.step_chunk(chunk) if chunk > 1 else self.step()
            if n == 0 and self._pending.empty() and \
                    not all(r.finished for r in requests):
                # everything retired (eos/max length) in this step
                if all(r.finished for r in requests):
                    break
        return [np.asarray(r.tokens, dtype=np.int32) for r in requests]
