"""The Cambrian multimodal model: multi-tower features -> SVA connector ->
decoder with periodic in-LLM SVA re-injection.

This is the TPU-native re-design of the reference's meta-architecture
(cambrian_arch.py:33-200, :259-609 and cambrian_llama.py:142-253):

- ONE static-shape, mask-driven path for training and prefill (the reference's
  XLA branch); the image block always occupies ``image_position ..
  image_position+600`` and validity lives in the attention mask/position ids.
- The SVA windowing is expressed as reshapes (windows stay a tensor axis —
  see models/sva.py) instead of flattening into batch.
- Vision features for the in-decoder injection are explicit function inputs
  (the reference stashes them on ``self``, cambrian_llama.py:471-474, which
  breaks batching; ours is a pure carry).

``CambrianLM`` is the trainable Flax module (embeddings + SVA connector +
decoder + LM head). Vision towers are separate modules orchestrated by
``CambrianModel`` (frozen in stage-1 training, separately sharded).
"""

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from ..ops.activations import gelu_exact
from ..ops.resize import resize_bilinear
from ..parallel.sharding import constrain
from .config import CambrianConfig
from .language.llama import (
    LlamaDecoderLayer,
    RMSNorm,
    decoder_norm,
    init_kv_cache,
    make_causal_mask,
    make_decode_mask,
)
from .sva import VisionTokenSampler, Mlp
from .projectors import build_projector_module


def _f32_acc_dot_general(lhs, rhs, dimension_numbers, precision=None,
                         preferred_element_type=None):
    """dot_general that always accumulates in fp32 (bf16 lm_head option:
    bf16 operand reads off HBM, fp32 MXU accumulation, fp32 logits out)."""
    return jax.lax.dot_general(lhs, rhs, dimension_numbers,
                               precision=precision,
                               preferred_element_type=jnp.float32)


def window_features(feats: jnp.ndarray, q_side: int) -> jnp.ndarray:
    """[B, S*S, C] tower grid -> [B, q_side^2, (S/q_side)^2, C] local windows
    (the reshape/permute equivalent of cambrian_arch.py:271-287)."""
    b, n, c = feats.shape
    s = int(n ** 0.5)
    assert s * s == n and s % q_side == 0, (n, q_side)
    r = s // q_side
    x = feats.reshape(b, q_side, r, q_side, r, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, q_side * q_side, r * r, c)


def unwindow_mask(mask: jnp.ndarray, q_side: int) -> jnp.ndarray:
    """Inverse of the window view for masks: [B, q^2, r^2] -> [B, (q*r)^2]."""
    b, q2, r2 = mask.shape
    r = int(r2 ** 0.5)
    x = mask.reshape(b, q_side, q_side, r, r)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, (q_side * r) ** 2)


def window_mask(flat: jnp.ndarray, q_side: int) -> jnp.ndarray:
    """[B, S*S] -> [B, q^2, r^2] window masks, force-unmasking all-invalid
    windows (train_fsdp.py:1136 semantics)."""
    b, n = flat.shape
    s = int(n ** 0.5)
    r = s // q_side
    x = flat.reshape(b, q_side, r, q_side, r)
    x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, q_side * q_side, r * r)
    dead = jnp.sum(x, axis=-1, keepdims=True) == 0
    return jnp.where(dead, True, x)


class CambrianLM(nn.Module):
    """Trainable core: token embeddings + SVA connector + decoder + LM head.

    Inputs are pre-packed (data/packing.py): ``input_ids`` [B,S] with the
    image indicator at cfg.image_position followed by zero pads, per-token
    validity ``attention_mask`` [B,S], ``position_ids`` [B,S], per-tower
    *projected-grid* validity masks in window form [B, 576, W_i].
    """

    cfg: CambrianConfig
    tower_hidden_sizes: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size,
                                     dtype=self.dtype, name="embed_tokens")
        if c.mm_projector_type == "sva":
            vh = c.vision_hidden_size
            # Connector modules are rematted like the decoder layers: their
            # fp32 LN / attention temps are otherwise saved across the WHOLE
            # decoder forward for the backward pass (stage-1 trains exactly
            # these modules), which showed up as the largest fp32 live
            # buffers in the 34B (1,2,4) TPU buffer assignment.
            ProjCls = (nn.remat(_AuxProjector, prevent_cse=False)
                       if c.remat else _AuxProjector)
            ConnCls = (nn.remat(VisionTokenSampler, prevent_cse=False)
                       if c.remat else VisionTokenSampler)
            # per-tower 2-layer MLP + LN into the shared vision space
            # (cambrian_arch.py:56)
            self.mm_projector_aux = [
                ProjCls(vh, dtype=self.dtype, name=f"mm_projector_aux_{i}")
                for i in range(len(self.tower_hidden_sizes))
            ]
            # per-query-group connector samplers (cambrian_arch.py:58-60)
            self.vision_samplers = [
                ConnCls(
                    q_dim=vh,
                    kv_size_list=c.cross_att_window_sizes(qn),
                    vision_hidden_size=vh,
                    num_of_layers=c.connector_depth,
                    dtype=self.dtype,
                    name=f"vision_sampler_{g}",
                )
                for g, qn in enumerate(c.query_num_list)
            ]
            # in-LLM samplers (cambrian_arch.py:62-69); rematted like the
            # reference grad-ckpts them (cambrian_llama.py:189-196)
            SamplerCls = (nn.remat(VisionTokenSampler, prevent_cse=False)
                          if c.remat else VisionTokenSampler)
            if not c.connector_only:
                self.vision_sampler_layers = [
                    SamplerCls(
                        q_dim=c.hidden_size,
                        kv_size_list=c.cross_att_window_sizes(c.image_token_len),
                        vision_hidden_size=vh,
                        num_of_layers=1,
                        dtype=self.dtype,
                        name=f"vision_sampler_layers_{k}",
                    )
                    for k in range(c.num_of_vision_sampler_layers)
                ]
            self.mm_projector = _SvaProjector(c.hidden_size, dtype=self.dtype,
                                              name="mm_projector")
            self.vision_query = self.param(
                "vision_query",
                nn.initializers.normal(stddev=c.vision_hidden_size ** -0.5),
                (c.num_query_group, vh), jnp.float32,
            )
        else:
            self.mm_projector = build_projector_module(c, dtype=self.dtype,
                                                       name="mm_projector")
        self.image_newline = self.param(
            "image_newline",
            nn.initializers.normal(stddev=c.hidden_size ** -0.5),
            (c.hidden_size,), jnp.float32,
        )
        # gradient checkpointing: recompute each decoder layer in the backward
        # pass (jax.remat; replaces the reference's torch_xla checkpoint
        # injection, cambrian_llama.py:337-343 / train_fsdp grad-ckpt config)
        LayerCls = (nn.remat(LlamaDecoderLayer, prevent_cse=False)
                    if c.remat else LlamaDecoderLayer)
        self.layers = [
            LayerCls(c, dtype=self.dtype, name=f"layers_{i}")
            for i in range(c.num_hidden_layers)
        ]
        self.norm = decoder_norm(c, "norm")
        if not c.tie_word_embeddings:
            if c.lm_head_dtype == "bf16":
                # Serving option (measured, docs/PERF_NOTES.md): the fp32
                # vocab head is the single largest HBM read of a decode step
                # (e.g. 2.1 GB at 8B/128k vocab). bf16 storage + bf16 GEMM
                # with an fp32 accumulator halves that read; greedy parity
                # is gated in tests/test_inference.py.
                self.lm_head = nn.Dense(
                    c.vocab_size, use_bias=False, dtype=jnp.bfloat16,
                    param_dtype=jnp.bfloat16, name="lm_head",
                    dot_general=_f32_acc_dot_general)
            else:
                self.lm_head = nn.Dense(c.vocab_size, use_bias=False,
                                        dtype=jnp.float32, name="lm_head")

    # ------------------------------------------------------------------
    # vision connector
    # ------------------------------------------------------------------

    def prepare_vision(
        self,
        aux_features_list: Sequence[jnp.ndarray],   # N x [B, tok_i, C_i]
        aux_masks_list: Sequence[jnp.ndarray],      # N x [B, 576, W_i] bool
    ):
        """Multi-tower SVA aggregation (cambrian_arch.py:366-419).

        Returns:
            image_embeds: [B, 600, hidden] latent queries + newline column
            vision_kv: N x [B, 576, W_i, vh] windows for in-LLM injection
            vision_masks: N x [B, 576, W_i]
            global_context: [B, 576, vh]
        """
        c = self.cfg
        b = aux_features_list[0].shape[0]
        final_side = c.image_token_len_per_side

        projected = [
            proj(feats.astype(self.dtype))
            for proj, feats in zip(self.mm_projector_aux, aux_features_list)
        ]
        # tower-0 mean is the global context (cambrian_arch.py:377)
        global_context = jnp.mean(projected[0], axis=1, keepdims=True)  # [B,1,vh]

        group_features = []
        for g, qn in enumerate(c.query_num_list):
            q_side = int(qn ** 0.5)
            queries = jnp.broadcast_to(
                self.vision_query[g].astype(self.dtype)[None, None, :],
                (b, qn, c.vision_hidden_size),
            )
            ctx = jnp.broadcast_to(global_context, (b, qn, c.vision_hidden_size))
            kvs = [window_features(p, q_side) for p in projected]
            if q_side == final_side:
                masks = list(aux_masks_list)
            else:
                masks = [
                    window_mask(unwindow_mask(m, final_side), q_side)
                    for m in aux_masks_list
                ]
            out = self.vision_samplers[g](queries, ctx, kvs, masks)  # [B,qn,vh]
            if q_side != final_side:
                grid = out.reshape(b, q_side, q_side, -1)
                grid = resize_bilinear(grid, final_side, final_side)
                out = grid.reshape(b, final_side * final_side, -1)
            group_features.append(out)

        image_features = jnp.concatenate(group_features, axis=-1)
        image_features = self.mm_projector(image_features)  # [B,576,hidden]

        # newline column (cambrian_arch.py:413-419)
        grid = image_features.reshape(b, final_side, final_side, -1)
        newline = jnp.broadcast_to(
            self.image_newline.astype(grid.dtype)[None, None, None, :],
            (b, final_side, 1, c.hidden_size),
        )
        image_embeds = jnp.concatenate([grid, newline], axis=2)
        image_embeds = image_embeds.reshape(b, c.image_block_len, c.hidden_size)

        vision_kv = [window_features(p, final_side) for p in projected]
        global_ctx_final = jnp.broadcast_to(
            global_context, (b, c.image_token_len, c.vision_hidden_size)
        )
        return image_embeds, vision_kv, list(aux_masks_list), global_ctx_final

    def _inject_sva(self, k: int, hidden: jnp.ndarray, vision_kv, vision_masks,
                    global_context, im_start: jnp.ndarray) -> jnp.ndarray:
        """In-decoder SVA step k (cambrian_llama.py:177-207): slice the latent
        window at each sample's image-block start, strip the newline column,
        cross-attend, write back. The reference assumes the block sits at the
        static config.image_position; ours follows the per-sample marker so
        arbitrary prompt prefixes work at inference."""
        c = self.cfg
        b = hidden.shape[0]
        side = c.image_token_len_per_side

        # Pin batch sharding through the slice/write-back: without the
        # constraints the partitioner reshards the window to TP layouts and
        # back, triggering involuntary full rematerialization (spmd_partitioner
        # warnings seen in the multichip dryrun).
        hidden = constrain(hidden, ("data", "fsdp"), None, None)
        block = jax.vmap(
            lambda h, st: jax.lax.dynamic_slice(
                h, (st, 0), (c.image_block_len, c.hidden_size))
        )(hidden, im_start)
        block = constrain(block, ("data", "fsdp"), None, None)
        block = block.reshape(b, side, side + 1, c.hidden_size)
        latent, newline = block[:, :, :side], block[:, :, side:]
        latent = latent.reshape(b, c.image_token_len, c.hidden_size)
        latent = self.vision_sampler_layers[k](
            latent, global_context, vision_kv, vision_masks
        )
        latent = latent.reshape(b, side, side, c.hidden_size)
        block = jnp.concatenate([latent, newline], axis=2)
        block = block.reshape(b, c.image_block_len, c.hidden_size)
        block = constrain(block, ("data", "fsdp"), None, None)
        out = jax.vmap(
            lambda h, blk, st: jax.lax.dynamic_update_slice(h, blk, (st, 0))
        )(hidden, block, im_start)
        return constrain(out, ("data", "fsdp"), None, None)

    # ------------------------------------------------------------------
    # decoder forward paths
    # ------------------------------------------------------------------

    def _decoder(self, hidden, mask, position_ids, cache, cache_index,
                 vision_kv, vision_masks, global_context, inject: bool,
                 im_start=None):
        c = self.cfg
        inject_layers = set(c.vision_sampler_layer_indices) if inject else set()
        if c.scan_layers and not self.is_initializing():
            return self._decoder_scanned(hidden, mask, position_ids, cache,
                                         cache_index, vision_kv, vision_masks,
                                         global_context, inject_layers,
                                         im_start)
        new_cache = [] if cache is not None else None
        for i, layer in enumerate(self.layers):
            layer_cache = None if cache is None else cache[i]
            hidden, lc = layer(hidden, mask, position_ids, layer_cache, cache_index)
            if cache is None and c.seq_shard_activations:
                # training: shard the remat-saved residual over 'model' too
                # (see _scan_run; no-op without a mesh / divisible seq)
                hidden = constrain(hidden, ("data", "fsdp"), "model", None)
            if cache is not None:
                new_cache.append(lc)
            if i in inject_layers:
                k = (i - c.start_of_vision_sampler_layers) // c.stride_of_vision_sampler_layers
                hidden = self._inject_sva(k, hidden, vision_kv, vision_masks,
                                          global_context, im_start)
        hidden = self.norm(hidden)
        return hidden, (tuple(new_cache) if new_cache is not None else None)

    def _decoder_scanned(self, hidden, mask, position_ids, cache, cache_index,
                         vision_kv, vision_masks, global_context,
                         inject_layers, im_start):
        """scan_layers path: ``jax.lax.scan`` over the uniform decoder-layer
        runs between SVA injection points — one compiled layer body per run
        length instead of num_hidden_layers inlined copies (compile time at
        34B/60-layer scale; VERDICT r1 item 7). Per-layer params keep their
        ``layers_i`` names (checkpoints/shardings untouched): the run's
        subtrees are stacked at trace time and scanned over.

        Math-identical to the unrolled loop (tests/test_scan_layers.py
        asserts exact logits)."""
        c = self.cfg

        # uniform runs [lo, hi) between injection points
        runs = []
        lo = 0
        for i in range(c.num_hidden_layers):
            if i in inject_layers:
                runs.append((lo, i + 1, i))
                lo = i + 1
        if lo < c.num_hidden_layers:
            runs.append((lo, c.num_hidden_layers, None))

        new_cache = [None] * c.num_hidden_layers if cache is not None else None
        for lo, hi, inj in runs:
            hidden, run_cache = self._scan_run(hidden, mask, position_ids,
                                               cache, cache_index, lo, hi)
            if cache is not None:
                new_cache[lo:hi] = run_cache
            if inj is not None:
                k = ((inj - c.start_of_vision_sampler_layers)
                     // c.stride_of_vision_sampler_layers)
                hidden = self._inject_sva(k, hidden, vision_kv, vision_masks,
                                          global_context, im_start)
        hidden = self.norm(hidden)
        return hidden, (tuple(new_cache) if new_cache is not None else None)

    def _scan_run(self, hidden, mask, position_ids, cache, cache_index,
                  lo: int, hi: int):
        c = self.cfg
        if hi - lo == 1:
            out, lc = self.layers[lo](hidden, mask, position_ids,
                                      None if cache is None else cache[lo],
                                      cache_index)
            return out, [lc]

        # parent=None: a detached functional module (not a child of this one);
        # it is applied with each scanned layer's params explicitly
        body_mod = LlamaDecoderLayer(c, dtype=self.dtype, parent=None)
        layer_params = [self.layers[i].variables["params"]
                        for i in range(lo, hi)]

        if cache is None:
            # training forward: stacked xs so scan's vjp accumulates grads
            # into the stacked weights naturally
            stacked_params = jax.tree.map(lambda *xs: jnp.stack(xs),
                                          *layer_params)

            def body(h, lp):
                out, _ = body_mod.apply({"params": lp}, h, mask,
                                        position_ids, None, None)
                # Sequence-shard the carry over the model axis: the rematted
                # body's saved residual is its input carry, so this pins the
                # per-layer stored activations to 1/model_parallel of the
                # replicated size (standard sequence parallelism for stored
                # activations; the layer's column-parallel GEMMs re-gather).
                if c.seq_shard_activations:
                    out = constrain(out, ("data", "fsdp"), "model", None)
                return out, None

            if c.remat:
                body = jax.checkpoint(body, prevent_cse=False)
            if c.seq_shard_activations:
                hidden = constrain(hidden, ("data", "fsdp"), "model", None)
            hidden, _ = jax.lax.scan(body, hidden, stacked_params)
            return hidden, None

        # inference (prefill/decode): no gradients flow, so select each
        # layer's params/cache with lax.switch instead of jnp.stack — the
        # stack materializes a SECOND full copy of the run's weights in HBM
        # every call (ADVICE r2; at 34B serving shapes that is ~+8.7 GB per
        # device, tests/test_production_compile.py), while the conditional
        # just forwards the chosen operand buffers.
        param_branches = [lambda p=p: p for p in layer_params]
        cache_branches = [lambda t=t: t for t in cache[lo:hi]]

        def body_c(h, i):
            lp = jax.lax.switch(i, param_branches)
            lc = jax.lax.switch(i, cache_branches)
            out, new_lc = body_mod.apply({"params": lp}, h, mask,
                                         position_ids, lc, cache_index)
            return out, new_lc

        hidden, new_stacked = jax.lax.scan(body_c, hidden,
                                           jnp.arange(hi - lo))
        run_cache = [
            jax.tree.map(lambda x: x[i], new_stacked) for i in range(hi - lo)
        ]
        return hidden, run_cache

    def _logits(self, hidden):
        bf16_head = self.cfg.lm_head_dtype == "bf16"
        if self.cfg.tie_word_embeddings:
            if bf16_head:
                emb = self.embed_tokens.embedding.astype(jnp.bfloat16)
                logits = _f32_acc_dot_general(
                    hidden.astype(jnp.bfloat16), emb.T,
                    (((hidden.ndim - 1,), (0,)), ((), ())))
            else:
                emb = self.embed_tokens.embedding.astype(jnp.float32)
                logits = hidden.astype(jnp.float32) @ emb.T
        else:
            logits = self.lm_head(
                hidden.astype(jnp.bfloat16 if bf16_head else jnp.float32))
            logits = logits.astype(jnp.float32)
        if self.cfg.logit_scale is not None:  # cohere
            logits = logits * self.cfg.logit_scale
        if self.cfg.final_logit_softcapping is not None:  # gemma2
            cap = self.cfg.final_logit_softcapping
            logits = cap * jnp.tanh(logits / cap)
        return logits

    def _image_start(self, input_ids) -> jnp.ndarray:
        """Per-sample index of the image indicator token [B] (the packed
        block starts there; data/packing.py keeps the indicator in the ids).
        Falls back to cfg.image_position when a sample has no marker."""
        has = jnp.any(input_ids == IMAGE_TOKEN_INDEX, axis=1)
        idx = jnp.argmax(input_ids == IMAGE_TOKEN_INDEX, axis=1).astype(jnp.int32)
        return jnp.where(has, idx, jnp.int32(self.cfg.image_position))

    def _splice_image(self, input_ids, image_embeds, im_start=None):
        """Embed text tokens and overwrite the image block slots at each
        sample's marker (cambrian_arch.py:457-490; the reference's XLA branch
        also splices at the per-sample indicator)."""
        ids = jnp.where(input_ids < 0, 0, input_ids)
        embeds = self.embed_tokens(ids)
        # Batch-pin both sides of the splice: the vocab-sharded embedding
        # lookup otherwise propagates a hidden-dim sharding into the
        # dynamic_update_slice, which the partitioner can only satisfy by
        # full rematerialization of the image block.
        embeds = constrain(embeds, ("data", "fsdp"), None, None)
        if image_embeds is not None:
            img = image_embeds.astype(embeds.dtype)
            img = constrain(img, ("data", "fsdp"), None, None)
            embeds = jax.vmap(
                lambda e, im, st: jax.lax.dynamic_update_slice(e, im, (st, 0))
            )(embeds, img, im_start)
            embeds = constrain(embeds, ("data", "fsdp"), None, None)
        if self.cfg.model_type.startswith("gemma"):
            # gemma scales post-splice (HF applies the normalizer to whatever
            # inputs_embeds it is given, incl. the spliced multimodal embeds)
            embeds = embeds * jnp.asarray(self.cfg.hidden_size ** 0.5, embeds.dtype)
        return embeds

    def __call__(
        self,
        input_ids: jnp.ndarray,             # [B, S]
        attention_mask: jnp.ndarray,        # [B, S] validity
        position_ids: jnp.ndarray,          # [B, S]
        aux_features_list: Optional[Sequence[jnp.ndarray]] = None,
        aux_masks_list: Optional[Sequence[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """Training / no-cache forward. Returns fp32 logits [B, S, V]."""
        return self._logits(self.hidden_states(
            input_ids, attention_mask, position_ids, aux_features_list,
            aux_masks_list))

    def hidden_states(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        position_ids: jnp.ndarray,
        aux_features_list: Optional[Sequence[jnp.ndarray]] = None,
        aux_masks_list: Optional[Sequence[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """Trunk of the training forward — everything up to (excluding) the
        lm_head. Exposed so the train step can compute the loss over sequence
        chunks (``chunked_cross_entropy``) without ever materializing the
        fp32 [B, S, vocab] logits: the r4 TPU buffer-assignment run measured
        TWO 7.83 GB such temps per device at the 8B stage-2 geometry
        (docs/PERF_NOTES.md, "TPU-compiler memory")."""
        vision = None
        if aux_features_list is not None:
            vision = self.prepare_vision(aux_features_list, aux_masks_list)
        image_embeds, vision_kv, vision_masks, global_ctx = (
            vision if vision is not None else (None, None, None, None)
        )
        im_start = self._image_start(input_ids)
        hidden = self._splice_image(input_ids, image_embeds, im_start)
        mask = make_causal_mask(attention_mask)
        hidden, _ = self._decoder(hidden, mask, position_ids, None, None,
                                  vision_kv, vision_masks, global_ctx,
                                  inject=vision is not None, im_start=im_start)
        return hidden

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Public lm_head application (fp32 logits incl. scale/softcap);
        ``apply(..., method=CambrianLM.logits)`` target for chunked CE."""
        return self._logits(hidden)

    def prefill(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        position_ids: jnp.ndarray,
        cache,
        aux_features_list: Optional[Sequence[jnp.ndarray]] = None,
        aux_masks_list: Optional[Sequence[jnp.ndarray]] = None,
    ):
        """Prefill: same math as __call__ but fills the KV cache.

        Returns (logits [B, S, V] fp32, cache).
        """
        vision = None
        if aux_features_list is not None:
            vision = self.prepare_vision(aux_features_list, aux_masks_list)
        image_embeds, vision_kv, vision_masks, global_ctx = (
            vision if vision is not None else (None, None, None, None)
        )
        im_start = self._image_start(input_ids)
        hidden = self._splice_image(input_ids, image_embeds, im_start)
        s = input_ids.shape[1]
        k_len = cache[0][0].shape[1]
        # queries attend causally within the prompt; cache slots beyond the
        # prompt are not yet valid
        pad = jnp.zeros((attention_mask.shape[0], k_len - s), dtype=bool)
        mask = make_causal_mask(jnp.concatenate([attention_mask, pad], axis=-1))
        hidden, cache = self._decoder(hidden, mask, position_ids, cache,
                                      jnp.int32(0), vision_kv, vision_masks,
                                      global_ctx, inject=vision is not None,
                                      im_start=im_start)
        return self._logits(hidden), cache

    def decode_step(
        self,
        token_ids: jnp.ndarray,        # [B, 1]
        position_ids: jnp.ndarray,     # [B, 1]
        cache,
        cache_valid: jnp.ndarray,      # [B, K] validity of cache slots
        cache_index: jnp.ndarray,      # scalar int32: write offset
    ):
        """Single greedy/sampling decode step. Returns (logits [B,V], cache)."""
        hidden = self.embed_tokens(token_ids)
        mask = make_decode_mask(cache_valid)
        hidden, cache = self._decoder(hidden, mask, position_ids, cache,
                                      cache_index, None, None, None, inject=False)
        return self._logits(hidden)[:, 0], cache


class _AuxProjector(nn.Module):
    """Dense -> GELU -> Dense -> LayerNorm (cambrian_arch.py:56)."""

    vision_hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = x.shape
        x = x.reshape(-1, shape[-1])  # one big GEMM (docs/PERF_NOTES.md)
        # batch-major rows: pin so the partitioner all-gathers the small
        # weights instead of resharding the tower-bank activations (see
        # sva.py::_flat; same r5 topology-compile finding)
        x = constrain(x, ("data", "fsdp"), None)
        x = nn.Dense(self.vision_hidden_size, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dense(self.vision_hidden_size, dtype=self.dtype, name="fc2")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)
        x = constrain(x, ("data", "fsdp"), None)
        return x.reshape(*shape[:-1], x.shape[-1])


class _SvaProjector(nn.Module):
    """Dense -> GELU -> Dense into the decoder width (cambrian_arch.py:49)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shifted next-token CE, ignoring IGNORE_INDEX (cambrian_llama.py:412-422)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, -token_ll, 0.0)
    return jnp.sum(token_loss) / jnp.maximum(jnp.sum(valid), 1)


def head_logits(cfg: CambrianConfig, head: jnp.ndarray,
                hidden: jnp.ndarray) -> jnp.ndarray:
    """Pure-function lm_head: the same math as ``CambrianLM._logits`` but
    over the raw head array (``lm_head/kernel`` [H, V], or the
    ``embed_tokens/embedding`` [V, H] when tied). The chunked CE needs the
    head as an EXPLICIT argument so its custom_vjp can accumulate the head
    cotangent under a sharding constraint (see ``chunked_cross_entropy``);
    parity with the module method is gated by
    tests/test_cambrian_model.py::test_head_logits_matches_module."""
    bf16_head = cfg.lm_head_dtype == "bf16"
    if cfg.tie_word_embeddings:
        if bf16_head:
            logits = _f32_acc_dot_general(
                hidden.astype(jnp.bfloat16), head.astype(jnp.bfloat16).T,
                (((hidden.ndim - 1,), (0,)), ((), ())))
        else:
            logits = hidden.astype(jnp.float32) @ head.astype(jnp.float32).T
    else:
        if bf16_head:
            logits = _f32_acc_dot_general(
                hidden.astype(jnp.bfloat16), head.astype(jnp.bfloat16),
                (((hidden.ndim - 1,), (0,)), ((), ())))
        else:
            logits = hidden.astype(jnp.float32) @ head.astype(jnp.float32)
    if cfg.logit_scale is not None:  # cohere
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcapping is not None:  # gemma2
        cap = cfg.final_logit_softcapping
        logits = cap * jnp.tanh(logits / cap)
    return logits


def extract_head(cfg: CambrianConfig, model_params):
    """(head array, PartitionSpec-style tuple) for ``head_logits`` /
    ``chunked_cross_entropy``, pulled out of a full CambrianLM params tree.
    The spec mirrors parallel/sharding.py's rules for the same leaves."""
    p = model_params.get("params", model_params)
    if cfg.tie_word_embeddings:
        return p["embed_tokens"]["embedding"], (("model", "fsdp"), None)
    return p["lm_head"]["kernel"], (None, ("model", "fsdp"))


def chunked_cross_entropy(hidden: jnp.ndarray, labels: jnp.ndarray,
                          logits_fn, chunk: int, head,
                          head_spec=None) -> jnp.ndarray:
    """Shifted next-token CE computed over sequence chunks of ``chunk``
    tokens, applying ``logits_fn(head, hidden_chunk)`` (the lm_head) per
    chunk.

    Same math as ``cross_entropy_loss(logits_fn(head, hidden), labels)`` —
    log_softmax is row-wise and every token's loss term is independent, so
    chunking changes only the fp32 summation order — but the fp32
    [B, S, vocab] logits never exist in HBM: each ``lax.scan`` iteration
    materializes [B, chunk, vocab], and the custom_vjp backward recomputes
    it per chunk (the jax.checkpoint behaviour, made explicit). At the 8B
    stage-2 production geometry (bs 8/device, S 2048, V 128256) that
    replaces two 7.83 GB fp32 temps per device with two ~0.5 GB ones at
    chunk=128 (r4 TPU buffer-assignment measurement, docs/PERF_NOTES.md).

    ``head`` is the lm_head weight as an EXPLICIT argument (not a closure):
    lax.scan accumulates cotangents of closed-over constants in a carry the
    partitioner cannot see a sharding for, and keeps it REPLICATED — the r5
    topology compile measured the full fp32 [4096, 128256] head cotangent
    (1.96 GiB/device, the largest allocation) on every device despite the
    fsdp-sharded param. Here the backward scan accumulates the head
    cotangent under ``constrain(. , *head_spec)`` so each device carries
    only its param-aligned shard. The reference pays the full fp32 logits
    tax instead (cambrian_llama.py:409-422) — on 32 GB v4 chips it can."""
    b, s, h = hidden.shape
    # the label for position i is labels[:, i + 1]; the final position (and
    # any pad tail) is IGNORE_INDEX, mirroring the shift in
    # cross_entropy_loss
    nxt = jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), IGNORE_INDEX, labels.dtype)], axis=1)
    n = -(-s // chunk)
    pad = n * chunk - s
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        nxt = jnp.pad(nxt, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    hid_c = hidden.reshape(b, n, chunk, h).transpose(1, 0, 2, 3)
    lab_c = nxt.reshape(b, n, chunk).transpose(1, 0, 2)
    # normalize: one hashable spec tuple per leaf of `head` (custom_vjp
    # static arg). `head` is a single array in every current caller
    # (extract_head), so a single spec tuple is the common form.
    n_leaves = len(jax.tree.leaves(head))
    if head_spec is None:
        spec_per_leaf = ((),) * n_leaves
    elif n_leaves == 1 and head_spec and isinstance(
            head_spec[0], (str, tuple, type(None))):
        spec_per_leaf = (tuple(head_spec),)
    else:
        spec_per_leaf = tuple(tuple(sp) if sp else () for sp in head_spec)
    assert len(spec_per_leaf) == n_leaves, (spec_per_leaf, n_leaves)
    return _chunked_ce(logits_fn, spec_per_leaf, hid_c, lab_c, head)


def _ce_chunk_total(logits_fn, head, hc, lc):
    """Sum of valid-token NLL over one [B, chunk] slab (fp32)."""
    # vocab-sharded logits (the head rule): log_softmax stats psum over the
    # vocab shards; never force them back to batch sharding
    logits = constrain(logits_fn(head, hc).astype(jnp.float32),
                       None, None, ("model", "fsdp"))
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = lc != IGNORE_INDEX
    safe = jnp.where(valid, lc, 0)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, -ll, 0.0))


def _valid_count(lab_c):
    return jnp.maximum(
        jnp.sum((lab_c != IGNORE_INDEX).astype(jnp.float32)), 1.0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _chunked_ce(logits_fn, spec_per_leaf, hid_c, lab_c, head):
    def body(tot, xs):
        hc, lc = xs
        return tot + _ce_chunk_total(logits_fn, head, hc, lc), None
    tot, _ = jax.lax.scan(body, jnp.float32(0.0), (hid_c, lab_c))
    return tot / _valid_count(lab_c)


def _chunked_ce_fwd(logits_fn, spec_per_leaf, hid_c, lab_c, head):
    return (_chunked_ce(logits_fn, spec_per_leaf, hid_c, lab_c, head),
            (hid_c, lab_c, head))


def _chunked_ce_bwd(logits_fn, spec_per_leaf, res, g):
    hid_c, lab_c, head = res
    scale = g / _valid_count(lab_c)
    head_leaves, head_def = jax.tree.flatten(head)

    def body(acc, xs):
        hc, lc = xs
        _, vjp_fn = jax.vjp(
            lambda hd, hcc: _ce_chunk_total(logits_fn, hd, hcc, lc), head, hc)
        dhead, dhc = vjp_fn(scale)
        new_acc = [
            constrain(a + d, *sp)
            for a, d, sp in zip(acc, jax.tree.leaves(dhead), spec_per_leaf)
        ]
        return new_acc, dhc

    zeros = [
        constrain(jnp.zeros(l.shape, l.dtype), *sp)
        for l, sp in zip(head_leaves, spec_per_leaf)
    ]
    dhead_leaves, dhid_c = jax.lax.scan(body, zeros, (hid_c, lab_c))
    dlab = np.zeros(lab_c.shape, jax.dtypes.float0)
    return dhid_c, dlab, jax.tree.unflatten(head_def, dhead_leaves)


_chunked_ce.defvjp(_chunked_ce_fwd, _chunked_ce_bwd)
