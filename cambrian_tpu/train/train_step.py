"""Sharded training step.

The thin custom loop replacing HF Trainer + torch_xla FSDP (SURVEY.md §7
deliberate non-ports): params/opt-state sharded by GSPMD rules
(parallel/sharding.py), batch sharded over (data, fsdp), XLA inserts the
collectives. Vision towers run inside the step under stop_gradient when
frozen (the production default; train_fsdp.py:1676-1695), so the whole
image->loss pipeline is one compiled program.
"""

from functools import partial
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.cambrian import (
    CambrianLM,
    chunked_cross_entropy,
    cross_entropy_loss,
    extract_head,
    head_logits,
)
from ..parallel.sharding import batch_sharding, infer_param_shardings, replicated
from .optimizer import TrainConfig, build_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = jax.tree.map(lambda p, u: p + u, self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def init_train_state(params, config: TrainConfig) -> TrainState:
    tx, _ = build_optimizer(params, config)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)


def _supervised_loss(model: CambrianLM, model_params, batch, aux_features):
    """Shifted CE over the batch, honoring cfg.loss_chunk: with chunking the
    fp32 [B, S, V] logits never materialize (models/cambrian.py::
    chunked_cross_entropy — the r4 TPU buffer-assignment fix); shared by the
    full-finetune and LoRA steps so --lora_enable gets the same HBM budget."""
    chunk = getattr(model.cfg, "loss_chunk", 0)
    if chunk:
        hidden = model.apply(
            model_params,
            batch["input_ids"],
            batch["attention_mask"],
            batch["position_ids"],
            aux_features,
            batch.get("aux_masks"),
            method=CambrianLM.hidden_states,
        )
        # head passed EXPLICITLY (not closed over): the CE's custom_vjp
        # accumulates the head cotangent under its param sharding — closed
        # over, lax.scan carried the full fp32 [H, V] cotangent REPLICATED
        # on every device (1.96 GiB at 8B; the r5 topology-compile finding)
        cfg = model.cfg
        head, head_spec = extract_head(cfg, model_params)
        return chunked_cross_entropy(
            hidden, batch["labels"],
            lambda hd, hc: head_logits(cfg, hd, hc),
            chunk, head, head_spec)
    logits = model.apply(
        model_params,
        batch["input_ids"],
        batch["attention_mask"],
        batch["position_ids"],
        aux_features,
        batch.get("aux_masks"),
    )
    return cross_entropy_loss(logits, batch["labels"])


def make_train_step(
    model: CambrianLM,
    towers: Optional[Sequence] = None,
    train_towers: bool = False,
    freeze: Optional[TrainConfig] = None,
) -> Callable:
    """Returns ``step(state, tower_params, batch) -> (state, metrics)``.

    ``batch``: input_ids, labels, attention_mask, position_ids,
    images (list, per tower, NCHW), aux_masks (list, per tower).

    ``freeze``: when given, params the freeze policy labels 'frozen'
    (optimizer.label_params) are wrapped in ``stop_gradient`` inside the
    loss, so the backward never computes their weight gradients at all.
    Without this, stage-1 (frozen decoder) differentiates every decoder
    matmul and — under scan_layers — materializes full stacked dW
    cotangent buffers per segment (the top HLO temps in the 34B (1,2,4)
    TPU buffer assignment: 3x490 MB + 2x171 MB of zero-init grad stacks).
    It also matches the reference's clipping semantics: HF Trainer clips
    the global norm of the *optimized* params only
    (cambrian_trainer.py:242-381 builds groups from trainable params),
    whereas clipping over real-but-discarded frozen grads rescales the
    trainable gradient step.
    """

    def encode_towers(tower_params, images, differentiable):
        feats = []
        for tower, tp, px in zip(towers, tower_params, images):
            f = tower.apply(tp, px)
            if not differentiable:
                f = jax.lax.stop_gradient(f)
            feats.append(f)
        return feats

    def step(state: TrainState, tower_params, batch):
        # unfreeze_mm_vision_tower: tower params live INSIDE state.params
        # (under "vision_towers") so they are differentiated and optimized
        # by the vision_tower LR group; otherwise they are a frozen argument
        # whose forward runs under stop_gradient.
        combined = isinstance(state.params, dict) and "vision_towers" in state.params

        def loss_fn(p):
            if freeze is not None:
                from .optimizer import label_params

                labels = label_params(p, freeze)
                p = jax.tree.map(
                    lambda x, l: jax.lax.stop_gradient(x) if l == "frozen" else x,
                    p, labels)
            if combined:
                model_params, tps = p["model"], p["vision_towers"]
            else:
                model_params, tps = p, tower_params
            aux_features = None
            if towers is not None and batch.get("images") is not None:
                aux_features = encode_towers(tps, batch["images"],
                                             differentiable=combined)
            return _supervised_loss(model, model_params, batch, aux_features)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "grad_norm": optax_global_norm(grads),
            "step": new_state.step,
        }
        return new_state, metrics

    return step


def make_lora_train_step(model, towers, base_params, alpha: float, rank: int):
    """LoRA training step: state.params is the ADAPTER tree; the frozen base
    is a captured constant, merged inside the loss (train/lora.py)."""
    from .lora import apply_lora

    def step(state: TrainState, tower_params, batch):
        def loss_fn(adapters):
            merged = apply_lora(base_params, adapters, alpha, rank)
            aux_features = None
            if towers is not None and batch.get("images") is not None:
                aux_features = [
                    jax.lax.stop_gradient(t.apply(tp, px))
                    for t, tp, px in zip(towers, tower_params, batch["images"])
                ]
            return _supervised_loss(model, merged, batch, aux_features)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads),
                           "step": new_state.step}

    return step


def optax_global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def batch_shardings(mesh: Mesh, num_towers: int):
    """Shardings for the batch dict (leading dim over data+fsdp)."""
    b2 = batch_sharding(mesh, 2)
    b3 = batch_sharding(mesh, 3)
    b4 = batch_sharding(mesh, 4)
    return {
        "input_ids": b2,
        "labels": b2,
        "attention_mask": b2,
        "position_ids": b2,
        "images": [b4] * num_towers,
        "aux_masks": [b3] * num_towers,
    }


def state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """Shardings pytree for a TrainState. Optimizer state (Adam mu/nu) mirrors
    the params tree structure, so the same path-based rules apply — the moment
    leaves' paths contain the param names (…/mu/layers_0/self_attn/q_proj/…)."""
    return state.replace(
        step=replicated(mesh),
        params=infer_param_shardings(state.params, mesh),
        opt_state=infer_param_shardings(state.opt_state, mesh),
    )
