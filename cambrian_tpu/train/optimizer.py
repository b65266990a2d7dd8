"""Optimizer with the reference's parameter-group structure
(cambrian_trainer.py:242-381): separate learning rates for the projector
group, the vision-sampler group, and (when unfrozen) the vision towers, on
top of AdamW with weight-decay exclusion for 1-D params (norms/biases).

Freeze policies (train_fsdp.py:1676-1695):
- ``tune_mm_mlp_adapter`` (stage-1 pretraining): only
  mm_projector / vision_sampler* / vision_query / image_newline train.
- ``freeze_backbone``: decoder frozen, connector trains.
Frozen groups get ``optax.set_to_zero`` so optimizer state stays pytree-
compatible across stages.
"""

import re
from dataclasses import dataclass
from typing import Optional

import jax
import optax


@dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    mm_projector_lr: Optional[float] = None
    mm_vision_sampler_lr: Optional[float] = 1e-4
    mm_vision_tower_lr: Optional[float] = None
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    adam_mu_dtype: Optional[str] = None  # "bfloat16": halve first-moment HBM
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.06
    lr_scheduler_type: str = "cosine"
    total_steps: int = 1000
    # freeze policy
    tune_mm_mlp_adapter: bool = False
    freeze_backbone: bool = False
    unfreeze_mm_vision_tower: bool = False


# Connector params trainable under tune_mm_mlp_adapter (train_fsdp.py:1676-1686)
_CONNECTOR_KEYS = (
    "mm_projector", "pos_embed", "vision_sampler", "vision_query", "image_newline",
)


def _group_of(path: str) -> str:
    if "vision_sampler" in path:
        return "vision_sampler"
    if any(k in path for k in ("mm_projector", "vision_query", "image_newline")):
        return "projector"
    if "vision_tower" in path:
        return "vision_tower"
    return "base"


def label_params(params, config: TrainConfig):
    """Pytree of group labels (adds 'frozen' per the freeze policy)."""

    def label(path, leaf):
        path_str = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        group = _group_of(path_str)
        if config.tune_mm_mlp_adapter:
            if not any(k in path_str for k in _CONNECTOR_KEYS):
                return "frozen"
        elif config.freeze_backbone and group == "base":
            return "frozen"
        if group == "vision_tower" and not config.unfreeze_mm_vision_tower:
            return "frozen"
        return group

    return jax.tree_util.tree_map_with_path(label, params)


_NORM_PATH_RE = re.compile(r"norm|(^|_)ln\d*($|_)", re.IGNORECASE)


def cast_frozen_params(params, config: TrainConfig, dtype=None):
    """Store FROZEN params in bf16 (AOT memory finding, r3): fp32 master
    weights only matter for accumulating small updates, and frozen groups
    receive none — matmul/conv compute casts to bf16 either way. Measured on
    the 34B stage-1 (1,2,4) mesh: fp32 storage needs 20.1 GB/device (> v5e
    16 GB); bf16-frozen fits. Trainable params keep fp32 master storage.

    Norm scales/biases are exempt: the repo's numerics discipline applies
    them in fp32 (ops/norms.py), so bf16 storage would round parameters the
    compute actually consumes at full precision, drifting frozen-tower
    activations off the fp32-checkpoint parity baseline. They are hidden-size
    vectors — exempting them costs ~0 HBM."""
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    labels = label_params(params, config)

    def cast(path, leaf, label):
        if label != "frozen" or getattr(leaf, "dtype", None) != jnp.float32:
            return leaf
        comps = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if any(_NORM_PATH_RE.search(c) for c in comps):
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params, labels)


def _schedule(peak_lr: float, config: TrainConfig):
    # warmup may be 0 (HF semantics: lr(0) = peak). max(1, ...) here silently
    # zeroed the first optimizer step of every warmup-free run.
    warmup = int(config.warmup_ratio * config.total_steps)
    if config.lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, peak_lr, warmup, max(config.total_steps, warmup + 1), end_value=0.0
        )
    if config.lr_scheduler_type == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, peak_lr, warmup),
                optax.linear_schedule(peak_lr, 0.0, config.total_steps - warmup),
            ],
            [warmup],
        )
    if config.lr_scheduler_type == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak_lr, warmup), optax.constant_schedule(peak_lr)],
            [warmup],
        )
    raise ValueError(f"unknown scheduler {config.lr_scheduler_type}")


def build_optimizer(params, config: TrainConfig):
    """(optax transform, labels pytree)."""

    def adamw(lr):
        return optax.adamw(
            _schedule(lr, config),
            b1=config.adam_b1,
            b2=config.adam_b2,
            eps=config.adam_eps,
            weight_decay=config.weight_decay,
            # bf16 first-moment storage (T5X-style): m is a smoothed running
            # mean of grads, so bf16 rounding is benign — unlike v, whose
            # rsqrt amplifies low-bit error, so v stays fp32. Saves 2 bytes/
            # trainable param: 2 GB/device for 8B full-finetune on fsdp=8
            # (the r4 TPU memory work, docs/PERF_NOTES.md).
            mu_dtype=config.adam_mu_dtype,
            # HF-style decay exclusion: no decay on vectors/scalars
            mask=lambda p: jax.tree.map(lambda x: x.ndim >= 2, p),
        )

    group_lrs = {
        "base": config.learning_rate,
        "projector": config.mm_projector_lr or config.learning_rate,
        "vision_sampler": config.mm_vision_sampler_lr or config.learning_rate,
        "vision_tower": config.mm_vision_tower_lr or config.learning_rate,
    }
    transforms = {g: adamw(lr) for g, lr in group_lrs.items()}
    transforms["frozen"] = optax.set_to_zero()

    labels = label_params(params, config)
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.multi_transform(transforms, labels),
    )
    return tx, labels
