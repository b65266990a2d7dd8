"""LoRA: low-rank adapters over decoder projection kernels.

Covers the reference's LoRA surface (train flags lora_enable/lora_r/
lora_alpha/... in train_fsdp.py:121-173 and the LoRA-merge load path in
model/builder.py:55-89) in functional form:

- adapters are a separate pytree mirroring the targeted kernels with
  {"a": [in, r], "b": [r, out]} factors,
- training differentiates only the adapter tree; the merged weights
  ``W + (alpha/r) a @ b`` are materialized inside the loss (the base tree
  stays frozen and donated),
- ``merge_lora`` folds adapters into the base for export, after which the
  checkpoint is indistinguishable from a full finetune.
"""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                   "gate_proj", "up_proj", "down_proj")


def _targeted(path_str: str, targets: Sequence[str]) -> bool:
    return path_str.endswith("kernel") and any(t in path_str for t in targets)


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in path)


def init_lora_params(params, rank: int, rng, targets: Sequence[str] = DEFAULT_TARGETS):
    """Adapter tree: for each targeted kernel [in, out], a ~N(0, 1/r) [in, r]
    and b = 0 [r, out] (standard LoRA init: delta starts at zero)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    adapters = {}
    key = rng
    for path, leaf in flat:
        ps = _path_str(path)
        if _targeted(ps, targets) and leaf.ndim == 2:
            key, sub = jax.random.split(key)
            adapters[ps] = {
                "a": jax.random.normal(sub, (leaf.shape[0], rank),
                                       jnp.float32) / rank,
                "b": jnp.zeros((rank, leaf.shape[1]), jnp.float32),
            }
    return adapters


def apply_lora(params, adapters: Dict[str, dict], alpha: float, rank: int):
    """Materialize merged weights W + (alpha/rank) * a @ b (other leaves pass
    through untouched)."""
    scale = alpha / rank

    def merge(path, leaf):
        ps = _path_str(path)
        ad = adapters.get(ps)
        if ad is None:
            return leaf
        delta = (ad["a"] @ ad["b"]) * scale
        return leaf + delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def merge_lora(params, adapters, alpha: float, rank: int):
    """Permanent fold-in for export (model/builder.py merge path)."""
    return apply_lora(params, adapters, alpha, rank)


def lora_state_dict(adapters: Dict[str, dict]) -> Dict[str, np.ndarray]:
    """Flat numpy dict for safetensors export (keys: <kernel path>.lora_{a,b}).
    ascontiguousarray: safetensors' numpy writer serializes the raw buffer, so
    any non-contiguous view would be silently reordered (checkpoint/save.py)."""
    out = {}
    for ps, ad in adapters.items():
        out[f"{ps}.lora_a"] = np.ascontiguousarray(np.asarray(ad["a"]))
        out[f"{ps}.lora_b"] = np.ascontiguousarray(np.asarray(ad["b"]))
    return out


def lora_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    adapters: Dict[str, dict] = {}
    for k, v in sd.items():
        if k.endswith(".lora_a"):
            adapters.setdefault(k[:-7], {})["a"] = jnp.asarray(v)
        elif k.endswith(".lora_b"):
            adapters.setdefault(k[:-7], {})["b"] = jnp.asarray(v)
    return adapters


def make_lora_loss_fn(model, base_params, alpha: float, rank: int, loss_fn):
    """Wrap a params->loss function so it differentiates adapters only."""

    def wrapped(adapters, *args, **kwargs):
        merged = apply_lora(base_params, adapters, alpha, rank)
        return loss_fn(merged, *args, **kwargs)

    return wrapped
