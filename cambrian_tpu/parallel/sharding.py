"""Name-based parameter sharding rules (GSPMD).

Replaces the reference's XLA-FSDP wrapper + dim-0 shard patch
(train_fsdp.py:1277-1398, fsdp_config.json): parameters are annotated with
NamedShardings and XLA inserts the all-gathers/reduce-scatters. Tensor
parallelism (absent in the reference; needed for 34B on small slices,
SURVEY.md §7 hard-part 7) falls out of the same rules via the `model` axis.

Rules are path-keyed; any dimension not divisible by its axis size falls back
to replication for that axis, so the same rules work on any mesh shape.
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over data+fsdp."""
    return NamedSharding(mesh, P(("data", "fsdp"), *([None] * (ndim - 1))))


# (substring match on the flattened param path) -> spec builder.
# Specs follow Megatron layout: column-parallel in, row-parallel out.
def _rule_for(path: str, shape: Tuple[int, ...]) -> P:
    if len(shape) <= 1:
        # biases / norms / vectors: shard long vectors over fsdp, else replicate
        return P("fsdp") if shape and shape[0] >= 8192 else P()

    if "embed_tokens" in path and path.endswith("embedding"):
        # vocab over BOTH axes, hidden replicated: a hidden-sharded lookup
        # output forces involuntary full remat at the image-splice DUS
        # (partitioner cannot reshard hidden->batch efficiently); vocab-only
        # sharding keeps the same memory footprint and lookups become
        # masked-gather + psum, which GSPMD handles natively.
        return P(("model", "fsdp"), None)
    if "lm_head" in path:
        # vocab over BOTH axes, hidden replicated (the embedding rule's
        # philosophy): with hidden over fsdp the chunked-CE GEMM must move
        # the 1.96 GiB fp32 weight (all-gather) or the 525 MB fp32 logits
        # (all-to-all) every chunk — the r5 8B-stage-2 topology failures.
        # Vocab-sharded, each chunk all-gathers only the ~8 MB bf16 hidden
        # rows, the logits/log_softmax stay vocab-sharded (psum'd stats),
        # and the head cotangent is born param-aligned with no collective.
        return P(None, ("model", "fsdp"))
    if any(k in path for k in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                               "fc1", "weights_in", "pwconv1")):
        return P("fsdp", "model")          # column parallel
    if any(k in path for k in ("o_proj", "out_proj", "down_proj", "fc2",
                               "weights_out", "pwconv2")):
        return P("model", "fsdp")          # row parallel
    if path.endswith("patch_embed/kernel") or "conv" in path.lower():
        return P(None, None, None, "fsdp") if len(shape) == 4 else P()
    if "pos_embed" in path:
        return P(None, "fsdp") if len(shape) == 2 else P()
    # generic ND: shard dim 0 over fsdp (the reference's shard_param_on_dim_0)
    return P("fsdp", *([None] * (len(shape) - 1)))


def _fit_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop axes whose size does not divide the corresponding dim."""
    fitted = []
    for dim_i, axis in enumerate(spec):
        if axis is None or dim_i >= len(shape):
            fitted.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        fitted.append(axis if shape[dim_i] % size == 0 else None)
    while len(fitted) < len(shape):
        fitted.append(None)
    return P(*fitted[: len(shape)])


def infer_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching ``params``' structure. Works on any
    pytree whose leaf paths contain the parameter names (so it also covers
    Adam mu/nu, which mirror the params tree)."""

    def spec_for(path, leaf):
        path_str = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        return NamedSharding(
            mesh, _fit_spec(_rule_for(path_str, leaf.shape), leaf.shape, mesh)
        )

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_pytree(tree, shardings):
    """device_put a pytree according to its shardings tree."""
    return jax.tree.map(jax.device_put, tree, shardings)


def constrain(x, *spec):
    """``with_sharding_constraint`` that is safe to call from model code.

    No-op when no mesh is active (single-chip tests/inference); drops axis
    names the active mesh does not define and axes whose size does not divide
    the constrained dimension. Used to pin activation shardings at boundaries
    where the partitioner would otherwise pick layouts that force involuntary
    full rematerialization (e.g. the in-decoder SVA latent-window slices).
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty:
        return x

    names = set(mesh.axis_names)

    def fit(dim_i, axis):
        if axis is None or dim_i >= x.ndim:
            return None
        axes = axis if isinstance(axis, tuple) else (axis,)
        axes = tuple(a for a in axes if a in names)
        if not axes:
            return None
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if x.shape[dim_i] % size != 0:
            return None
        return axes if len(axes) > 1 else axes[0]

    fitted = [fit(i, a) for i, a in enumerate(spec)]
    while len(fitted) < x.ndim:
        fitted.append(None)
    return jax.lax.with_sharding_constraint(x, P(*fitted))
