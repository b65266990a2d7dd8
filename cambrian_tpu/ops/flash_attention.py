"""Fused attention Pallas kernel.

Replaces the XLA attention path's HBM-materialized [B, H, S, S] logits with a
kernel that streams K/V through VMEM and never writes probabilities to HBM —
the TPU equivalent of the reference's flash-attn/SDPA fused kernels
(SURVEY.md §2.9: torch SDPA in vision_sampler.py:109-114 and the HF decoders'
SDPA attention, flash-attn on the GPU path).

Design: grid over (batch*heads, q-blocks); each program loads its q block and
the full K/V stripe for that batch-head into VMEM (S <= ~4k fits comfortably:
K+V at 4096x128xbf16 = 2 MB), computes masked fp32 logits for the block, a
row-complete softmax (no online rescaling needed since the whole row is
resident), and one [block_q, S] x [S, D] matmul on the MXU.

Masking is structural, not a materialized [S, S] tensor: a per-key validity
vector (the packing mask, train_fsdp.py:1089-1165) plus causal / sliding-
window predicates built from block indices via iota.

Differentiable via custom_vjp with a fused Pallas backward (_attn_bwd_kernel
below): dq/dk/dv are accumulated blockwise in VMEM, so neither direction ever
materializes an [S, S] tensor in HBM.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P, get_abstract_mesh

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *, scale, causal,
                 block_q, sliding_window, q_offset):
    """The softmax chain is VPU-bound at ViT shapes (the [block_q, S_k]
    logits see ~44% of padded roofline with the naive two-select +
    full-matrix-divide form), so every elementwise pass over the logits
    matters:
    - key validity is an ADDITIVE bias row (one broadcast add) instead of a
      select; exp underflows NEG_INF-biased entries to exactly 0, so no
      second select is needed to zero masked probabilities;
    - normalization scales the [block_q, D] OUTPUT rows after the PV matmul
      (softmax is linear in the probs) instead of dividing the full
      [block_q, S_k] matrix;
    - rows with every key masked (pad q rows, fully-invalid packed rows)
      keep row_max == NEG_INF and are zeroed via the same row factor,
      matching the previous select-based semantics.
    """
    qi = pl.program_id(1)
    q = q_ref[0]          # [block_q, D]
    k = k_ref[0]          # [S_k, D]
    v = v_ref[0]          # [S_k, D]
    s_k = k.shape[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale             # [block_q, S_k]

    # [1, S_k] (kept 2-D: Mosaic rejects 1-D vectors)
    bias = jnp.where(valid_ref[0] > 0, 0.0, NEG_INF)
    if causal or sliding_window is not None:
        q_pos = (qi * block_q + q_offset
                 + jax.lax.broadcasted_iota(jnp.int32, (block_q, s_k), 0))
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_k), 1)
        pred = (k_pos <= q_pos) if causal else None
        if sliding_window is not None:
            w_pred = q_pos - k_pos < sliding_window
            pred = w_pred if pred is None else pred & w_pred
        logits = jnp.where(pred, logits, NEG_INF)
    logits = logits + bias
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits - row_max)
    denom = jnp.sum(probs, axis=-1, keepdims=True)      # [block_q, 1]
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # select (not multiply) so a hypothetical all-double-masked row — where
    # NEG_INF + NEG_INF overflows to -inf and exp(-inf - -inf) is NaN —
    # still yields exactly 0 rather than NaN * 0
    alive = row_max > 0.5 * NEG_INF
    o_ref[0] = jnp.where(
        alive, out * jnp.reciprocal(jnp.maximum(denom, 1e-30)), 0.0,
    ).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _flash_fwd_impl(q, k, v, key_valid, scale, causal, sliding_window,
                    q_offset, block_q, interpret=False):
    """q [BH, Sq, D], k/v [BH, Sk, D], key_valid [BH, Sk] -> [BH, Sq, D]."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]

    d_pad = _round_up(d, 128)
    sq_pad = _round_up(s_q, block_q)
    sk_pad = _round_up(s_k, 128)

    qp = jnp.pad(q, ((0, 0), (0, sq_pad - s_q), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, sk_pad - s_k), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, sk_pad - s_k), (0, d_pad - d)))
    validp = jnp.pad(key_valid.astype(jnp.int32), ((0, 0), (0, sk_pad - s_k)))
    validp = validp[:, None, :]  # sublane dim for the (8,128) tile rule

    grid = (bh, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, causal=causal, block_q=block_q,
            sliding_window=sliding_window, q_offset=q_offset,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_pad * sk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * sq_pad * sk_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp, validp)
    return out[:, :s_q, :d]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                     scale, causal, block_q, sliding_window, q_offset):
    """Flash backward: recompute the q-block's probabilities against the
    VMEM-resident K/V stripe, then
        dv += p^T do,  dp = do v^T,  ds = p * (dp - rowsum(do*o)),
        dq = ds k,     dk += ds^T q.
    dk/dv accumulate across the (sequential, innermost) q-block grid dim.
    """
    qi = pl.program_id(1)
    n_q = pl.num_programs(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    o = o_ref[0]
    do = do_ref[0]
    s_k = k.shape[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale

    mask = valid_ref[0] > 0
    if causal or sliding_window is not None:
        q_pos = (qi * block_q + q_offset
                 + jax.lax.broadcasted_iota(jnp.int32, (block_q, s_k), 0))
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_k), 1)
        if causal:
            mask = mask & (k_pos <= q_pos)
        if sliding_window is not None:
            mask = mask & (q_pos - k_pos < sliding_window)

    logits = jnp.where(mask, logits, NEG_INF)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits - row_max)
    probs = jnp.where(mask, probs, 0.0)
    denom = jnp.maximum(jnp.sum(probs, axis=-1, keepdims=True), 1e-30)
    probs = probs / denom                                   # [bq, Sk] fp32

    do32 = do.astype(jnp.float32)
    o32 = o.astype(jnp.float32)
    delta = jnp.sum(do32 * o32, axis=-1, keepdims=True)     # [bq, 1]
    dp = jax.lax.dot_general(
        do32, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [bq, Sk]
    ds = probs * (dp - delta) * scale

    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dv_part = jax.lax.dot_general(
        probs, do32, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [Sk, D]
    dk_part = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [Sk, D]

    @pl.when(qi == 0)
    def _():
        dk_acc[...] = dk_part
        dv_acc[...] = dv_part

    @pl.when(qi > 0)
    def _():
        dk_acc[...] += dk_part
        dv_acc[...] += dv_part

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, key_valid, o, do, scale, causal, sliding_window,
                    q_offset, block_q, interpret=False):
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    d_pad = _round_up(d, 128)
    sq_pad = _round_up(s_q, block_q)
    sk_pad = _round_up(s_k, 128)

    qp = jnp.pad(q, ((0, 0), (0, sq_pad - s_q), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, sk_pad - s_k), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, sk_pad - s_k), (0, d_pad - d)))
    op = jnp.pad(o, ((0, 0), (0, sq_pad - s_q), (0, d_pad - d)))
    dop = jnp.pad(do, ((0, 0), (0, sq_pad - s_q), (0, d_pad - d)))
    validp = jnp.pad(key_valid.astype(jnp.int32), ((0, 0), (0, sk_pad - s_k)))
    validp = validp[:, None, :]

    grid = (bh, sq_pad // block_q)
    kwargs = dict(scale=scale, causal=causal, block_q=block_q,
                  sliding_window=sliding_window, q_offset=q_offset)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, **kwargs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, sk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_pad, d_pad), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((sk_pad, d_pad), jnp.float32),
            pltpu.VMEM((sk_pad, d_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq_pad * sk_pad * d_pad,
            bytes_accessed=5 * qp.size * qp.dtype.itemsize,
            transcendentals=bh * sq_pad * sk_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp, validp, op, dop)
    return dq[:, :s_q, :d], dk[:, :s_k, :d], dv[:, :s_k, :d]


def _xla_reference(q, k, v, key_valid, scale, causal, sliding_window, q_offset):
    """Plain-XLA attention with identical mask semantics (CPU path + the
    custom-vjp backward)."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = key_valid[:, None, :].astype(bool)
    if causal or sliding_window is not None:
        q_pos = q_offset + jnp.arange(s_q)[:, None]
        k_pos = jnp.arange(s_k)[None, :]
        if causal:
            mask = mask & (k_pos <= q_pos)[None]
        if sliding_window is not None:
            mask = mask & ((q_pos - k_pos) < sliding_window)[None]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(mask, probs, 0.0)
    return jnp.einsum("bqk,bkd->bqd", probs.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash(q, k, v, key_valid, scale, causal, sliding_window, q_offset,
           block_q, interpret=False):
    return _flash_fwd_impl(q, k, v, key_valid, scale, causal, sliding_window,
                           q_offset, block_q, interpret)


def _flash_fwd(q, k, v, key_valid, scale, causal, sliding_window, q_offset,
               block_q, interpret):
    out = _flash_fwd_impl(q, k, v, key_valid, scale, causal, sliding_window,
                          q_offset, block_q, interpret)
    return out, (q, k, v, key_valid, out)


def _flash_bwd(scale, causal, sliding_window, q_offset, block_q, interpret,
               res, g):
    q, k, v, key_valid, out = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, key_valid, out, g, scale, causal,
                                 sliding_window, q_offset, block_q, interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def _attend_bqhd(q, k, v, key_valid, *, scale, causal, sliding_window,
                 q_offset, block_q, use_pallas, interpret=False):
    """[B, S, H, D] q/k/v + [B, Sk] key validity -> [B, Sq, H, D].

    Flattens (batch, head) into kernel rows; shapes are taken from the
    arguments so the same body serves both the global call and the per-shard
    body under ``shard_map`` (where B and H are the local block sizes)."""
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, s_q, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s_k, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s_k, d)
    validf = jnp.repeat(key_valid, h, axis=0)
    if use_pallas:
        out = _flash(qf, kf, vf, validf, scale, causal, sliding_window,
                     q_offset, block_q, interpret)
    else:
        out = _xla_reference(qf, kf, vf, validf, scale, causal,
                             sliding_window, q_offset)
    return out.reshape(b, h, s_q, d).transpose(0, 2, 1, 3)


def _mesh_attention_specs(b, h, mesh):
    """PartitionSpecs to run attention as independent per-device shards over
    the active mesh: batch over the non-'model' axes (mesh order), heads over
    'model'. Returns ``(qkv_spec, key_valid_spec)``, or None when any axis of
    size > 1 cannot be consumed (B or H not divisible): an unused axis would
    replicate the kernel over it, and under differentiation ``shard_map``'s
    transpose psums replicated cotangents — overcounting by the axis size.
    Callers fall back to the (auto-partitionable) XLA path instead."""
    batch_axes, head_axes, prod = [], [], 1
    for name, size in mesh.shape.items():
        if size == 1:
            continue
        if name == "model":
            if h % size != 0:
                return None
            head_axes.append(name)
        elif b % (prod * size) == 0:
            batch_axes.append(name)
            prod *= size
        else:
            return None
    return (
        P(tuple(batch_axes) or None, None, tuple(head_axes) or None, None),
        P(tuple(batch_axes) or None, None),
    )


def flash_attention(
    q: jnp.ndarray,                 # [B, Sq, H, D]
    k: jnp.ndarray,                 # [B, Sk, H, D]
    v: jnp.ndarray,                 # [B, Sk, H, D]
    key_valid: Optional[jnp.ndarray] = None,   # [B, Sk] bool
    causal: bool = False,
    sliding_window: Optional[int] = None,
    q_offset: int = 0,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    allow_replicated: bool = False,
) -> jnp.ndarray:
    """Fused masked attention in BQHD layout; falls back to the XLA path off
    TPU (tests run on the CPU mesh; pallas-interpret is too slow there).

    Under a multi-device mesh (``jax.set_mesh``) the pallas_call cannot be
    auto-partitioned by GSPMD, so the kernel runs per-shard inside a
    ``shard_map`` — batch over the data/fsdp axes, heads over 'model', no
    communication. When the shapes can't consume every mesh axis the call
    routes to the XLA path, which GSPMD partitions freely; inference-only
    call sites may instead pass ``allow_replicated=True`` to keep the kernel
    and replicate compute over the unconsumed axes (forward-correct; under
    differentiation replicated cotangents would be overcounted, hence the
    opt-in).
    """
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    if key_valid is None:
        key_valid = jnp.ones((b, s_k), dtype=bool)
    if block_q is None:
        # ViT-length non-causal rows: one program per batch-head fetches the
        # K/V stripe once (block_q sweep at the DINOv2 shape: 768 beats 256
        # by ~5%). Longer/causal sequences keep 256 — the whole-row fp32
        # logits (s_q x s_k x 4B) must stay well inside the 16 MB VMEM.
        # s_k gates the large block too: cross-attention with small s_q but
        # long s_k would otherwise put an [s_q, s_k] fp32 block in one program.
        block_q = (_round_up(s_q, 128)
                   if (not causal and s_q <= 768 and s_k <= 1024) else 256)
    block_q = min(block_q, _round_up(s_q, 128))

    attend = functools.partial(
        _attend_bqhd, scale=scale, causal=causal,
        sliding_window=sliding_window, q_offset=q_offset, block_q=block_q)

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        return attend(q, k, v, key_valid, use_pallas=False)
    mesh = get_abstract_mesh()
    if mesh.empty or mesh.size <= 1:
        return attend(q, k, v, key_valid, use_pallas=True)
    specs = _mesh_attention_specs(b, h, mesh)
    if specs is None:
        if not allow_replicated:
            return attend(q, k, v, key_valid, use_pallas=False)
        # consume what divides; leave the rest replicated (inference-only)
        batch_axes, head_axes, prod = [], [], 1
        for name, size in mesh.shape.items():
            if size == 1:
                continue
            if name == "model" and h % size == 0:
                head_axes.append(name)
            elif name != "model" and b % (prod * size) == 0:
                batch_axes.append(name)
                prod *= size
        specs = (
            P(tuple(batch_axes) or None, None, tuple(head_axes) or None,
              None),
            P(tuple(batch_axes) or None, None),
        )
    qkv_spec, valid_spec = specs
    sharded = jax.shard_map(
        functools.partial(attend, use_pallas=True),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, valid_spec),
        out_specs=qkv_spec,
        # the custom_vjp body has no vma rule; replication safety is enforced
        # structurally above (_mesh_attention_specs / allow_replicated)
        check_vma=False,
    )
    return sharded(q, k, v, key_valid)
