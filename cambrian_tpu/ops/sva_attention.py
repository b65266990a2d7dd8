"""Fused Pallas kernel for the SVA windowed cross-attention (SURVEY §7
hard-part 3; reference hot path vision_sampler.py:155-234).

Access pattern: every latent query owns a small private KV window (the
concatenation of all towers' spatially-aligned tokens, W ~ 8-64), so the
attention is a block-diagonal bipartite pattern — not a dense [Q, K] matrix.
The jnp fallback (``ops.attention.windowed_cross_attention``) materializes
fp32 logits/probs [B, Q, H, W] plus the windowed K/V in HBM between three
einsums; this kernel streams a block of queries' windows through VMEM once
and does logits -> masked fp32 softmax -> PV per head on the VPU with no
intermediate HBM traffic.

The per-(query, head) contraction is a [D] x [W, D] matvec — too small for
the MXU no matter how it's batched (the reference's CUDA path has the same
property and batch-flattens into B*Q separate SDPA calls,
cambrian_arch.py:271-287). The FLOPs are negligible; the win is purely
HBM-traffic and fusion-barrier elimination, so the kernel matters most at
training batch sizes and for the in-LLM injection layers (10 layers x
stride 3 in the 8B recipe). Measured numbers live in docs/PERF_NOTES.md.

Backward runs the einsum math under ``jax.custom_vjp`` — with W this small
the gradient GEMMs are bandwidth-trivial and XLA fuses them; a bespoke
backward kernel would buy nothing.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .attention import NEG_INF, windowed_cross_attention


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, heads_in_block, head_dim,
            scale):
    """One (batch, q-block, head-group) grid cell. The head axis lives in
    the grid so each cell's K/V block is [G, W, group*D] (~0.5 MB) — far
    inside the 16 MB scoped-VMEM limit even with pallas's input
    double-buffering. Heads are grouped so the lane (last) block dim is a
    multiple of 128 (TPU tiling rule)."""
    valid = m_ref[0]                                    # [G, W] bool
    for h in range(heads_in_block):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qs = q_ref[0, :, sl].astype(jnp.float32)        # [G, D]
        ks = k_ref[0, :, :, sl].astype(jnp.float32)     # [G, W, D]
        logits = jnp.sum(qs[:, None, :] * ks, axis=-1) * scale
        logits = jnp.where(valid, logits, NEG_INF)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        vs = v_ref[0, :, :, sl].astype(jnp.float32)
        out = jnp.sum(p[:, :, None] * vs, axis=1)       # [G, D]
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def _fused_impl(q, k, v, mask, scale, block_q, interpret=False):
    from jax.experimental import pallas as pl

    b, q_len, h, d = q.shape
    w = k.shape[2]
    # pad the window axis to a sublane multiple and Q to whole blocks
    w_pad = -w % 16
    q_pad = -q_len % block_q
    if mask is None:
        mask = jnp.ones((b, q_len, w), dtype=bool)
    if w_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, w_pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, w_pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, w_pad)))
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)))
        # padded queries get an all-False window -> uniform probs, finite out
        mask = jnp.pad(mask, ((0, 0), (0, q_pad), (0, 0)))
    wp = w + w_pad
    qp = q_len + q_pad

    qf = q.reshape(b, qp, h * d)
    kf = k.reshape(b, qp, wp, h * d)
    vf = v.reshape(b, qp, wp, h * d)

    # lane-dim blocks must be multiples of 128: group heads accordingly
    if d % 128 == 0:
        group = 1
    elif 128 % d == 0 and h % (128 // d) == 0:
        group = 128 // d
    else:
        group = h                      # whole head dim as one block
    gd = group * d

    grid = (b, qp // block_q, h // group)
    out = pl.pallas_call(
        functools.partial(_kernel, heads_in_block=group, head_dim=d,
                          scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, gd), lambda i, j, hh: (i, j, hh)),
            pl.BlockSpec((1, block_q, wp, gd), lambda i, j, hh: (i, j, 0, hh)),
            pl.BlockSpec((1, block_q, wp, gd), lambda i, j, hh: (i, j, 0, hh)),
            pl.BlockSpec((1, block_q, wp), lambda i, j, hh: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, gd), lambda i, j, hh: (i, j, hh)),
        out_shape=jax.ShapeDtypeStruct((b, qp, h * d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, mask)
    return out.reshape(b, qp, h, d)[:, :q_len]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(q, k, v, mask, scale, block_q, interpret=False):
    return _fused_impl(q, k, v, mask, scale, block_q, interpret)


def _fused_fwd(q, k, v, mask, scale, block_q, interpret=False):
    return _fused_impl(q, k, v, mask, scale, block_q, interpret), (q, k, v, mask)


def _fused_bwd(scale, block_q, interpret, res, g):
    q, k, v, mask = res
    # recompute probs with the identical masked fp32 softmax, then the
    # standard SDPA gradients — W is tiny, XLA fuses this chain
    logits = jnp.einsum("bqhd,bqwhd->bqhw", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask[:, :, None, :], logits, NEG_INF)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)                 # [B,Q,H,W]
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dp = jnp.einsum("bqhd,bqwhd->bqhw", g32, v32)
    dv = jnp.einsum("bqhw,bqhd->bqwhd", p, g32).astype(v.dtype)
    dsoft = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bqhw,bqwhd->bqhd", dsoft, k.astype(jnp.float32))
          * scale).astype(q.dtype)
    dk = (jnp.einsum("bqhw,bqhd->bqwhd", dsoft, q.astype(jnp.float32))
          * scale).astype(k.dtype)
    return dq, dk, dv, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_windowed_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``windowed_cross_attention`` (same shapes/masking/fp32
    softmax semantics); Pallas on TPU, jnp einsums elsewhere.

    q [B,Q,H,D]; k,v [B,Q,W,H,D]; mask bool [B,Q,W] or [B,Q,H,W].
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    on_tpu = jax.default_backend() == "tpu"
    if (not on_tpu and not interpret) or q.shape[1] < block_q:
        return windowed_cross_attention(q, k, v, mask, scale)
    if mask is not None and mask.ndim == 4:
        # per-head masks never occur in SVA; fall back rather than widen VMEM
        return windowed_cross_attention(q, k, v, mask, scale)
    return _fused(q, k, v, mask, scale, block_q, interpret)
