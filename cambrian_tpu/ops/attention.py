"""Attention ops.

``dot_product_attention`` is the generic masked SDPA used across the model
core (decoder self-attention until the Pallas flash kernel lands, SVA
cross-attention fallback). Logits and softmax run in fp32 regardless of the
input dtype — the same discipline torch SDPA applies internally — which is
required for bf16 logit parity with the reference (vision_sampler.py:109-114,
cambrian_llama.py:120-128).

Layout convention: BQHD ("BTNH") — batch, sequence, heads, head_dim.
"""

from typing import Optional

import jax.numpy as jnp

from ..parallel.sharding import constrain

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    logit_cap: Optional[float] = None,
) -> jnp.ndarray:
    """Masked scaled dot-product attention.

    Args:
        q: [B, Q, H, D]
        k: [B, K, H, D]
        v: [B, K, H, D]
        mask: optional bool, broadcastable to [B, H, Q, K]; True = attend.
        scale: defaults to 1/sqrt(D).
        logit_cap: Gemma-2 attn_logit_softcapping — logits squashed to
            cap*tanh(logits/cap) before masking (fp32).

    Returns:
        [B, Q, H, D] in q.dtype.
    """
    dtype = q.dtype
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if logit_cap is not None:
        logits = logit_cap * jnp.tanh(logits / logit_cap)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v)
    return out


def windowed_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Spatially-local cross-attention where every query position owns its own
    KV window — the SVA access pattern (cambrian_arch.py:271-287 flattens the
    window into the batch dim; we keep it as an explicit axis so XLA sees one
    large batched matmul on the MXU instead of B*576 tiny ones).

    Args:
        q: [B, Q, H, D]       (Q latent query positions)
        k: [B, Q, W, H, D]    (W = window tokens per query, concat over towers)
        v: [B, Q, W, H, D]
        mask: optional bool [B, Q, W] or [B, Q, H, W]; True = attend.
        scale: defaults to 1/sqrt(D).

    Returns:
        [B, Q, H, D] in q.dtype.
    """
    dtype = q.dtype
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    # Every tensor here is per-query-window local: pin batch sharding so the
    # partitioner never reshards the [B,Q,W,H,D] banks to match weight
    # layouts (no-op without a mesh — parallel.sharding.constrain).
    q = constrain(q, ("data", "fsdp"), None, None, None)
    k = constrain(k, ("data", "fsdp"), None, None, None, None)
    v = constrain(v, ("data", "fsdp"), None, None, None, None)
    logits = jnp.einsum("bqhd,bqwhd->bqhw", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, :, None, :]
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bqhw,bqwhd->bqhd", probs.astype(dtype), v)
    return out
