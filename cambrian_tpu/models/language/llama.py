"""LLaMA-family decoder (covers LLaMA-3-8B, Vicuna-13B, Hermes-2-Yi-34B —
the reference's cambrian_llama.py bindings) with:

- fp32 RMSNorm (the reference's TPU fix, train_fsdp.py:1428-1438, is our
  default — see ops/norms.py)
- GQA + rotary embeddings (HF rotate-half convention)
- functional KV cache (explicit carry, no module state): cache slots are
  [B, max_len, kv_heads, head_dim]; decode updates via dynamic_update_slice
- mask-driven static shapes: attention combines the causal structure with the
  packing validity mask (train_fsdp.py:1089-1165 geometry), one code path for
  train and prefill
- fp32 logits (cambrian_llama.py:409)

The in-decoder SVA injection (cambrian_llama.py:168-207) lives in
models/cambrian.py, which owns the layer loop.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import dot_product_attention
from ...ops.norms import rms_norm
from ...ops.quant import DECODER_QUANT_TARGETS, QuantDense
from ..config import CambrianConfig


def decoder_dense(cfg: CambrianConfig, features: int, use_bias: bool,
                  dtype, name: str):
    """nn.Dense, or a quantized Dense when cfg.quantize is set and the site
    is a decoder GEMM target (the load_8bit / load_4bit serving paths —
    reference model/builder.py:35-44 via bitsandbytes)."""
    if cfg.quantize == "int8" and name in DECODER_QUANT_TARGETS:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    if cfg.quantize == "int4" and name in DECODER_QUANT_TARGETS:
        from ...ops.quant import QuantDense4

        return QuantDense4(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    weight_offset: float = 0.0   # gemma stores weights as (1 + w)

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.weight_offset else nn.initializers.ones
        weight = self.param("weight", init, (x.shape[-1],), jnp.float32)
        return rms_norm(x, weight + self.weight_offset, self.eps)


class BiaslessLayerNorm(nn.Module):
    """Cohere's LayerNorm: mean-centered, no bias, fp32 accumulation."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * weight
        return y.astype(x.dtype)


def decoder_norm(cfg: "CambrianConfig", name: str):
    """Per-family norm: LayerNorm-without-bias for cohere, RMSNorm (with the
    gemma +1 weight convention) otherwise."""
    if cfg.model_type == "cohere":
        return BiaslessLayerNorm(cfg.rms_norm_eps, name=name)
    offset = 1.0 if cfg.model_type.startswith("gemma") else 0.0
    return RMSNorm(cfg.rms_norm_eps, weight_offset=offset, name=name)


def rope_cos_sin(position_ids: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32, ext_factors=None,
                 mscale: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [B, S, head_dim] (duplicated-half layout, HF convention).

    ext_factors ([D/2] fp32, optional) divide the inverse frequencies and
    mscale rescales the table — the LongRoPE/su parameterization of the
    reference's vendored Phi3Su/YarnScaledRotaryEmbedding
    (phi3/modeling_phi3.py) and of linear (position-interpolation) scaling.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if ext_factors is not None:
        inv_freq = inv_freq / ext_factors
    angles = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [B,S,D/2]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return (jnp.cos(emb) * mscale).astype(dtype), (jnp.sin(emb) * mscale).astype(dtype)


def rope_scaling_factors(cfg: CambrianConfig, seq_capacity: int):
    """Resolve (ext_factors, mscale) from cfg.rope_scaling for a given static
    sequence capacity (prefill length or KV-cache size — the trace-time upper
    bound on positions, standing in for HF's dynamic seq_len check).

    Supports "longrope"/"su" (Phi-3 128k: per-frequency short/long factor
    lists with the sqrt(1 + ln(s)/ln(orig)) attention rescale) and "linear"
    (position interpolation). None/unset -> plain RoPE.
    """
    rs = cfg.rope_scaling
    if not rs:
        return None, 1.0
    typ = rs.get("type", rs.get("rope_type", ""))
    if typ in ("longrope", "su"):
        orig = cfg.original_max_position_embeddings or cfg.max_position_embeddings
        factors = rs["long_factor"] if seq_capacity > orig else rs["short_factor"]
        scale = cfg.max_position_embeddings / orig
        mscale = 1.0 if scale <= 1.0 else math.sqrt(
            1.0 + math.log(scale) / math.log(orig))
        return jnp.asarray(factors, jnp.float32), mscale
    if typ == "linear":
        return jnp.full((cfg.head_dim // 2,), float(rs["factor"]), jnp.float32), 1.0
    raise ValueError(f"unsupported rope_scaling type: {typ!r}")


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: [B,S,H,D]; cos/sin: [B,S,D] -> broadcast over heads."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    return q, k


def rope_cos_sin_interleaved(position_ids, head_dim, theta, dtype=jnp.float32):
    """Cohere layout: frequencies repeat-interleaved over adjacent pairs."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [B,S,D/2]
    emb = jnp.repeat(angles, 2, axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_interleaved(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope_interleaved(q, k, cos, sin):
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    # rope in fp32: cohere's rotation is numerically sensitive to pair mixing
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    cos32, sin32 = cos.astype(jnp.float32), sin.astype(jnp.float32)
    q_out = q32 * cos32 + _rotate_interleaved(q32) * sin32
    k_out = k32 * cos32 + _rotate_interleaved(k32) * sin32
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


class LlamaAttention(nn.Module):
    cfg: CambrianConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                     # [B, S, C]
        mask: "AttentionMask",              # structural mask (see below)
        position_ids: jnp.ndarray,          # [B, S]
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        b, s, _ = x.shape
        h, kvh, d = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        bias = c.attention_bias

        q = decoder_dense(c, h * d, bias, self.dtype, "q_proj")(x)
        k = decoder_dense(c, kvh * d, bias, self.dtype, "k_proj")(x)
        v = decoder_dense(c, kvh * d, bias, self.dtype, "v_proj")(x)
        q = q.reshape(b, s, h, d)
        k = k.reshape(b, s, kvh, d)
        v = v.reshape(b, s, kvh, d)

        if c.use_qk_norm:  # cohere Command-R+ style per-head qk RMSNorm
            q = RMSNorm(c.rms_norm_eps, name="q_norm")(q)
            k = RMSNorm(c.rms_norm_eps, name="k_norm")(k)

        if c.model_type == "cohere":
            cos, sin = rope_cos_sin_interleaved(position_ids, d, c.rope_theta,
                                                self.dtype)
            q, k = apply_rope_interleaved(q, k, cos, sin)
        else:
            # seq capacity (static): cache size when decoding, else this call's
            # span — trace-time stand-in for HF's dynamic long/short switch
            seq_capacity = cache[0].shape[1] if cache is not None else s
            ext, mscale = rope_scaling_factors(c, seq_capacity)
            cos, sin = rope_cos_sin(position_ids, d, c.rope_theta, self.dtype,
                                    ext, mscale)
            q, k = apply_rope(q, k, cos, sin)

        new_cache = None
        if cache is not None:
            cache_k, cache_v = cache
            if jnp.ndim(cache_index) == 0:
                # shared write offset (plain prefill / lockstep decode)
                k = jax.lax.dynamic_update_slice(
                    cache_k, k.astype(cache_k.dtype), (0, cache_index, 0, 0))
                v = jax.lax.dynamic_update_slice(
                    cache_v, v.astype(cache_v.dtype), (0, cache_index, 0, 0))
            else:
                # per-slot write positions [B] (continuous batching: every
                # request sits at a different depth in its cache row)
                bidx = jnp.arange(b)
                k = cache_k.at[bidx, cache_index].set(k[:, 0].astype(cache_k.dtype))
                v = cache_v.at[bidx, cache_index].set(v[:, 0].astype(cache_v.dtype))
            new_cache = (k, v)

        # GQA: expand kv heads to full heads
        if kvh != h:
            reps = h // kvh
            k = jnp.repeat(k, reps, axis=2)
            v = jnp.repeat(v, reps, axis=2)

        from ...ops.flash_attention import flash_attention

        if s >= 128 and c.attn_logit_softcapping is None:
            # prefill/train: fused Pallas attention with structural masking
            out = flash_attention(
                q, k, v, key_valid=mask.key_valid, causal=mask.causal,
                sliding_window=c.sliding_window, q_offset=mask.q_offset,
                # prefill (cache present) is inference-only: on a serve mesh
                # whose axes the bs-1 batch can't consume, keep the fused
                # kernel and let the unconsumed axes replicate
                allow_replicated=cache is not None,
            )
        else:
            # decode steps: q is tiny; padding it to an MXU tile wastes more
            # than the fused kernel saves -> plain XLA attention over the
            # cache. Gemma-2 softcapping also lands here (the fused kernel
            # has no tanh-cap epilogue).
            out = dot_product_attention(
                q, k, v, mask.dense(s, k.shape[1], c.sliding_window),
                logit_cap=c.attn_logit_softcapping)
        out = out.reshape(b, s, h * d)
        out = decoder_dense(c, c.hidden_size, bias, self.dtype, "o_proj")(out)
        return out, new_cache


class LlamaMlp(nn.Module):
    cfg: CambrianConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        bias = c.mlp_bias
        gate = decoder_dense(c, c.intermediate_size, bias, self.dtype,
                             "gate_proj")(x)
        up = decoder_dense(c, c.intermediate_size, bias, self.dtype,
                           "up_proj")(x)
        if c.hidden_act == "silu":
            act = nn.silu(gate)
        elif c.hidden_act in ("gelu_pytorch_tanh", "gelu_tanh"):
            act = nn.gelu(gate, approximate=True)
        else:
            act = nn.gelu(gate, approximate=False)
        return decoder_dense(c, c.hidden_size, bias, self.dtype,
                             "down_proj")(act * up)


class LlamaDecoderLayer(nn.Module):
    cfg: CambrianConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_ids, cache=None, cache_index=None):
        c = self.cfg
        if c.model_type == "cohere":
            # parallel residual: x + attn(ln(x)) + mlp(ln(x)), one shared norm
            normed = decoder_norm(c, "input_layernorm")(x)
            attn_out, new_cache = LlamaAttention(c, dtype=self.dtype,
                                                 name="self_attn")(
                normed, mask, position_ids, cache, cache_index)
            mlp_out = LlamaMlp(c, dtype=self.dtype, name="mlp")(normed)
            return x + attn_out + mlp_out, new_cache
        h, new_cache = LlamaAttention(c, dtype=self.dtype, name="self_attn")(
            decoder_norm(c, "input_layernorm")(x),
            mask, position_ids, cache, cache_index,
        )
        x = x + h
        h = LlamaMlp(c, dtype=self.dtype, name="mlp")(
            decoder_norm(c, "post_attention_layernorm")(x)
        )
        return x + h, new_cache


from flax import struct


class AttentionMask(struct.PyTreeNode):
    """Structural attention mask: a per-key validity vector (the packing mask,
    train_fsdp.py:1089-1165) plus a static causal flag — never a materialized
    [S, S] tensor. The Pallas kernel consumes it directly; ``dense()``
    materializes the equivalent 4D bool mask for the small-q XLA path.
    """

    key_valid: jnp.ndarray                               # [B, K] bool
    causal: bool = struct.field(pytree_node=False, default=True)
    q_offset: int = struct.field(pytree_node=False, default=0)

    def dense(self, s_q: int, s_k: int,
              sliding_window: Optional[int] = None) -> jnp.ndarray:
        """[B, 1, S_q, S_k] bool mask (HF 4D semantics,
        cambrian_llama.py:123-128)."""
        mask = self.key_valid[:, None, None, :].astype(bool)
        if self.causal or sliding_window is not None:
            q_pos = self.q_offset + jnp.arange(s_q)[:, None]
            k_pos = jnp.arange(s_k)[None, :]
            keep = jnp.ones((s_q, s_k), dtype=bool)
            if self.causal:
                keep = keep & (k_pos <= q_pos)
            if sliding_window is not None:
                keep = keep & ((q_pos - k_pos) < sliding_window)
            mask = mask & keep[None, None]
        return mask


def make_causal_mask(valid: jnp.ndarray,
                     sliding_window: Optional[int] = None) -> AttentionMask:
    """[B, S] validity -> causal structural mask (window applied per-layer
    from the config inside the attention op)."""
    return AttentionMask(key_valid=valid.astype(bool), causal=True)


def make_decode_mask(cache_valid: jnp.ndarray) -> AttentionMask:
    """[B, K] cache-slot validity -> decode-step mask. For sliding-window
    models the engine invalidates cache slots older than the window."""
    return AttentionMask(key_valid=cache_valid.astype(bool), causal=False)


def init_kv_cache(cfg: CambrianConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """Per-layer (k, v) slots [B, max_len, kv_heads, head_dim]."""
    shape = (batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
    return tuple(
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.num_hidden_layers)
    )
