"""Spatial Vision Aggregator (SVA) — learnable-query, spatially-local
cross-attention over multiple heterogeneous vision-tower feature grids.

Re-designed from the reference (cambrian/model/vision_sampler.py) for TPU:
instead of flattening every query's local window into the batch dimension
(B*576 attention calls of q_len=1 — cambrian_arch.py:271-287), the window is
an explicit tensor axis and the whole aggregation is a handful of large
batched einsums that XLA tiles straight onto the MXU
(`ops.attention.windowed_cross_attention`).

Math parity:
- ``MultiKVCrossAttention``     == vision_sampler.py:155-234 (per-tower LN+
  k/v projections, concat along the kv axis, joint softmax, o_proj)
- ``VisionCrossAttentionLayer`` == vision_sampler.py:248-327 (context concat,
  proj_in, learnable per-tower pos embeds, residual + post-LN + MLP out)
- ``VisionAggregationLayer``    == vision_sampler.py:330-405 ('sep' type)
- ``VisionTokenSampler``        == vision_sampler.py:407-419

All LayerNorms use eps=1e-5 and GELU is the exact (erf) variant, matching
torch defaults.
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import gelu_exact
from ..ops.attention import windowed_cross_attention
from ..parallel.sharding import constrain

# 2-D sincos positional-embedding helpers (vision_sampler.py:9-57); kept for
# towers/experiments that want fixed embeddings.
import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float32)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed


_LN_EPS = 1e-5


def _gelu(x):
    return gelu_exact(x)


def _flat(fn, x):
    """Apply fn over a 2-D [rows, C] view: XLA schedules Dense over >2-D
    inputs as per-slice batched GEMMs (tiny M for windowed tensors); one flat
    matmul keeps the MXU busy (docs/PERF_NOTES.md).

    Both sides are pinned to batch sharding (rows are batch-major, so dim 0
    over (data, fsdp) IS the batch shard): without the pins the partitioner
    reshards the multi-MB window activations across devices to match the
    2-4 MB fsdp-sharded projection weights — the r5 13B topology compile
    measured ~35 GiB of fp32 K/V-LayerNorm all-to-all buffers from exactly
    this choice (docs/production_compile_r5.jsonl). Pinned, each device
    all-gathers the small weight and the whole projection stays local."""
    shape = x.shape
    x2 = constrain(x.reshape(-1, shape[-1]), ("data", "fsdp"), None)
    out = constrain(fn(x2), ("data", "fsdp"), None)
    return out.reshape(*shape[:-1], out.shape[-1])


class Mlp(nn.Module):
    """Linear -> GELU -> Linear, no biases (vision_sampler.py:237-245)."""

    d_hidden: int
    d_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.d_hidden, use_bias=False, dtype=self.dtype, name="linear_1")(x)
        x = _gelu(x)
        x = nn.Dense(self.d_out, use_bias=False, dtype=self.dtype, name="linear_2")(x)
        return x


class MultiKVCrossAttention(nn.Module):
    """Joint cross-attention over N per-tower KV banks.

    Queries attend to the concatenation of all towers' window tokens; each
    tower has its own LayerNorm+projection for K and V
    (vision_sampler.py:170-175,188-200).
    """

    hidden_dim: int
    out_dim: int
    num_towers: int
    num_heads: int = 16
    attention_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,                 # [B, Q, Cq]
        kv_list: Sequence[jnp.ndarray],       # N x [B, Q, W_i, C_i]
        mask_list: Optional[Sequence[jnp.ndarray]] = None,  # N x [B, Q, W_i] bool
    ) -> jnp.ndarray:
        assert len(kv_list) == self.num_towers
        b, q_len = queries.shape[:2]
        head_dim = self.hidden_dim // self.num_heads

        q_ln = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="q_ln")
        q_proj = nn.Dense(self.hidden_dim, use_bias=self.attention_bias,
                          dtype=self.dtype, name="q_proj")
        q = _flat(lambda t: q_proj(q_ln(t)), queries)
        q = q.reshape(b, q_len, self.num_heads, head_dim)

        ks, vs = [], []
        for i, kv in enumerate(kv_list):
            k_ln = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name=f"k_ln_{i}")
            k_proj = nn.Dense(self.hidden_dim, use_bias=self.attention_bias,
                              dtype=self.dtype, name=f"k_proj_{i}")
            v_ln = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name=f"v_ln_{i}")
            v_proj = nn.Dense(self.hidden_dim, use_bias=self.attention_bias,
                              dtype=self.dtype, name=f"v_proj_{i}")
            k = _flat(lambda t: k_proj(k_ln(t)), kv)
            v = _flat(lambda t: v_proj(v_ln(t)), kv)
            w = kv.shape[2]
            ks.append(k.reshape(b, q_len, w, self.num_heads, head_dim))
            vs.append(v.reshape(b, q_len, w, self.num_heads, head_dim))
        k = jnp.concatenate(ks, axis=2)       # [B, Q, W_total, H, D]
        v = jnp.concatenate(vs, axis=2)

        mask = None
        if mask_list is not None:
            mask = jnp.concatenate([m.astype(bool) for m in mask_list], axis=-1)

        out = windowed_cross_attention(q, k, v, mask)
        out = constrain(out.reshape(b * q_len, self.hidden_dim),
                        ("data", "fsdp"), None)
        out = nn.Dense(self.out_dim, use_bias=self.attention_bias, dtype=self.dtype,
                       name="o_proj")(out)
        out = constrain(out, ("data", "fsdp"), None)
        return out.reshape(b, q_len, self.out_dim)


class CrossAttention(nn.Module):
    """Single-bank cross-attention (vision_sampler.py:60-121), windowed layout."""

    hidden_dim: int
    out_dim: int
    num_heads: int = 16
    attention_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, kv, mask=None):
        b, q_len = queries.shape[:2]
        head_dim = self.hidden_dim // self.num_heads
        q_ln = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="q_ln")
        q_proj = nn.Dense(self.hidden_dim, use_bias=self.attention_bias,
                          dtype=self.dtype, name="q_proj")
        q = _flat(lambda t: q_proj(q_ln(t)), queries)
        q = q.reshape(b, q_len, self.num_heads, head_dim)
        k_ln = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="k_ln")
        k_proj = nn.Dense(self.hidden_dim, use_bias=self.attention_bias,
                          dtype=self.dtype, name="k_proj")
        k = _flat(lambda t: k_proj(k_ln(t)), kv)
        v_ln = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="v_ln")
        v_proj = nn.Dense(self.hidden_dim, use_bias=self.attention_bias,
                          dtype=self.dtype, name="v_proj")
        v = _flat(lambda t: v_proj(v_ln(t)), kv)
        w = kv.shape[2]
        k = k.reshape(b, q_len, w, self.num_heads, head_dim)
        v = v.reshape(b, q_len, w, self.num_heads, head_dim)
        out = windowed_cross_attention(q, k, v, mask)
        out = _flat(
            nn.Dense(self.out_dim, use_bias=self.attention_bias,
                     dtype=self.dtype, name="o_proj"),
            out.reshape(b, q_len, self.hidden_dim))
        return out


class VisionCrossAttentionLayer(nn.Module):
    """One 'joint' SVA layer (vision_sampler.py:248-327).

    queries [B,Q,q_dim] + projected context -> proj_in -> cross-attend to all
    towers' windows (with learnable per-tower positional embeddings) ->
    residual -> LayerNorm -> MLP -> + original residual.
    """

    q_dim: int
    kv_size_list: Sequence[int]   # per-tower window side; pos-embed only if >1
    hidden_dim: int = 1024
    num_heads: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,                  # [B, Q, q_dim]
        context_feature: jnp.ndarray,          # [B, Q, context_dim]
        kv_list: Sequence[jnp.ndarray],        # N x [B, Q, W_i, C]
        mask_list: Optional[Sequence[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        residual = queries
        context = _flat(
            nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                     name="proj_context"), context_feature)
        x = jnp.concatenate([queries, context], axis=-1)
        x = _flat(nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                           name="proj_in"), x)

        kv_pos = []
        for i, kv in enumerate(kv_list):
            kv_size = self.kv_size_list[i]
            if kv_size > 1:
                pos = self.param(
                    f"pos_embed_{i}",
                    nn.initializers.normal(stddev=1.0),
                    (kv_size ** 2, self.hidden_dim),
                    jnp.float32,
                )
                kv = kv + pos.astype(kv.dtype)
            kv_pos.append(kv)

        attn_out = MultiKVCrossAttention(
            hidden_dim=self.hidden_dim,
            out_dim=self.hidden_dim,
            num_towers=len(kv_list),
            num_heads=self.num_heads,
            dtype=self.dtype,
            name="cross_attn",
        )(x, kv_pos, mask_list)

        x = x + attn_out
        x = _flat(nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm"), x)
        x = _flat(Mlp(self.hidden_dim, self.q_dim, dtype=self.dtype,
                      name="proj_out"), x)
        return x + residual


class AggregationBlock(nn.Module):
    """Per-tower aggregation for the 'sep' layer type
    (vision_sampler.py:124-152): attention when the tower has a spatial
    window, a plain MLP on the (single) window token otherwise."""

    attention: bool
    hidden_dim: int
    out_dim: int
    num_heads: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, kv, mask=None):
        if self.attention:
            return CrossAttention(
                hidden_dim=self.hidden_dim, out_dim=self.out_dim,
                num_heads=self.num_heads, dtype=self.dtype, name="attention_layer",
            )(queries, kv, mask)
        # MLP path consumes the vision latents directly ([B,Q,1,C] -> [B,Q,C])
        x = kv[..., 0, :] if kv.ndim == 4 else kv
        return _flat(Mlp(self.out_dim, self.out_dim, dtype=self.dtype,
                         name="attention_layer"), x)


class VisionAggregationLayer(nn.Module):
    """'sep' SVA layer (vision_sampler.py:330-405): aggregate each tower
    separately, then combine with query-conditioned softmax weights."""

    q_dim: int
    kv_size_list: Sequence[int]
    hidden_dim: int = 1024
    num_heads: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, context_feature, kv_list, mask_list=None):
        num_towers = len(kv_list)
        residual = queries
        context = _flat(nn.Dense(self.hidden_dim, use_bias=False,
                                 dtype=self.dtype, name="proj_context"),
                        context_feature)
        cat = jnp.concatenate([queries, context], axis=-1)

        if num_towers > 1:
            weights = _flat(Mlp(self.hidden_dim, num_towers, dtype=self.dtype,
                                name="weight_mlp"), cat)
            weights = jax.nn.softmax(weights, axis=-1)[..., None]  # [B,Q,N,1]
        else:
            weights = None

        x = _flat(nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                           name="proj_in"), cat)

        aggregated = []
        for i, kv in enumerate(kv_list):
            kv_size = self.kv_size_list[i]
            if kv_size > 1:
                pos = self.param(
                    f"pos_embed_{i}",
                    nn.initializers.normal(stddev=1.0),
                    (kv_size ** 2, self.hidden_dim),
                    jnp.float32,
                )
                kv = kv + pos.astype(kv.dtype)
            mask = None if mask_list is None else mask_list[i]
            aggregated.append(
                AggregationBlock(
                    attention=kv_size > 1, hidden_dim=self.hidden_dim,
                    out_dim=self.hidden_dim, num_heads=self.num_heads,
                    dtype=self.dtype, name=f"aggregate_{i}",
                )(x, kv, mask)
            )
        stacked = jnp.stack(aggregated, axis=2)  # [B,Q,N,hidden]
        combined = (stacked * weights).sum(axis=2) if weights is not None else stacked[:, :, 0]

        x = x + combined
        x = _flat(nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm"), x)
        x = _flat(Mlp(self.hidden_dim, self.q_dim, dtype=self.dtype,
                      name="proj_out"), x)
        return x + residual


class VisionTokenSampler(nn.Module):
    """Stack of SVA layers (vision_sampler.py:407-419)."""

    q_dim: int
    kv_size_list: Sequence[int]
    vision_hidden_size: int = 1024
    num_of_layers: int = 1
    layer_type: str = "joint"   # joint | sep
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, context_feature, kv_list, mask_list=None):
        assert self.layer_type in ("joint", "sep")
        layer_cls = (
            VisionCrossAttentionLayer if self.layer_type == "joint" else VisionAggregationLayer
        )
        for idx in range(self.num_of_layers):
            queries = layer_cls(
                q_dim=self.q_dim,
                kv_size_list=self.kv_size_list,
                hidden_dim=self.vision_hidden_size,
                dtype=self.dtype,
                name=f"layers_{idx}",
            )(queries, context_feature, kv_list, mask_list)
        return queries
