"""Generic Vision Transformer covering the production ViT towers:

- OpenAI CLIP-ViT-L/14-336 (class token, pre-embedding LayerNorm, quick_gelu,
  hidden tap at select_layer=-2 — reference clip_encoder.py:57-68)
- SigLIP-SO400M-14 (no class token, tanh-approx GELU, full forward incl.
  final LayerNorm — reference siglip_encoder.py:95-99)
- DINOv2-giant (class token, LayerScale, SwiGLU FFN, full forward incl.
  final LayerNorm, position-embedding interpolation for -res overrides —
  reference dino_encoder.py)

One Flax module, knobs per variant. Weight conversion from the HF torch
checkpoints lives in ``cambrian_tpu.checkpoint.hf_vision``.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.activations import gelu_exact
from ...ops.norms import (
    DenseParams,
    LayerNormParams,
    StreamLayerNorm,
    layer_norm_into_dense,
    layer_norm_stream,
)


def _ln_into_gemm_vit() -> bool:
    """A/B flag: fold norm2 through the MLP's first GEMM(s) (ops/norms.py::
    layer_norm_into_dense). Off by default until the on-chip measurement
    lands (only-wire-what-wins; see ConvNeXt's flag for the measured case)."""
    import os

    return os.environ.get("CAMBRIAN_LN_INTO_GEMM_VIT", "0") == "1"


@dataclass(frozen=True)
class ViTConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    patch_size: int
    image_size: int
    class_token: bool = True
    num_register_tokens: int = 0
    pre_layernorm: bool = False          # CLIP's pre_layrnorm after embeddings
    final_layernorm: bool = True         # applied only on full-depth forward
    act: str = "gelu"                    # gelu | quick_gelu | gelu_tanh
    swiglu: bool = False                 # DINOv2-giant FFN
    layer_scale: bool = False            # DINOv2 LayerScale
    ln_eps: float = 1e-5
    patch_bias: bool = True              # CLIP patch conv has no bias
    select_layer: int = 0                # 0/None = full forward; -2 = CLIP tap
    select_feature: str = "patch"        # patch | cls_patch
    # ----- BEiT / EVA-02 variants (midas_encoder.py, eva_clip_encoder.py) --
    k_bias: bool = True                  # BEiT/EVA-02: key proj has no bias
    abs_pos_embed: bool = True           # BEiT: no absolute position embed
    rel_pos_bias: bool = False           # BEiT: per-block relative pos bias
    rope: bool = False                   # EVA-02: 2-D axial rotary embedding
    rope_ref_side: int = 0               # EVA-02 pretrain grid side (pt_seq_len)
    swiglu_ln: bool = False              # EVA-02 sub-LN SwiGLU (LN before fc2)

    @property
    def grid_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_side ** 2

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.num_register_tokens

    @property
    def num_blocks_to_run(self) -> int:
        """select_layer indexes the HF hidden_states list: hidden_states[-2]
        is the output of block L-1 (clip_encoder.py:57-63)."""
        if self.select_layer in (0, None):
            return self.num_layers
        if self.select_layer < 0:
            return self.num_layers + self.select_layer + 1
        return self.select_layer


def _activation(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu_tanh":
        return lambda x: nn.gelu(x, approximate=True)
    if name == "gelu":
        return gelu_exact
    raise ValueError(f"unknown activation {name}")


def _rope_tables(side: int, head_dim: int, ref_side: int):
    """EVA-02 2-D axial rotary tables for a ``side``x``side`` patch grid.

    Matches the published VisionRotaryEmbeddingFast (EVA-02; also timm
    eva.py's RotaryEmbeddingCat semantics): theta=10000 over ``head_dim//2``
    per-axis dims, positions rescaled to the pretrain grid ``ref_side``
    (ft_seq_len/pt_seq_len interpolation), interleaved pair rotation, and the
    two axes' halves concatenated on the feature dim."""
    axis_dim = head_dim // 2
    freqs = 1.0 / (10000.0 ** (np.arange(0, axis_dim, 2, dtype=np.float64)
                               / axis_dim))
    t = np.arange(side, dtype=np.float64)
    if ref_side and ref_side != side:
        t = t / side * ref_side
    ang = np.einsum("s,f->sf", t, freqs)           # [side, axis_dim//2]
    ang = np.repeat(ang, 2, axis=-1)               # interleave pairs
    ang_h = np.broadcast_to(ang[:, None, :], (side, side, axis_dim))
    ang_w = np.broadcast_to(ang[None, :, :], (side, side, axis_dim))
    full = np.concatenate([ang_h, ang_w], axis=-1).reshape(side * side, head_dim)
    return jnp.asarray(np.sin(full), jnp.float32), jnp.asarray(np.cos(full), jnp.float32)


def _rotate_every_two(x):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rope(x, sin, cos, n_prefix: int):
    """Rotate patch tokens only (prefix/cls tokens pass through) — EVA-02
    applies rope after splitting off the class token."""
    prefix, patches = x[:, :n_prefix], x[:, n_prefix:]
    sin = sin[None, :, None, :].astype(x.dtype)
    cos = cos[None, :, None, :].astype(x.dtype)
    patches = patches * cos + _rotate_every_two(patches) * sin
    return jnp.concatenate([prefix, patches], axis=1) if n_prefix else patches


def beit_relative_position_index(side: int) -> np.ndarray:
    """Static [1+g^2, 1+g^2] lookup into the (2g-1)^2+3 BEiT relative-distance
    table; the 3 extra rows cover cls<->patch and cls<->cls (HF
    BeitRelativePositionBias semantics)."""
    coords = np.stack(np.meshgrid(np.arange(side), np.arange(side),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel = rel + (side - 1)
    rel[:, :, 0] *= 2 * side - 1
    n = side * side
    num_dist = (2 * side - 1) ** 2 + 3
    index = np.zeros((n + 1, n + 1), dtype=np.int32)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_dist - 3
    index[0:, 0] = num_dist - 2
    index[0, 0] = num_dist - 1
    return index


class ViTAttention(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None, rel_pos_index=None):
        c = self.cfg
        b, n, _ = x.shape
        head_dim = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, use_bias=c.k_bias, dtype=self.dtype,
                     name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, n, c.num_heads, head_dim)
        k = k.reshape(b, n, c.num_heads, head_dim)
        v = v.reshape(b, n, c.num_heads, head_dim)
        if rope is not None:
            sin, cos = rope
            q = _apply_rope(q, sin, cos, c.num_prefix_tokens)
            k = _apply_rope(k, sin, cos, c.num_prefix_tokens)
        if rel_pos_index is not None:
            # BEiT: per-block learned relative position bias added to the
            # attention logits; plain fp32-softmax path (bias precludes the
            # fused kernel; ablation-zoo towers only).
            num_dist = int(rel_pos_index.max()) + 1
            table = self.param("rel_pos_table", nn.initializers.zeros,
                               (num_dist, c.num_heads), jnp.float32)
            bias = table[jnp.asarray(rel_pos_index)]        # [N, N, H]
            bias = jnp.transpose(bias, (2, 0, 1))           # [H, N, N]
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * (head_dim ** -0.5) + bias[None]
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
            out = out.reshape(b, n, c.hidden_size)
        else:
            # Non-causal full attention, fused (Pallas on TPU, XLA elsewhere)
            from ...ops.flash_attention import flash_attention

            out = flash_attention(q, k, v).reshape(b, n, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class ViTMlp(nn.Module):
    """``ln`` (scale, bias, eps): when given, the caller skipped its pre-MLP
    LayerNorm and this module folds it through the first GEMM(s)
    (layer_norm_into_dense) — param tree unchanged."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln=None):
        c = self.cfg
        if c.swiglu_ln:
            # EVA-02 sub-LN SwiGLU (TrV block): silu(w1 x) * (w2 x) -> LN ->
            # w3 (eva_clip_encoder.py loads this trunk; timm Eva "SwiGLU with
            # scale_mlp", checkpoint keys fc1_g/fc1_x/norm/fc2 or w1/w2/ffn_ln/w3)
            if ln is not None:
                s, b, eps = ln
                kg, bg = DenseParams(c.hidden_size, c.intermediate_size,
                                     name="w1")()
                ku, bu = DenseParams(c.hidden_size, c.intermediate_size,
                                     name="w2")()
                g = layer_norm_into_dense(x, s, b, kg, bg, eps=eps,
                                          compute_dtype=self.dtype)
                u = layer_norm_into_dense(x, s, b, ku, bu, eps=eps,
                                          compute_dtype=self.dtype)
            else:
                g = nn.Dense(c.intermediate_size, dtype=self.dtype, name="w1")(x)
                u = nn.Dense(c.intermediate_size, dtype=self.dtype, name="w2")(x)
            h = nn.silu(g) * u
            h = StreamLayerNorm(epsilon=c.ln_eps, name="ffn_ln")(h)
            return nn.Dense(c.hidden_size, dtype=self.dtype, name="w3")(h)
        if c.swiglu:
            # DINOv2 SwiGLUFFN: weights_in -> split -> silu(x1)*x2 -> weights_out
            if ln is not None:
                s, b, eps = ln
                kin, bin_ = DenseParams(c.hidden_size, 2 * c.intermediate_size,
                                        name="weights_in")()
                h = layer_norm_into_dense(x, s, b, kin, bin_, eps=eps,
                                          compute_dtype=self.dtype)
            else:
                h = nn.Dense(2 * c.intermediate_size, dtype=self.dtype,
                             name="weights_in")(x)
            x1, x2 = jnp.split(h, 2, axis=-1)
            h = nn.silu(x1) * x2
            return nn.Dense(c.hidden_size, dtype=self.dtype, name="weights_out")(h)
        if ln is not None:
            s, b, eps = ln
            k1, b1 = DenseParams(c.hidden_size, c.intermediate_size,
                                 name="fc1")()
            h = layer_norm_into_dense(x, s, b, k1, b1, eps=eps,
                                      compute_dtype=self.dtype)
        else:
            h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = _activation(c.act)(h)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None, rel_pos_index=None):
        c = self.cfg
        h = StreamLayerNorm(epsilon=c.ln_eps, name="norm1")(x)
        h = ViTAttention(c, dtype=self.dtype, name="attn")(
            h, rope=rope, rel_pos_index=rel_pos_index)
        if c.layer_scale:
            g1 = self.param("ls1_gamma", nn.initializers.ones, (c.hidden_size,), jnp.float32)
            h = h * g1.astype(h.dtype)
        x = x + h
        if _ln_into_gemm_vit():
            s2, b2 = LayerNormParams(c.hidden_size, name="norm2")()
            h = ViTMlp(c, dtype=self.dtype, name="mlp")(
                x, ln=(s2, b2, c.ln_eps))
        else:
            h = StreamLayerNorm(epsilon=c.ln_eps, name="norm2")(x)
            h = ViTMlp(c, dtype=self.dtype, name="mlp")(h)
        if c.layer_scale:
            g2 = self.param("ls2_gamma", nn.initializers.ones, (c.hidden_size,), jnp.float32)
            h = h * g2.astype(h.dtype)
        return x + h


class VisionTransformer(nn.Module):
    """Returns token features [B, N(+prefix), C] at the configured tap depth.

    Input pixels are NCHW float (matching the host pipeline); converted to
    NHWC internally for the TPU-friendly conv layout.
    """

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b = pixels.shape[0]
        x = jnp.transpose(pixels.astype(self.dtype), (0, 2, 3, 1))  # NCHW -> NHWC
        x = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            use_bias=c.patch_bias,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, -1, c.hidden_size)
        n_patches = x.shape[1]

        prefix = []
        if c.class_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.hidden_size),
                             jnp.float32)
            prefix.append(jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.hidden_size)))
        if c.num_register_tokens:
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, c.num_register_tokens, c.hidden_size), jnp.float32)
            prefix.append(jnp.broadcast_to(reg.astype(x.dtype),
                                           (b, c.num_register_tokens, c.hidden_size)))

        if c.abs_pos_embed:
            pos = self.param(
                "pos_embed", nn.initializers.zeros,
                ((1 if c.class_token else 0) + n_patches, c.hidden_size),
                jnp.float32,
            )
            if c.class_token:
                # pos embed covers [cls] + patches (CLIP/DINOv2 layout);
                # register tokens (if any) carry no positional term
                # (DINOv2-reg layout).
                cls_tok = prefix[0] + pos[:1].astype(x.dtype)
                x = x + pos[1:].astype(x.dtype)
                parts = [cls_tok] + prefix[1:] + [x]
                x = jnp.concatenate(parts, axis=1)
            else:
                x = x + pos.astype(x.dtype)
        elif prefix:
            x = jnp.concatenate(prefix + [x], axis=1)

        if c.pre_layernorm:
            x = StreamLayerNorm(epsilon=c.ln_eps, name="pre_layernorm")(x)

        side = c.grid_side
        rope = _rope_tables(side, c.hidden_size // c.num_heads,
                            c.rope_ref_side) if c.rope else None
        rel_index = beit_relative_position_index(side) if c.rel_pos_bias else None

        n_run = c.num_blocks_to_run
        for i in range(n_run):
            x = ViTBlock(c, dtype=self.dtype, name=f"blocks_{i}")(
                x, rope=rope, rel_pos_index=rel_index)

        if n_run == c.num_layers and c.final_layernorm:
            x = StreamLayerNorm(epsilon=c.ln_eps, name="final_layernorm")(x)

        if c.select_feature == "patch" and c.num_prefix_tokens:
            x = x[:, c.num_prefix_tokens:]
        return x


# ----- stock tower configs (public architecture hyperparameters) -----------

def clip_vit_l_336(select_layer: int = -2) -> ViTConfig:
    return ViTConfig(
        hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096,
        patch_size=14, image_size=336, class_token=True, pre_layernorm=True,
        final_layernorm=False, act="quick_gelu", patch_bias=False,
        select_layer=select_layer, ln_eps=1e-5,
    )


def siglip_so400m_384() -> ViTConfig:
    return ViTConfig(
        hidden_size=1152, num_layers=27, num_heads=16, intermediate_size=4304,
        patch_size=14, image_size=384, class_token=False, final_layernorm=True,
        act="gelu_tanh", select_layer=0, ln_eps=1e-6,
    )


def dinov2_giant(image_size: int = 378) -> ViTConfig:
    return ViTConfig(
        hidden_size=1536, num_layers=40, num_heads=24, intermediate_size=4096,
        patch_size=14, image_size=image_size, class_token=True,
        final_layernorm=True, act="gelu", swiglu=True, layer_scale=True,
        select_layer=0, ln_eps=1e-6,
    )


def tiny_vit(image_size: int = 32, **kwargs) -> ViTConfig:
    base = dict(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        patch_size=8, image_size=image_size,
    )
    base.update(kwargs)
    return ViTConfig(**base)
