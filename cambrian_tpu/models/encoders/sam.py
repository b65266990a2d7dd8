"""SAM ViT vision tower (reference sam_encoder.py + vendored sam/encoder.py,
~910 LoC): a plain-ViT trunk with window attention (global attention at a few
block indices), decomposed relative positional biases, and a conv neck to 256
channels. Matches the HF SamVisionEncoder architecture, so weights load from
facebook/sam-vit-{base,large,huge}.

Layout is NHWC end-to-end (grid kept 2-D through the blocks like the
original); windows are folded into the batch axis for attention.
"""

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...mm_utils import ImageProcessor
from ...ops.activations import gelu_exact
from .base import VisionTower, register_tower


@dataclass(frozen=True)
class SamViTConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 16
    image_size: int = 1024
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    output_channels: int = 256
    use_rel_pos: bool = True
    ln_eps: float = 1e-6

    @property
    def grid_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_side ** 2


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice/resize the relative position table to [q_size, k_size, dim]."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel = jax.image.resize(
            rel_pos.astype(jnp.float32),
            (max_rel_dist, rel_pos.shape[1]), method="linear",
        ).astype(rel_pos.dtype)
    else:
        rel = rel_pos
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel[relative.astype(jnp.int32)]


class SamAttention(nn.Module):
    cfg: SamViTConfig
    input_size: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):           # x: [B, H, W, C]
        c = self.cfg
        b, h, w, _ = x.shape
        head_dim = c.hidden_size // c.num_heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(3 * c.hidden_size, use_bias=True, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, c.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))      # [3, B, nH, HW, d]
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bnqd,bnkd->bnqk", q * scale, k,
                          preferred_element_type=jnp.float32)

        if c.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim), jnp.float32)
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim), jnp.float32)
            rh = _get_rel_pos(h, h, rel_pos_h).astype(jnp.float32)
            rw = _get_rel_pos(w, w, rel_pos_w).astype(jnp.float32)
            r_q = q.reshape(b, c.num_heads, h, w, head_dim).astype(jnp.float32)
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, rh)
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, rw)
            attn = attn.reshape(b, c.num_heads, h, w, h, w)
            attn = attn + rel_h[:, :, :, :, :, None] + rel_w[:, :, :, :, None, :]
            attn = attn.reshape(b, c.num_heads, h * w, h * w)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, h, w, c.hidden_size)
        return nn.Dense(c.hidden_size, use_bias=True, dtype=self.dtype,
                        name="proj")(out)


def window_partition(x, window):
    """[B,H,W,C] -> [B*nw, win, win, C] with bottom/right padding."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(windows, window, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SamBlock(nn.Module):
    cfg: SamViTConfig
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        shortcut = x
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=self.dtype, name="norm1")(x)
        h, w = x.shape[1], x.shape[2]
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
        input_size = ((self.window_size, self.window_size)
                      if self.window_size > 0 else (c.grid_side, c.grid_side))
        x = SamAttention(c, input_size=input_size, dtype=self.dtype, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c.hidden_size * c.mlp_ratio), dtype=self.dtype,
                     name="mlp_lin1")(y)
        y = gelu_exact(y)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="mlp_lin2")(y)
        return x + y


class ChannelLayerNorm(nn.Module):
    """SAM's LayerNorm2d over the channel axis, NHWC layout."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * weight + bias
        return y.astype(x.dtype)


class SamViT(nn.Module):
    """Trunk + neck; returns tokens [B, grid^2, output_channels]."""

    cfg: SamViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):       # NCHW
        c = self.cfg
        x = jnp.transpose(pixels.astype(self.dtype), (0, 2, 3, 1))
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, c.grid_side, c.grid_side, c.hidden_size), jnp.float32)
        x = x + pos.astype(x.dtype)
        for i in range(c.num_layers):
            window = 0 if i in c.global_attn_indexes else c.window_size
            x = SamBlock(c, window_size=window, dtype=self.dtype,
                         name=f"blocks_{i}")(x)
        x = nn.Conv(c.output_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = ChannelLayerNorm(c.ln_eps, name="neck_ln1")(x)
        x = nn.Conv(c.output_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = ChannelLayerNorm(c.ln_eps, name="neck_ln2")(x)
        b = x.shape[0]
        return x.reshape(b, -1, c.output_channels)


SAM_MODEL_CONFIGS = {
    "sam_vit_b": SamViTConfig(hidden_size=768, num_layers=12, num_heads=12,
                              global_attn_indexes=(2, 5, 8, 11)),
    "sam_vit_l": SamViTConfig(hidden_size=1024, num_layers=24, num_heads=16,
                              global_attn_indexes=(5, 11, 17, 23)),
    "sam_vit_h": SamViTConfig(hidden_size=1280, num_layers=32, num_heads=16,
                              global_attn_indexes=(7, 15, 23, 31)),
}

_SAM_REPOS = {
    "sam_vit_b": "facebook/sam-vit-base",
    "sam_vit_l": "facebook/sam-vit-large",
    "sam_vit_h": "facebook/sam-vit-huge",
}


class SamImageProcessor(ImageProcessor):
    """Longest-side resize + bottom/right zero-pad (reference
    sam_encoder.py:19-51), 0-255-scale normalization."""

    def __init__(self, size=1024):
        super().__init__(size=size, image_mean=(0.485, 0.456, 0.406),
                         image_std=(0.229, 0.224, 0.225), resample="bilinear",
                         rescale_factor=1.0)
        self._mean255 = np.asarray([123.675, 116.28, 103.53], np.float32)
        self._std255 = np.asarray([58.395, 57.12, 57.375], np.float32)

    def preprocess(self, pil_img, return_tensors: Optional[str] = None):
        pil_img = pil_img.convert("RGB")
        w, h = pil_img.size
        scale = self.size / max(w, h)
        new_w, new_h = int(w * scale + 0.5), int(h * scale + 0.5)
        pil_img = pil_img.resize((new_w, new_h), 2)
        arr = np.asarray(pil_img, dtype=np.float32)
        arr = (arr - self._mean255) / self._std255
        out = np.zeros((self.size, self.size, 3), np.float32)
        out[:new_h, :new_w] = arr
        return {"pixel_values": out.transpose(2, 0, 1)[None]}


@register_tower("sam")
def _build_sam(name, res, interp, dtype):
    key = "sam_vit_h" if "vit_h" in name or "vit-h" in name else \
        "sam_vit_l" if "vit_l" in name or "vit-l" in name else "sam_vit_b"
    cfg = SAM_MODEL_CONFIGS[key]
    if res is not None and res != cfg.image_size:
        cfg = SamViTConfig(**{**cfg.__dict__, "image_size": res})
    module = SamViT(cfg, dtype=dtype)
    return VisionTower(
        name=name, module=module, config=cfg,
        hidden_size=cfg.output_channels, image_size=cfg.image_size,
        interp_size=interp,
        image_processor=SamImageProcessor(size=cfg.image_size),
        hf_repo=_SAM_REPOS[key],
    )


def convert_sam_vision(sd, cfg: SamViTConfig) -> dict:
    """HF SamVisionEncoder (vision_encoder.*) -> SamViT params."""
    p = "vision_encoder."
    if not any(k.startswith(p) for k in sd):
        p = ""

    def conv_k(w):
        return np.transpose(w, (2, 3, 1, 0))

    params = {
        "patch_embed": {
            "kernel": conv_k(sd[p + "patch_embed.projection.weight"]),
            "bias": sd[p + "patch_embed.projection.bias"],
        },
        "pos_embed": sd[p + "pos_embed"],
        "neck_conv1": {"kernel": conv_k(sd[p + "neck.conv1.weight"])},
        "neck_ln1": {"weight": sd[p + "neck.layer_norm1.weight"],
                     "bias": sd[p + "neck.layer_norm1.bias"]},
        "neck_conv2": {"kernel": conv_k(sd[p + "neck.conv2.weight"])},
        "neck_ln2": {"weight": sd[p + "neck.layer_norm2.weight"],
                     "bias": sd[p + "neck.layer_norm2.bias"]},
    }
    for i in range(cfg.num_layers):
        lp = f"{p}layers.{i}."
        block = {
            "norm1": {"scale": sd[lp + "layer_norm1.weight"],
                      "bias": sd[lp + "layer_norm1.bias"]},
            "norm2": {"scale": sd[lp + "layer_norm2.weight"],
                      "bias": sd[lp + "layer_norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[lp + "attn.qkv.weight"].T,
                        "bias": sd[lp + "attn.qkv.bias"]},
                "proj": {"kernel": sd[lp + "attn.proj.weight"].T,
                         "bias": sd[lp + "attn.proj.bias"]},
            },
            "mlp_lin1": {"kernel": sd[lp + "mlp.lin1.weight"].T,
                         "bias": sd[lp + "mlp.lin1.bias"]},
            "mlp_lin2": {"kernel": sd[lp + "mlp.lin2.weight"].T,
                         "bias": sd[lp + "mlp.lin2.bias"]},
        }
        if cfg.use_rel_pos:
            block["attn"]["rel_pos_h"] = sd[lp + "attn.rel_pos_h"]
            block["attn"]["rel_pos_w"] = sd[lp + "attn.rel_pos_w"]
        params[f"blocks_{i}"] = block
    return params
