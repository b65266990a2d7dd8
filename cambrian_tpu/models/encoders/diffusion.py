"""Stable-Diffusion-2.1 one-step-denoise feature tower.

Re-implements the reference's DiffusionVisionTower
(diffusion_encoder.py:14-260; pixart_alpha_encoder.py is the same tower —
it imports PixArtAlphaPipeline but never uses it and also loads
stabilityai/stable-diffusion-2-1): VAE-encode the image to 4x64x64 latents,
add DDIM noise at a fixed timestep (t=250), run the SD-2.1 UNet conditioned
on an empty-prompt embedding, tap the output of every up block
(up_ft_indices=[0,1,2,3]), bilinearly resize each map to the 32x32 token
grid and concatenate channels -> [B, 1024, 3520].

TPU-first design notes:
- NHWC layout throughout (conv-friendly on the MXU); tokens reshaped at the
  boundary.
- GroupNorm statistics in fp32, compute dtype bf16 (numerics discipline).
- Spatial self-attention uses the fused flash kernel; cross-attention over
  the 77-token context is a plain batched GEMM pair.
- The empty-prompt embedding is a tower parameter ([77, 1024]), converted
  once from the SD text encoder offline — running a full text encoder per
  forward to embed a constant string (what the reference effectively
  caches, diffusion_encoder.py:237-243) has no place in the compiled graph.
- The reference draws fresh torch noise every call (non-deterministic
  features); here noise comes from a fixed fold-in of a config seed so the
  tower is a pure function — pass ``noise_rng`` to apply for stochastic
  features.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class SDConfig:
    """Geometry of stabilityai/stable-diffusion-2-1 (UNet + VAE encoder)."""

    image_size: int = 512
    patch_size: int = 16                       # output grid = image/patch
    # VAE encoder
    vae_channels: Tuple[int, ...] = (128, 256, 512, 512)
    vae_layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    # UNet
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_heads: Tuple[int, ...] = (5, 10, 20, 20)   # head_dim 64 everywhere
    cross_attention_dim: int = 1024
    norm_groups: int = 32
    time_embed_dim: int = 1280                 # 4 * block_out_channels[0]
    # DDIM (scaled-linear betas, SD scheduler config)
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    time_step: int = 250
    up_ft_indices: Tuple[int, ...] = (0, 1, 2, 3)
    noise_seed: int = 0
    ln_eps: float = 1e-5
    gn_eps: float = 1e-6                       # VAE GroupNorm eps
    unet_gn_eps: float = 1e-5

    @property
    def hidden_size(self) -> int:
        rev = tuple(reversed(self.block_out_channels))
        return sum(rev[i] for i in self.up_ft_indices)

    @property
    def grid_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_side ** 2


def tiny_sd(image_size: int = 64) -> SDConfig:
    """Small geometry for tests: same topology, tiny widths. The latent grid
    must survive the UNet's 3 halvings, so image_size >= 64 (latent 8)."""
    return SDConfig(
        image_size=image_size, patch_size=16,
        vae_channels=(8, 8, 16, 16), latent_channels=4,
        block_out_channels=(8, 16, 16, 16), layers_per_block=1,
        num_heads=(1, 2, 2, 2), cross_attention_dim=16,
        norm_groups=4, time_embed_dim=32,
    )


def ddim_alphas_cumprod(cfg: SDConfig) -> np.ndarray:
    """SD scheduler's scaled-linear schedule: betas linear in sqrt space."""
    betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                        cfg.num_train_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def add_noise(cfg: SDConfig, latents, noise, t: int):
    """scheduler.add_noise (diffusion_encoder.py:150-151)."""
    acp = ddim_alphas_cumprod(cfg)[t]
    return (np.sqrt(acp).astype(np.float32) * latents
            + np.sqrt(1.0 - acp).astype(np.float32) * noise)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics regardless of compute dtype."""

    groups: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        out = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                           dtype=jnp.float32, name="gn")(x.astype(jnp.float32))
        return out.astype(dt)


class ResnetBlock(nn.Module):
    out_ch: int
    cfg: SDConfig
    use_temb: bool = True
    gn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        h = GroupNorm32(self.cfg.norm_groups, self.gn_eps, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_ch, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm32(self.cfg.norm_groups, self.gn_eps, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention in the VAE mid block."""

    cfg: SDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = GroupNorm32(self.cfg.norm_groups, self.cfg.gn_eps,
                        name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * (c ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    """AutoencoderKL encoder + quant_conv; returns the latent mode
    (latent_dist.mode() = mean channels, diffusion_encoder.py:147)."""

    cfg: SDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels_nchw):
        c = self.cfg
        x = jnp.transpose(pixels_nchw.astype(self.dtype), (0, 2, 3, 1))
        x = nn.Conv(c.vae_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(c.vae_channels):
            for j in range(c.vae_layers_per_block):
                x = ResnetBlock(ch, c, use_temb=False, gn_eps=c.gn_eps,
                                dtype=self.dtype,
                                name=f"down_{i}_resnet_{j}")(x)
            if i != len(c.vae_channels) - 1:
                # diffusers pads (0,1,0,1) then convs stride 2 VALID
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)
        x = ResnetBlock(c.vae_channels[-1], c, use_temb=False, gn_eps=c.gn_eps,
                        dtype=self.dtype, name="mid_resnet_0")(x)
        x = VAEAttnBlock(c, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(c.vae_channels[-1], c, use_temb=False, gn_eps=c.gn_eps,
                        dtype=self.dtype, name="mid_resnet_1")(x)
        x = GroupNorm32(c.norm_groups, c.gn_eps, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(x)
        x = nn.Conv(2 * c.latent_channels, (1, 1), dtype=self.dtype,
                    name="quant_conv")(x)
        mean = x[..., :c.latent_channels]
        return mean


class TransformerBlock(nn.Module):
    """diffusers BasicTransformerBlock: self-attn, cross-attn, GEGLU FF."""

    heads: int
    cfg: SDConfig
    dtype: jnp.dtype = jnp.float32

    def _attn(self, x, context, heads, name):
        c = x.shape[-1]
        head_dim = c // heads
        q = nn.Dense(c, use_bias=False, dtype=self.dtype,
                     name=f"{name}_to_q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype,
                     name=f"{name}_to_k")(context)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype,
                     name=f"{name}_to_v")(context)
        b, nq, _ = q.shape
        nk = k.shape[1]
        q = q.reshape(b, nq, heads, head_dim)
        k = k.reshape(b, nk, heads, head_dim)
        v = v.reshape(b, nk, heads, head_dim)
        if context is x and nq >= 128:
            from ...ops.flash_attention import flash_attention

            out = flash_attention(q, k, v)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits * (head_dim ** -0.5), axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        out = out.reshape(b, nq, c)
        return nn.Dense(c, dtype=self.dtype, name=f"{name}_to_out")(out)

    @nn.compact
    def __call__(self, x, context):
        from ...ops.norms import StreamLayerNorm

        c = self.cfg
        h = StreamLayerNorm(epsilon=c.ln_eps, name="norm1")(x)
        x = x + self._attn(h, h, self.heads, "attn1")
        h = StreamLayerNorm(epsilon=c.ln_eps, name="norm2")(x)
        x = x + self._attn(h, context, self.heads, "attn2")
        h = StreamLayerNorm(epsilon=c.ln_eps, name="norm3")(x)
        dim = x.shape[-1]
        g = nn.Dense(8 * dim, dtype=self.dtype, name="ff_geglu")(h)
        u, gate = jnp.split(g, 2, axis=-1)
        h = u * nn.gelu(gate, approximate=False)
        return x + nn.Dense(dim, dtype=self.dtype, name="ff_out")(h)


class SpatialTransformer(nn.Module):
    """Transformer2DModel with use_linear_projection=True (SD-2.x)."""

    heads: int
    cfg: SDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        # diffusers Transformer2DModel hardcodes GroupNorm eps=1e-6
        x = GroupNorm32(self.cfg.norm_groups, 1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        x = TransformerBlock(self.heads, self.cfg, dtype=self.dtype,
                             name="block_0")(x, context)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return res + x.reshape(b, h, w, c)


def timestep_embedding(t, dim: int):
    """diffusers get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0 (UNet2DConditionModel defaults)."""
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float64) / half
    freqs = jnp.asarray(np.exp(exponent), jnp.float32)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class SDUNet(nn.Module):
    """SD-2.1 UNet2DConditionModel with the reference's up_ft tap
    (diffusion_encoder.py:93-133): returns the output feature map of each up
    block listed in cfg.up_ft_indices (NHWC)."""

    cfg: SDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, t, context):
        c = self.cfg
        x = latents
        b = x.shape[0]
        temb = timestep_embedding(jnp.full((b,), t, jnp.int32),
                                  c.block_out_channels[0])
        temb = nn.Dense(c.time_embed_dim, dtype=self.dtype,
                        name="time_linear_1")(temb.astype(self.dtype))
        temb = nn.Dense(c.time_embed_dim, dtype=self.dtype,
                        name="time_linear_2")(nn.silu(temb))

        x = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        skips = [x]
        n_blocks = len(c.block_out_channels)
        for i, ch in enumerate(c.block_out_channels):
            cross = i < n_blocks - 1          # last down block has no attn
            for j in range(c.layers_per_block):
                x = ResnetBlock(ch, c, gn_eps=c.unet_gn_eps, dtype=self.dtype,
                                name=f"down_{i}_resnet_{j}")(x, temb)
                if cross:
                    x = SpatialTransformer(c.num_heads[i], c, dtype=self.dtype,
                                           name=f"down_{i}_attn_{j}")(x, context)
                skips.append(x)
            if i != n_blocks - 1:
                x = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)
                skips.append(x)

        ch = c.block_out_channels[-1]
        x = ResnetBlock(ch, c, gn_eps=c.unet_gn_eps, dtype=self.dtype,
                        name="mid_resnet_0")(x, temb)
        x = SpatialTransformer(c.num_heads[-1], c, dtype=self.dtype,
                               name="mid_attn")(x, context)
        x = ResnetBlock(ch, c, gn_eps=c.unet_gn_eps, dtype=self.dtype,
                        name="mid_resnet_1")(x, temb)

        up_ft = {}
        rev = list(reversed(c.block_out_channels))
        for i, ch in enumerate(rev):
            cross = i > 0                     # first up block has no attn
            for j in range(c.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock(ch, c, gn_eps=c.unet_gn_eps, dtype=self.dtype,
                                name=f"up_{i}_resnet_{j}")(x, temb)
                if cross:
                    x = SpatialTransformer(c.num_heads[n_blocks - 1 - i], c,
                                           dtype=self.dtype,
                                           name=f"up_{i}_attn_{j}")(x, context)
            if i != n_blocks - 1:
                bh, hh, wh, cc = x.shape
                x = jax.image.resize(x, (bh, 2 * hh, 2 * wh, cc), "nearest")
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)
            if i in c.up_ft_indices:
                up_ft[i] = x
        return up_ft


class SDFeatureTower(nn.Module):
    """Full one-step-denoise tower: pixels -> [B, grid^2, hidden_size].

    Matches DiffusionVisionTower.extract_features (output="dense",
    diffusion_encoder.py:222-262): per-tap bilinear resize (align_corners
    False) to the token grid, channel concat, row-major token order.
    """

    cfg: SDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels_nchw, noise_rng: Optional[jax.Array] = None):
        c = self.cfg
        latents = VAEEncoder(c, dtype=self.dtype, name="vae")(pixels_nchw)
        latents = (c.scaling_factor * latents.astype(jnp.float32))
        if noise_rng is None:
            noise_rng = jax.random.PRNGKey(c.noise_seed)
        noise = jax.random.normal(noise_rng, latents.shape, jnp.float32)
        acp = float(ddim_alphas_cumprod(c)[c.time_step])
        noisy = (np.sqrt(acp) * latents + np.sqrt(1 - acp) * noise)
        context = self.param(
            "empty_prompt_embeds", nn.initializers.zeros,
            (77, c.cross_attention_dim), jnp.float32)
        context = jnp.broadcast_to(
            context[None].astype(self.dtype),
            (latents.shape[0], 77, c.cross_attention_dim))
        up_ft = SDUNet(c, dtype=self.dtype, name="unet")(
            noisy.astype(self.dtype), c.time_step, context)

        from ...ops.resize import resize_bilinear

        side = c.grid_side
        feats = []
        for i in sorted(up_ft):
            f = up_ft[i]
            if f.shape[1] != side:
                f = resize_bilinear(f, side, side)
            feats.append(f.reshape(f.shape[0], side * side, f.shape[-1]))
        return jnp.concatenate(feats, axis=-1)
