"""SD-2.1 one-step-denoise tower: geometry, DDIM schedule math, converter
round-trip from fabricated diffusers-named checkpoints, registry dispatch.

No diffusers/torch oracle exists in this image for numerical parity; the
tests pin the reference's *documented* behaviors instead
(diffusion_encoder.py:140-260): scaled-linear betas, sqrt(acp)x+sqrt(1-acp)n
noising, 4 up-block taps concatenated to hidden 3520, 32x32 grid at 512.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.models.encoders import build_vision_tower
from cambrian_tpu.models.encoders.diffusion import (
    SDConfig,
    SDFeatureTower,
    add_noise,
    ddim_alphas_cumprod,
    tiny_sd,
)

RNG = np.random.default_rng(7)


def test_sd21_geometry():
    cfg = SDConfig()
    assert cfg.hidden_size == 3520           # 1280+1280+640+320
    assert cfg.grid_side == 32
    assert cfg.num_patches == 1024
    t = build_vision_tower("diffusion-sd21")
    assert t.hidden_size == 3520
    assert t.image_size == 512
    assert t.hf_repo == "stabilityai/stable-diffusion-2-1"
    # pixart name resolves to the same tower (pixart_alpha_encoder.py loads
    # the identical SD-2.1 pipeline)
    assert build_vision_tower("pixart-alpha").hidden_size == 3520


def test_ddim_schedule_matches_sd_config():
    """Scaled-linear schedule: beta[0]=0.00085, beta[-1]=0.012, and the
    add_noise combination preserves unit variance."""
    cfg = SDConfig()
    acp = ddim_alphas_cumprod(cfg)
    assert acp.shape == (1000,)
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)
    assert acp[-1] < 0.01                     # heavy noise at t=999
    assert 0.6 < acp[250] < 0.95              # the tower's working point (~0.674)
    x = RNG.standard_normal((4, 8, 8, 4)).astype(np.float32)
    n = RNG.standard_normal((4, 8, 8, 4)).astype(np.float32)
    noisy = add_noise(cfg, x, n, 250)
    np.testing.assert_allclose(
        noisy, np.sqrt(acp[250]) * x + np.sqrt(1 - acp[250]) * n, rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_tower():
    cfg = tiny_sd(image_size=64)
    mod = SDFeatureTower(cfg)
    params = mod.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 3, 64, 64)))["params"]
    return cfg, mod, params


def test_tiny_forward_shapes(tiny_tower):
    cfg, mod, params = tiny_tower
    px = jnp.asarray(RNG.standard_normal((2, 3, 64, 64)).astype(np.float32))
    out = mod.apply({"params": params}, px)
    assert out.shape == (2, cfg.num_patches, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_noise_rng_controls_features(tiny_tower):
    """The tower is a pure function: same rng -> same features, different
    rng -> different features (the reference redraws torch noise per call,
    diffusion_encoder.py:234)."""
    cfg, mod, params = tiny_tower
    px = jnp.asarray(RNG.standard_normal((1, 3, 64, 64)).astype(np.float32))
    a = mod.apply({"params": params}, px, noise_rng=jax.random.PRNGKey(1))
    b = mod.apply({"params": params}, px, noise_rng=jax.random.PRNGKey(1))
    c = mod.apply({"params": params}, px, noise_rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def _fab_dense(sd, key, dout, din, bias=True):
    sd[key + ".weight"] = RNG.standard_normal((dout, din)).astype(np.float32)
    if bias:
        sd[key + ".bias"] = RNG.standard_normal(dout).astype(np.float32)


def _fab_conv(sd, key, cout, cin, k=3):
    sd[key + ".weight"] = RNG.standard_normal((cout, cin, k, k)).astype(np.float32)
    sd[key + ".bias"] = RNG.standard_normal(cout).astype(np.float32)


def _fab_norm(sd, key, c):
    sd[key + ".weight"] = RNG.standard_normal(c).astype(np.float32)
    sd[key + ".bias"] = RNG.standard_normal(c).astype(np.float32)


def _fab_resnet(sd, p, cin, cout, temb=None):
    _fab_norm(sd, p + ".norm1", cin)
    _fab_conv(sd, p + ".conv1", cout, cin)
    if temb:
        _fab_dense(sd, p + ".time_emb_proj", cout, temb)
    _fab_norm(sd, p + ".norm2", cout)
    _fab_conv(sd, p + ".conv2", cout, cout)
    if cin != cout:
        _fab_conv(sd, p + ".conv_shortcut", cout, cin, k=1)


def _fab_transformer(sd, p, c, ctx):
    _fab_norm(sd, p + ".norm", c)
    _fab_dense(sd, p + ".proj_in", c, c)
    tp = p + ".transformer_blocks.0."
    for nm in ("norm1", "norm2", "norm3"):
        _fab_norm(sd, tp + nm, c)
    for a, kdim in (("attn1", c), ("attn2", ctx)):
        _fab_dense(sd, f"{tp}{a}.to_q", c, c, bias=False)
        _fab_dense(sd, f"{tp}{a}.to_k", c, kdim, bias=False)
        _fab_dense(sd, f"{tp}{a}.to_v", c, kdim, bias=False)
        _fab_dense(sd, f"{tp}{a}.to_out.0", c, c)
    _fab_dense(sd, tp + "ff.net.0.proj", 8 * c, c)
    _fab_dense(sd, tp + "ff.net.2", c, 4 * c)
    _fab_dense(sd, p + ".proj_out", c, c)


def test_sd_converter_roundtrip(tiny_tower):
    """A fabricated diffusers-named state dict converts to exactly the init
    param tree (names and shapes), and the converted tower runs."""
    from cambrian_tpu.checkpoint.hf_vision import convert_sd_tower

    cfg, mod, params = tiny_tower
    sd = {}
    # --- VAE encoder ---
    vc = cfg.vae_channels
    _fab_conv(sd, "vae.encoder.conv_in", vc[0], 3)
    prev = vc[0]
    for i, ch in enumerate(vc):
        for j in range(cfg.vae_layers_per_block):
            _fab_resnet(sd, f"vae.encoder.down_blocks.{i}.resnets.{j}",
                        prev if j == 0 else ch, ch)
        if i != len(vc) - 1:
            _fab_conv(sd, f"vae.encoder.down_blocks.{i}.downsamplers.0.conv",
                      ch, ch)
        prev = ch
    _fab_resnet(sd, "vae.encoder.mid_block.resnets.0", vc[-1], vc[-1])
    _fab_resnet(sd, "vae.encoder.mid_block.resnets.1", vc[-1], vc[-1])
    ap = "vae.encoder.mid_block.attentions.0"
    _fab_norm(sd, ap + ".group_norm", vc[-1])
    for nm in ("to_q", "to_k", "to_v"):
        _fab_dense(sd, f"{ap}.{nm}", vc[-1], vc[-1])
    _fab_dense(sd, ap + ".to_out.0", vc[-1], vc[-1])
    _fab_norm(sd, "vae.encoder.conv_norm_out", vc[-1])
    _fab_conv(sd, "vae.encoder.conv_out", 2 * cfg.latent_channels, vc[-1])
    _fab_conv(sd, "vae.quant_conv", 2 * cfg.latent_channels,
              2 * cfg.latent_channels, k=1)
    # --- UNet ---
    bc = cfg.block_out_channels
    ted = cfg.time_embed_dim
    _fab_conv(sd, "unet.conv_in", bc[0], cfg.latent_channels)
    _fab_dense(sd, "unet.time_embedding.linear_1", ted, bc[0])
    _fab_dense(sd, "unet.time_embedding.linear_2", ted, ted)
    n = len(bc)
    skip_ch = [bc[0]]
    prev = bc[0]
    for i, ch in enumerate(bc):
        for j in range(cfg.layers_per_block):
            _fab_resnet(sd, f"unet.down_blocks.{i}.resnets.{j}",
                        prev if j == 0 else ch, ch, temb=ted)
            if i < n - 1:
                _fab_transformer(sd, f"unet.down_blocks.{i}.attentions.{j}",
                                 ch, cfg.cross_attention_dim)
            skip_ch.append(ch)
        if i != n - 1:
            _fab_conv(sd, f"unet.down_blocks.{i}.downsamplers.0.conv", ch, ch)
            skip_ch.append(ch)
        prev = ch
    _fab_resnet(sd, "unet.mid_block.resnets.0", bc[-1], bc[-1], temb=ted)
    _fab_transformer(sd, "unet.mid_block.attentions.0", bc[-1],
                     cfg.cross_attention_dim)
    _fab_resnet(sd, "unet.mid_block.resnets.1", bc[-1], bc[-1], temb=ted)
    prev = bc[-1]
    for i, ch in enumerate(reversed(bc)):
        for j in range(cfg.layers_per_block + 1):
            _fab_resnet(sd, f"unet.up_blocks.{i}.resnets.{j}",
                        prev + skip_ch.pop(), ch, temb=ted)
            prev = ch
            if i > 0:
                _fab_transformer(sd, f"unet.up_blocks.{i}.attentions.{j}",
                                 ch, cfg.cross_attention_dim)
        if i != n - 1:
            _fab_conv(sd, f"unet.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    sd["empty_prompt_embeds"] = RNG.standard_normal(
        (77, cfg.cross_attention_dim)).astype(np.float32)

    converted = convert_sd_tower(sd, cfg)
    ref_shapes = jax.tree.map(lambda x: x.shape, params)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, converted)
    assert ref_shapes == got_shapes
    out = mod.apply({"params": jax.tree.map(jnp.asarray, converted)},
                    jnp.asarray(RNG.standard_normal((1, 3, 64, 64),
                                                    dtype=np.float32)))
    assert out.shape == (1, cfg.num_patches, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()
