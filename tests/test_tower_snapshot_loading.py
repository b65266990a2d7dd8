"""Tower weight loading from local HF snapshots (zero-egress path):
CAMBRIAN_TOWER_CACHE resolution + converter dispatch in load_tower_params."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cambrian_tpu.models.builder import _tower_snapshot_dir, load_tower_params
from cambrian_tpu.models.encoders.base import VisionTower
from cambrian_tpu.models.encoders.vit import ViTConfig, VisionTransformer
from cambrian_tpu.mm_utils import ImageProcessor


@pytest.fixture()
def fake_snapshot(tmp_path, monkeypatch):
    from safetensors.torch import save_file
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=28, patch_size=14,
        hidden_act="quick_gelu",
    )).eval()
    repo = "fake-org/tiny-clip"
    snap = tmp_path / repo.replace("/", "--")
    snap.mkdir(parents=True)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(snap / "model.safetensors"))
    monkeypatch.setenv("CAMBRIAN_TOWER_CACHE", str(tmp_path))
    return hf, repo


def _tiny_clip_tower(repo):
    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, patch_size=14, image_size=28,
                    class_token=True, pre_layernorm=True, final_layernorm=False,
                    act="quick_gelu", patch_bias=False, select_layer=-2)
    return VisionTower(
        name="fake-org/tiny-clip-interp4", module=VisionTransformer(cfg),
        config=cfg, hidden_size=32, image_size=28, interp_size=4,
        image_processor=ImageProcessor(size=28), hf_repo=repo,
    )


def test_snapshot_resolution(fake_snapshot):
    hf, repo = fake_snapshot
    tower = _tiny_clip_tower(repo)
    assert _tower_snapshot_dir(tower) is not None


def test_load_tower_params_from_snapshot(fake_snapshot):
    hf, repo = fake_snapshot
    tower = _tiny_clip_tower(repo)
    params = load_tower_params(tower)

    px = np.random.default_rng(0).standard_normal((1, 3, 28, 28),
                                                  dtype=np.float32)
    ours = np.asarray(tower.apply(params, jnp.asarray(px)))
    with torch.no_grad():
        hs = hf(torch.from_numpy(px), output_hidden_states=True).hidden_states
        ref = hs[-2][:, 1:].numpy()  # pre-interp features
    # tower applies fp32 token interpolation to interp_size=4
    from cambrian_tpu.ops.resize import interpolate_tokens

    ref_interp = np.asarray(interpolate_tokens(jnp.asarray(ref), 4))
    np.testing.assert_allclose(ours, ref_interp, rtol=1e-4, atol=1e-5)


def test_missing_snapshot_warns_and_inits(monkeypatch, tmp_path):
    monkeypatch.setenv("CAMBRIAN_TOWER_CACHE", str(tmp_path))
    tower = _tiny_clip_tower("fake-org/absent-model")
    with pytest.warns(UserWarning, match="RANDOM weights"):
        params = load_tower_params(tower)
    assert params is not None


def test_load_midas_from_snapshot(tmp_path, monkeypatch):
    """'midas' names dispatch to convert_dpt_vit and produce parity with the
    HF DPT backbone tap (midas_encoder.py:94-102)."""
    from safetensors.torch import save_file
    from transformers import DPTConfig, DPTForDepthEstimation

    hf = DPTForDepthEstimation(DPTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16,
        neck_hidden_sizes=[16, 16, 16, 16], fusion_hidden_size=16)).eval()
    repo = "fake-org/tiny-midas"
    snap = tmp_path / repo.replace("/", "--")
    snap.mkdir(parents=True)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(snap / "model.safetensors"))
    monkeypatch.setenv("CAMBRIAN_TOWER_CACHE", str(tmp_path))

    from cambrian_tpu.models.encoders.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, patch_size=16, image_size=32,
                    class_token=True, final_layernorm=False, act="gelu",
                    select_layer=-1, ln_eps=1e-12)
    tower = VisionTower(
        name="large-midas-interp4", module=VisionTransformer(cfg), config=cfg,
        hidden_size=32, image_size=32, interp_size=None,
        image_processor=ImageProcessor(size=32), hf_repo=repo)

    params = load_tower_params(tower)
    px = np.random.default_rng(0).standard_normal((1, 3, 32, 32)).astype(np.float32)
    ours = np.asarray(tower.apply(params, jnp.asarray(px)))
    with torch.no_grad():
        ref = hf.dpt(torch.from_numpy(px), output_hidden_states=True,
                     return_dict=True).hidden_states[-1].numpy()[:, 1:]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_load_diffusion_from_snapshot(tmp_path, monkeypatch):
    """'diffusion' names dispatch to convert_sd_tower; a fabricated
    diffusers-named snapshot loads into the tiny SD tower and runs."""
    from safetensors.numpy import save_file

    from cambrian_tpu.models.encoders import build_vision_tower
    from tests.test_diffusion_tower import (
        _fab_conv,
        _fab_dense,
        _fab_norm,
        _fab_resnet,
        _fab_transformer,
    )

    t = build_vision_tower("diffusion-tiny-interp4")
    cfg = t.config
    sd = {}
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

    repo = t.hf_repo
    snap = tmp_path / repo.replace("/", "--")
    snap.mkdir(parents=True)
    save_file(sd, str(snap / "model.safetensors"))
    monkeypatch.setenv("CAMBRIAN_TOWER_CACHE", str(tmp_path))

    params = load_tower_params(t)
    out = t.apply(params, jnp.zeros((1, 3, t.image_size, t.image_size)))
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()
