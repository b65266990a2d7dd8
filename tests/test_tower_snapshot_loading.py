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
