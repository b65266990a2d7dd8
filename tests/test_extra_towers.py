"""Long-tail tower tests: SAM parity vs HF SamVisionEncoder, registry
geometry for the research towers, hybrid concat tower."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cambrian_tpu.models.encoders import build_vision_tower
from cambrian_tpu.models.encoders.sam import (
    SamViT,
    SamViTConfig,
    convert_sam_vision,
)

RNG = np.random.default_rng(21)


def test_sam_parity_vs_hf():
    from transformers import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    hf_cfg = SamVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        image_size=32, patch_size=8, window_size=2, global_attn_indexes=[1],
        output_channels=16, use_rel_pos=True, mlp_ratio=2.0,
        layer_norm_eps=1e-6,
    )
    hf = SamVisionEncoder(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = SamViTConfig(hidden_size=32, num_layers=2, num_heads=4, mlp_ratio=2.0,
                       patch_size=8, image_size=32, window_size=2,
                       global_attn_indexes=(1,), output_channels=16)
    mod = SamViT(cfg)
    params = jax.tree.map(jnp.asarray, convert_sam_vision(sd, cfg))

    px = RNG.standard_normal((2, 3, 32, 32), dtype=np.float32)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(px)))
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).last_hidden_state.numpy()  # [B,C,H,W]?
    # HF returns [B, output_channels? , H, W] in NCHW after the neck
    if ref.ndim == 4:
        b, c, h, w = ref.shape if ref.shape[1] == 16 else (None,) * 4
        if c == 16:
            ref = ref.transpose(0, 2, 3, 1).reshape(2, -1, 16)
        else:  # NHWC already
            ref = ref.reshape(2, -1, 16)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_sam_tower_registry():
    t = build_vision_tower("sam_vit_l-res1024-interp576")
    assert t.hidden_size == 256
    assert t.num_patches == 576
    assert t.image_size == 1024


def test_sam_processor_pads_longest_side():
    from PIL import Image

    from cambrian_tpu.models.encoders.sam import SamImageProcessor

    proc = SamImageProcessor(size=64)
    img = Image.new("RGB", (100, 50), (255, 255, 255))
    out = proc.preprocess(img)["pixel_values"][0]
    assert out.shape == (3, 64, 64)
    # bottom half is zero padding
    assert np.abs(out[:, 40:, :]).sum() == 0
    assert np.abs(out[:, :30, :]).sum() > 0


@pytest.mark.parametrize("name,hidden", [
    ("mae-vit-l-16-interp576", 1024),
    ("ijepa-vit-h-14-interp576", 1280),
    ("moco-vit-b-16-interp144", 768),
    ("supervised-vit-l-16-interp576", 1024),
    ("dfn-clip-vit-h-14-res224-interp256", 1280),
    ("eva-clip-g-14-res224-interp256", 1408),
])
def test_research_tower_registry(name, hidden):
    t = build_vision_tower(name)
    assert t.hidden_size == hidden, name


def test_research_tower_forward_tiny():
    """One real forward through a small research tower configuration."""
    from cambrian_tpu.models.encoders.extra import _plain_vit, _vit_tower
    from cambrian_tpu.mm_utils import IMAGENET_MEAN, IMAGENET_STD
    from cambrian_tpu.models.encoders.vit import ViTConfig

    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, patch_size=8, image_size=32,
                    class_token=False, final_layernorm=True, select_layer=0)
    t = _vit_tower("tiny-ijepa", cfg, None, 16, jnp.float32,
                   IMAGENET_MEAN, IMAGENET_STD)
    params = t.init(jax.random.PRNGKey(0))
    out = t.apply(params, jnp.zeros((1, 3, 32, 32)))
    assert out.shape == (1, 16, 32)


def test_hybrid_tower():
    t = build_vision_tower("hybridmodel-debug-tower-0-&&&-debug-tower-1-interp16")
    assert t.hidden_size == 64  # 32 + 32
    params = t.init(jax.random.PRNGKey(0))
    px = jnp.zeros((2, 3, t.image_size, t.image_size))
    out = t.apply(params, px)
    assert out.shape == (2, 16, 64)


def test_unavailable_towers_raise_helpfully():
    for name in ["midas-vit-l-16", "diffusion-sd15", "pixart-alpha"]:
        with pytest.raises(NotImplementedError):
            build_vision_tower(name)
