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
    ("eva/CLIP-ViT-L-336-interp576", 1024),
    ("timm/eva02_large_patch14_clip_224.merged2b_s4b_b131k-interp256", 1024),
    ("large-midas-interp576", 1024),
    ("large-beit-midas-512-interp576", 1024),
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
    with pytest.raises(NotImplementedError):
        build_vision_tower("hybrid-midas")


# ---------------------------------------------------------------------------
# MiDaS (DPT) parity vs HF (midas_encoder.py:94-102: hidden_states[-1], cls
# dropped, no final LN)
# ---------------------------------------------------------------------------


def _vit_cfg(**kw):
    from cambrian_tpu.models.encoders.vit import ViTConfig

    base = dict(hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, patch_size=8, image_size=32,
                class_token=True, final_layernorm=False, act="gelu",
                select_layer=-1, ln_eps=1e-12)
    base.update(kw)
    return ViTConfig(**base)


def test_midas_dpt_parity_vs_hf():
    from transformers import DPTConfig, DPTForDepthEstimation

    from cambrian_tpu.checkpoint.hf_vision import convert_dpt_vit
    from cambrian_tpu.models.encoders.vit import VisionTransformer

    hf_cfg = DPTConfig(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       image_size=32, patch_size=8,
                       neck_hidden_sizes=[16, 16, 16, 16],
                       fusion_hidden_size=16)
    hf = DPTForDepthEstimation(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = _vit_cfg()
    mod = VisionTransformer(cfg)
    params = jax.tree.map(jnp.asarray, convert_dpt_vit(sd, cfg))

    px = RNG.standard_normal((2, 3, 32, 32), dtype=np.float32)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(px)))
    with torch.no_grad():
        ref = hf.dpt(torch.from_numpy(px), output_hidden_states=True,
                     return_dict=True).hidden_states[-1].numpy()[:, 1:]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_midas_beit_parity_vs_hf():
    """BEiT layout: per-layer relative position bias, LayerScale lambdas,
    key without bias, no absolute position embeddings."""
    from transformers import BeitConfig, BeitModel

    from cambrian_tpu.checkpoint.hf_vision import convert_dpt_vit
    from cambrian_tpu.models.encoders.vit import VisionTransformer

    hf_cfg = BeitConfig(hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        image_size=32, patch_size=8,
                        use_relative_position_bias=True,
                        layer_scale_init_value=0.1,
                        use_absolute_position_embeddings=False,
                        use_mean_pooling=False)
    hf = BeitModel(hf_cfg, add_pooling_layer=False).eval()
    # randomize the rel-pos tables (init is zeros, which would hide bugs)
    with torch.no_grad():
        for layer in hf.encoder.layer:
            layer.attention.attention.relative_position_bias.\
                relative_position_bias_table.normal_(0, 0.5)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = _vit_cfg(k_bias=False, abs_pos_embed=False, rel_pos_bias=True,
                   layer_scale=True)
    mod = VisionTransformer(cfg)
    params = jax.tree.map(jnp.asarray, convert_dpt_vit(sd, cfg))

    px = RNG.standard_normal((2, 3, 32, 32), dtype=np.float32)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(px)))
    with torch.no_grad():
        ref = hf(torch.from_numpy(px), output_hidden_states=True,
                 return_dict=True).hidden_states[-1].numpy()[:, 1:]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# EVA-02 (rope + sub-LN SwiGLU): converter/shape/rope behavior (timm is not
# in this image, so no transplant oracle; eva_clip_encoder.py:24-38)
# ---------------------------------------------------------------------------


def _eva_tiny_cfg():
    return _vit_cfg(k_bias=False, rope=True, rope_ref_side=4, swiglu_ln=True,
                    select_layer=-2, ln_eps=1e-6)


def test_eva02_converter_roundtrip():
    """A fabricated timm-style Eva state dict converts into exactly the
    param tree the module initializes (names, shapes, no k bias)."""
    from cambrian_tpu.checkpoint.hf_vision import convert_eva02
    from cambrian_tpu.models.encoders.vit import VisionTransformer

    cfg = _eva_tiny_cfg()
    d, m = cfg.hidden_size, cfg.intermediate_size
    n = cfg.num_patches
    sd = {"pos_embed": RNG.standard_normal((1, n + 1, d)).astype(np.float32),
          "cls_token": RNG.standard_normal((1, 1, d)).astype(np.float32),
          "patch_embed.proj.weight": RNG.standard_normal(
              (d, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32),
          "patch_embed.proj.bias": RNG.standard_normal(d).astype(np.float32)}
    for i in range(cfg.num_layers):
        lp = f"blocks.{i}."
        for nm, shape in [("attn.q_proj", (d, d)), ("attn.v_proj", (d, d)),
                          ("attn.proj", (d, d)), ("mlp.fc1_g", (m, d)),
                          ("mlp.fc1_x", (m, d)), ("mlp.fc2", (d, m))]:
            sd[lp + nm + ".weight"] = RNG.standard_normal(shape).astype(np.float32)
            sd[lp + nm + ".bias"] = RNG.standard_normal(shape[0]).astype(np.float32)
        sd[lp + "attn.k_proj.weight"] = RNG.standard_normal((d, d)).astype(np.float32)
        for nm in ["norm1", "norm2", "mlp.norm"]:
            sd[lp + nm + ".weight"] = RNG.standard_normal(d if "mlp" not in nm else m).astype(np.float32)
            sd[lp + nm + ".bias"] = RNG.standard_normal(d if "mlp" not in nm else m).astype(np.float32)

    mod = VisionTransformer(cfg)
    params = convert_eva02(sd, cfg)
    ref_shapes = jax.tree.map(lambda x: x.shape,
                              mod.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 3, 32, 32)))["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes
    out = mod.apply({"params": jax.tree.map(jnp.asarray, params)},
                    jnp.asarray(RNG.standard_normal((1, 3, 32, 32),
                                                    dtype=np.float32)))
    assert out.shape == (1, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_eva02_rope_properties():
    """The 2-D rope preserves per-token norms and is position-dependent;
    the ft/pt rescaling makes tables at res R equal the pretrain tables
    sampled at fractional positions."""
    from cambrian_tpu.models.encoders.vit import _apply_rope, _rope_tables

    sin, cos = _rope_tables(side=4, head_dim=16, ref_side=4)
    assert sin.shape == (16, 16)
    np.testing.assert_allclose(np.asarray(sin) ** 2 + np.asarray(cos) ** 2,
                               1.0, atol=1e-6)
    x = jnp.asarray(RNG.standard_normal((1, 16, 2, 16)).astype(np.float32))
    rot = _apply_rope(x, sin, cos, n_prefix=0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rot), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)
    # position (0,0) has zero angle -> identity
    np.testing.assert_allclose(np.asarray(rot[:, 0]), np.asarray(x[:, 0]),
                               rtol=1e-5)
    assert not np.allclose(np.asarray(rot[:, 5]), np.asarray(x[:, 5]))
    # rescaling: side=8 with ref 4 must interpolate the ref grid's angles
    sin8, _ = _rope_tables(side=8, head_dim=16, ref_side=4)
    np.testing.assert_allclose(np.asarray(sin8.reshape(8, 8, 16)[0, 2]),
                               np.asarray(sin.reshape(4, 4, 16)[0, 1]),
                               atol=1e-6)
