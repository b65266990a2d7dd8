"""Golden parity of the vision towers vs HF torch implementations with
random weights (no downloads; architecture parity is what's under test).
Tolerances are fp32-tight: any structural mismatch blows up far past them.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cambrian_tpu.checkpoint.hf_vision import (
    convert_clip_vision,
    convert_convnext,
    convert_dinov2,
    convert_siglip_vision,
)
from cambrian_tpu.models.encoders.base import (
    build_vision_tower,
    build_vision_tower_aux_list,
    extract_res_interp,
)
from cambrian_tpu.models.encoders.convnext import ConvNeXtConfig, ConvNeXtTokens
from cambrian_tpu.models.encoders.vit import ViTConfig, VisionTransformer

RNG = np.random.default_rng(7)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _pixels(b, size):
    return RNG.standard_normal((b, 3, size, size), dtype=np.float32)


def test_clip_vit_parity_select_layer_minus2():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, image_size=28, patch_size=14,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
    )
    hf = CLIPVisionModel(hf_cfg).eval()
    px = _pixels(2, 28)
    with torch.no_grad():
        hs = hf(torch.from_numpy(px), output_hidden_states=True).hidden_states
        ref = hs[-2][:, 1:].numpy()  # select_layer=-2, drop CLS

    cfg = ViTConfig(hidden_size=32, num_layers=3, num_heads=4, intermediate_size=64,
                    patch_size=14, image_size=28, class_token=True, pre_layernorm=True,
                    final_layernorm=False, act="quick_gelu", patch_bias=False,
                    select_layer=-2, ln_eps=1e-5)
    mod = VisionTransformer(cfg)
    params = jax.tree.map(jnp.asarray, convert_clip_vision(_sd(hf), cfg))
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(px)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_siglip_parity_full_forward():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    hf = SiglipVisionModel(hf_cfg).eval()
    px = _pixels(2, 28)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).last_hidden_state.numpy()

    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
                    patch_size=14, image_size=28, class_token=False,
                    final_layernorm=True, act="gelu_tanh", select_layer=0, ln_eps=1e-6)
    mod = VisionTransformer(cfg)
    params = jax.tree.map(jnp.asarray, convert_siglip_vision(_sd(hf), cfg))
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(px)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dinov2_swiglu_layerscale_parity():
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        mlp_ratio=4, use_swiglu_ffn=True, image_size=28, patch_size=14,
        layer_norm_eps=1e-6, layerscale_value=0.5,
    )
    hf = Dinov2Model(hf_cfg).eval()
    px = _pixels(2, 28)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).last_hidden_state[:, 1:].numpy()

    # HF SwiGLU hidden: int(32*4 * 2/3) rounded up to multiple of 8 = 88
    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4, intermediate_size=88,
                    patch_size=14, image_size=28, class_token=True,
                    final_layernorm=True, act="gelu", swiglu=True, layer_scale=True,
                    select_layer=0, ln_eps=1e-6)
    mod = VisionTransformer(cfg)
    params = jax.tree.map(jnp.asarray, convert_dinov2(_sd(hf), cfg))
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(px)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dinov2_pos_embed_interp_res_override():
    """-res override: pos embeds resampled at load; forward at 42px matches
    HF's runtime interpolation within bicubic tolerance."""
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        mlp_ratio=4, use_swiglu_ffn=False, image_size=28, patch_size=14,
        layer_norm_eps=1e-6, layerscale_value=0.5,
    )
    hf = Dinov2Model(hf_cfg).eval()
    px = _pixels(1, 42)  # 3x3 grid vs native 2x2
    with torch.no_grad():
        ref = hf(torch.from_numpy(px), interpolate_pos_encoding=True
                 ).last_hidden_state[:, 1:].numpy()

    cfg = ViTConfig(hidden_size=32, num_layers=1, num_heads=4, intermediate_size=128,
                    patch_size=14, image_size=42, class_token=True,
                    final_layernorm=True, act="gelu", swiglu=False, layer_scale=True,
                    select_layer=0, ln_eps=1e-6)
    mod = VisionTransformer(cfg)
    params = jax.tree.map(jnp.asarray, convert_dinov2(_sd(hf), cfg))
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(px)))
    # bicubic implementations differ slightly; features must still agree closely
    np.testing.assert_allclose(ours, ref, rtol=5e-2, atol=5e-2)


def test_convnext_multistage_parity():
    from transformers import ConvNextConfig, ConvNextModel

    hf_cfg = ConvNextConfig(
        depths=[1, 1, 2, 1], hidden_sizes=[8, 16, 32, 64], image_size=64,
        layer_norm_eps=1e-6, layer_scale_init_value=0.5,
    )
    hf = ConvNextModel(hf_cfg).eval()
    px = _pixels(2, 64)
    with torch.no_grad():
        hs = hf(torch.from_numpy(px), output_hidden_states=True).hidden_states
        # hidden_states = [embeddings] + per-stage maps (NCHW)
        ref_stages = [h.numpy() for h in hs[1:]]

    cfg = ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64), image_size=64)
    tok = ConvNeXtTokens(cfg, interp_side=4)
    params = jax.tree.map(jnp.asarray, convert_convnext(_sd(hf), cfg))
    from cambrian_tpu.models.encoders.convnext import ConvNeXt

    maps = ConvNeXt(cfg).apply({"params": params["trunk"]}, jnp.asarray(px))
    for ours, theirs in zip(maps, ref_stages):
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs, rtol=1e-4, atol=1e-5
        )

    # token path: 4 stages resized to 4x4 and concatenated
    tokens = tok.apply({"params": params}, jnp.asarray(px))
    assert tokens.shape == (2, 16, 8 + 16 + 32 + 64)


def test_extract_res_interp():
    assert extract_res_interp("facebook/dinov2-giant-res378-interp576") == (
        "facebook/dinov2-giant", 378, 576)
    assert extract_res_interp("clip-convnext-XXL-multi-stage-interp9216") == (
        "clip-convnext-XXL-multi-stage", None, 9216)


def test_build_vision_tower_aux_list_debug():
    towers = build_vision_tower_aux_list(["debug-tower-0", "debug-tower-1"], [16, 64])
    assert towers[0].interp_size == 16 and towers[1].interp_size == 64
    rng = jax.random.PRNGKey(0)
    params = towers[0].init(rng)
    px = jnp.zeros((2, 3, towers[0].image_size, towers[0].image_size))
    feats = towers[0].apply(params, px)
    assert feats.shape == (2, 16, towers[0].hidden_size)


def test_production_tower_registry():
    """Names from the production config resolve with correct static geometry."""
    specs = {
        "siglip/CLIP-ViT-SO400M-14-384-interp576": (1152, 576),
        "openai/clip-vit-large-patch14-336-interp576": (1024, 576),
        "facebook/dinov2-giant-res378-interp576": (1536, 576),
        "clip-convnext-XXL-multi-stage-interp9216": (5760, 9216),
    }
    for name, (hidden, ntok) in specs.items():
        t = build_vision_tower(name)
        assert t.hidden_size == hidden, name
        assert t.num_patches == ntok, name


def test_siglip_timm_format_parity():
    """open_clip/timm checkpoint layout (fused qkv, 'visual.trunk.' prefix)
    must produce the same tower as the HF layout."""
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from cambrian_tpu.checkpoint.hf_vision import convert_siglip_timm

    hf_cfg = SiglipVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    hf = SiglipVisionModel(hf_cfg).eval()
    sd = _sd(hf)

    # synthesize the timm-style dict from the HF weights
    timm_sd = {
        "visual.trunk.patch_embed.proj.weight":
            sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.trunk.patch_embed.proj.bias":
            sd["vision_model.embeddings.patch_embedding.bias"],
        "visual.trunk.pos_embed":
            sd["vision_model.embeddings.position_embedding.weight"][None],
        "visual.trunk.norm.weight": sd["vision_model.post_layernorm.weight"],
        "visual.trunk.norm.bias": sd["vision_model.post_layernorm.bias"],
    }
    for i in range(2):
        hp = f"vision_model.encoder.layers.{i}."
        tp = f"visual.trunk.blocks.{i}."
        timm_sd[tp + "attn.qkv.weight"] = np.concatenate([
            sd[hp + "self_attn.q_proj.weight"],
            sd[hp + "self_attn.k_proj.weight"],
            sd[hp + "self_attn.v_proj.weight"],
        ], axis=0)
        timm_sd[tp + "attn.qkv.bias"] = np.concatenate([
            sd[hp + "self_attn.q_proj.bias"],
            sd[hp + "self_attn.k_proj.bias"],
            sd[hp + "self_attn.v_proj.bias"],
        ], axis=0)
        timm_sd[tp + "attn.proj.weight"] = sd[hp + "self_attn.out_proj.weight"]
        timm_sd[tp + "attn.proj.bias"] = sd[hp + "self_attn.out_proj.bias"]
        for a, b in [("norm1", "layer_norm1"), ("norm2", "layer_norm2")]:
            timm_sd[tp + a + ".weight"] = sd[hp + b + ".weight"]
            timm_sd[tp + a + ".bias"] = sd[hp + b + ".bias"]
        for fc in ("fc1", "fc2"):
            timm_sd[tp + f"mlp.{fc}.weight"] = sd[hp + f"mlp.{fc}.weight"]
            timm_sd[tp + f"mlp.{fc}.bias"] = sd[hp + f"mlp.{fc}.bias"]

    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
                    patch_size=14, image_size=28, class_token=False,
                    final_layernorm=True, act="gelu_tanh", select_layer=0,
                    ln_eps=1e-6)
    mod = VisionTransformer(cfg)
    params = jax.tree.map(jnp.asarray, convert_siglip_timm(timm_sd, cfg))

    px = _pixels(2, 28)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(px)))
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
