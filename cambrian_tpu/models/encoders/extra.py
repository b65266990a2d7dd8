"""Long-tail research towers (the paper's encoder-ablation zoo, SURVEY.md
§2.3): MAE / MoCo-v3 / I-JEPA / MAWS / supervised-ViT / DFN-CLIP / EVA-CLIP
as configurations of the generic ViT, plus the hybrid concat tower.

Also here: MiDaS DPT depth towers (plain ViT + BEiT layouts) and the SD-2.1
one-step-denoise diffusion tower (see ``diffusion.py``).
"""

from typing import Optional

import jax.numpy as jnp

from ...mm_utils import (
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    ImageProcessor,
)
from ...ops.resize import interpolate_tokens
from .base import VisionTower, register_tower
from .vit import ViTConfig, VisionTransformer

# (hidden, layers, heads, mlp, patch, image) per published architecture
_VIT_SHAPES = {
    "vit-b-16": (768, 12, 12, 3072, 16, 224),
    "vit-l-16": (1024, 24, 16, 4096, 16, 224),
    "vit-l-14": (1024, 24, 16, 4096, 14, 224),
    "vit-h-14": (1280, 32, 16, 5120, 14, 224),
    "vit-g-16": (1408, 40, 16, 6144, 16, 224),
    "vit-2b-14": (2560, 24, 32, 10240, 14, 224),
}


def _plain_vit(shape_key: str, class_token: bool, image_size: Optional[int] = None,
               act: str = "gelu") -> ViTConfig:
    hidden, layers, heads, mlp, patch, img = _VIT_SHAPES[shape_key]
    return ViTConfig(
        hidden_size=hidden, num_layers=layers, num_heads=heads,
        intermediate_size=mlp, patch_size=patch,
        image_size=image_size or img, class_token=class_token,
        final_layernorm=True, act=act, select_layer=0, ln_eps=1e-6,
    )


def _vit_tower(name, cfg: ViTConfig, res, interp, dtype, mean, std,
               hf_repo=None) -> VisionTower:
    if res is not None and res != cfg.image_size:
        cfg = ViTConfig(**{**cfg.__dict__, "image_size": res})
    return VisionTower(
        name=name, module=VisionTransformer(cfg, dtype=dtype), config=cfg,
        hidden_size=cfg.hidden_size, image_size=cfg.image_size,
        interp_size=interp,
        image_processor=ImageProcessor(size=cfg.image_size, image_mean=mean,
                                       image_std=std),
        hf_repo=hf_repo,
    )


@register_tower("mae-vit")
def _build_mae(name, res, interp, dtype):
    """MAE ViT (mae_encoder.py): timm vit_{l16,h14}.mae, patch tokens after
    the final norm."""
    key = "vit-h-14" if "h-14" in name else "vit-l-16"
    cfg = _plain_vit(key, class_token=True)
    return _vit_tower(name, cfg, res, interp, dtype, IMAGENET_MEAN, IMAGENET_STD,
                      hf_repo="facebook/vit-mae-huge" if "h-14" in name
                      else "facebook/vit-mae-large")


@register_tower("moco-vit")
def _build_moco(name, res, interp, dtype):
    """MoCo-v3 ViT-B/16 (moco_encoder.py + vendored moco/vision_transformer)."""
    cfg = _plain_vit("vit-b-16", class_token=True)
    return _vit_tower(name, cfg, res, interp, dtype, IMAGENET_MEAN, IMAGENET_STD)


@register_tower("ijepa")
def _build_ijepa(name, res, interp, dtype):
    """I-JEPA ViT (ijepa_encoder.py + vendored ijepa/vision_transformer):
    no class token, final norm."""
    key = "vit-g-16" if "g-16" in name else "vit-h-14"
    cfg = _plain_vit(key, class_token=False)
    return _vit_tower(name, cfg, res, interp, dtype, IMAGENET_MEAN, IMAGENET_STD,
                      hf_repo="facebook/ijepa_vith14_22k" if "h-14" in name
                      else "facebook/ijepa_vitg16_22k")


@register_tower("maws")
def _build_maws(name, res, interp, dtype):
    """MAWS ViTs (maws_encoder.py)."""
    for key in ("vit-2b-14", "vit-h-14", "vit-l-16", "vit-b-16"):
        if key.replace("vit-", "") in name.lower():
            break
    else:
        key = "vit-b-16"
    cfg = _plain_vit(key, class_token=True)
    return _vit_tower(name, cfg, res, interp, dtype, IMAGENET_MEAN, IMAGENET_STD)


@register_tower("supervised-vit")
def _build_supervised(name, res, interp, dtype):
    """Supervised ViT baselines (supervised_vit_encoder.py)."""
    key = "vit-h-14" if "h-14" in name else "vit-l-16" if "l-16" in name else "vit-b-16"
    cfg = _plain_vit(key, class_token=True)
    return _vit_tower(name, cfg, res, interp, dtype, IMAGENET_MEAN, IMAGENET_STD,
                      hf_repo="google/vit-huge-patch14-224-in21k"
                      if "h-14" in name else "google/vit-large-patch16-224")


@register_tower("dfn-clip")
def _build_dfn(name, res, interp, dtype):
    """Apple DFN CLIP ViT-H/14 (dfn_clip_encoder.py)."""
    cfg = ViTConfig(hidden_size=1280, num_layers=32, num_heads=16,
                    intermediate_size=5120, patch_size=14,
                    image_size=res or 224, class_token=True, pre_layernorm=True,
                    final_layernorm=False, act="quick_gelu", patch_bias=False,
                    select_layer=-2, ln_eps=1e-5)
    return _vit_tower(name, cfg, res, interp, dtype, CLIP_MEAN, CLIP_STD,
                      hf_repo="apple/DFN5B-CLIP-ViT-H-14")


@register_tower("eva02")
@register_tower("eva/clip")
def _build_eva(name, res, interp, dtype):
    """EVA-02-CLIP ViT-L/14 trunk (eva_clip_encoder.py:18-34 loads
    timm/eva02_large_patch14_clip_{336,224} via open_clip and taps
    forward_features).

    TrV block per the EVA-02 paper: 2-D axial RoPE on patch tokens
    (positions rescaled to the 16x16 pretrain grid), sub-LN SwiGLU FFN
    (hidden = 2/3 * 4d), key projection without bias, absolute position
    embeddings kept. select_layer=-2 like the other CLIP towers."""
    size = 224 if ("224" in name and "336" not in name) else 336
    cfg = ViTConfig(hidden_size=1024, num_layers=24, num_heads=16,
                    intermediate_size=2730, patch_size=14,
                    image_size=res or size, class_token=True,
                    final_layernorm=False, act="gelu", select_layer=-2,
                    ln_eps=1e-6, k_bias=False, rope=True, rope_ref_side=16,
                    swiglu_ln=True)
    repo = ("timm/eva02_large_patch14_clip_224.merged2b_s4b_b131k"
            if cfg.image_size == 224
            else "timm/eva02_large_patch14_clip_336.merged2b_s6b_b61k")
    return _vit_tower(name, cfg, res, interp, dtype, CLIP_MEAN, CLIP_STD,
                      hf_repo=repo)


@register_tower("midas")
def _build_midas(name, res, interp, dtype):
    """MiDaS depth towers (midas_encoder.py:37-103): DPT backbones tapped at
    hidden_states[-1] (pre final-LN), cls dropped, mean/std 0.5.

    - large-midas: Intel/dpt-large = plain ViT-L/16 @384
    - large-beit-midas-512: Intel/dpt-beit-large-512 = BEiT-L/16 @512
      (per-block relative position bias, LayerScale, no absolute pos embed,
      key proj without bias)
    - hybrid-midas: the reference itself notes it NaNs immediately
      (midas_encoder.py:46) and never used it; unsupported here too.
    """
    lowered = name.lower()
    if "hybrid" in lowered:
        raise NotImplementedError(
            "hybrid-midas (ResNet-hybrid DPT) NaNs in the reference "
            "(midas_encoder.py:46) and is not supported")
    if "beit" in lowered:
        cfg = ViTConfig(hidden_size=1024, num_layers=24, num_heads=16,
                        intermediate_size=4096, patch_size=16,
                        image_size=res or 512, class_token=True,
                        final_layernorm=False, act="gelu", select_layer=-1,
                        ln_eps=1e-12, k_bias=False, abs_pos_embed=False,
                        rel_pos_bias=True, layer_scale=True)
        repo = "Intel/dpt-beit-large-512"
    else:
        cfg = ViTConfig(hidden_size=1024, num_layers=24, num_heads=16,
                        intermediate_size=4096, patch_size=16,
                        image_size=res or 384, class_token=True,
                        final_layernorm=False, act="gelu", select_layer=-1,
                        ln_eps=1e-12)
        repo = "Intel/dpt-large"
    half = ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5])
    return _vit_tower(name, cfg, res, interp, dtype, half[0], half[1],
                      hf_repo=repo)


class _HybridTower:
    """Concat of N towers resized to a shared grid
    (hybrid_encoder.py:24-40): feature dim = sum of tower dims."""

    def __init__(self, name, towers, interp):
        self.name = name
        self.towers = towers
        self.interp_size = interp or min(t.num_patches for t in towers)
        self.hidden_size = sum(t.hidden_size for t in towers)
        self.image_size = max(t.image_size for t in towers)
        self.image_processor = towers[0].image_processor
        self.config = towers[0].config
        self.hf_repo = None

    def init(self, rng, dtype=jnp.float32):
        import jax

        return [t.init(jax.random.fold_in(rng, i), dtype)
                for i, t in enumerate(self.towers)]

    def apply(self, params_list, pixels):
        feats = []
        for tower, params in zip(self.towers, params_list):
            f = tower.apply(params, pixels)
            if f.shape[1] != self.interp_size:
                f = interpolate_tokens(f, self.interp_size)
            feats.append(f)
        return jnp.concatenate(feats, axis=-1)

    @property
    def num_patches(self):
        return self.interp_size

    @property
    def num_patches_per_side(self):
        return int(self.interp_size ** 0.5)


@register_tower("hybridmodel")
def _build_hybrid(name, res, interp, dtype):
    from .base import build_vision_tower

    inner = name.replace("hybridmodel-", "")
    for suffix in ("-res", "-interp"):
        pass
    # strip our own res/interp suffixes before splitting
    parts = inner.split("-&&&-")
    towers = [build_vision_tower(p, dtype=dtype) for p in parts]
    return _HybridTower(name, towers, interp)


@register_tower("diffusion")
@register_tower("pixart")
def _build_diffusion(name, res, interp, dtype):
    """SD-2.1 one-step-denoise feature tower (diffusion_encoder.py:160-260;
    pixart_alpha_encoder.py loads the identical SD-2.1 pipeline — its PixArt
    import is dead code). hidden 3520 = concat of the 4 up-block taps,
    32x32 token grid at 512 res, mean/std 0.5."""
    from .diffusion import SDConfig, SDFeatureTower, tiny_sd

    if "tiny" in name.lower():
        cfg = tiny_sd(image_size=res or 64)
    elif res is not None and res != 512:
        cfg = SDConfig(image_size=res)
    else:
        cfg = SDConfig()
    return VisionTower(
        name=name, module=SDFeatureTower(cfg, dtype=dtype), config=cfg,
        hidden_size=cfg.hidden_size, image_size=cfg.image_size,
        interp_size=interp,
        image_processor=ImageProcessor(size=cfg.image_size,
                                       image_mean=[0.5, 0.5, 0.5],
                                       image_std=[0.5, 0.5, 0.5]),
        hf_repo="stabilityai/stable-diffusion-2-1",
    )
