"""Vision tower registry and wrapper.

Mirrors the reference's tower abstraction (multimodal_encoder/base_encoder.py
+ builder.py): tower names encode configuration as ``<model>-res{R}-interp{T}``
(parsed like clip_encoder.py:13-25), every ViT tower fp32-bilinearly resamples
its token grid to the requested count (clip_encoder.py:70-96), and builders
dispatch on substring match (multimodal_encoder/builder.py:23-82).

A tower here is a plain dataclass bundling a Flax module, its config, and the
host-side image processor — parameters live in the surrounding model pytree
(functional style), not on the tower object.
"""

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...mm_utils import (
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    SIGLIP_MEAN,
    SIGLIP_STD,
    ImageProcessor,
)
from ...ops.resize import interpolate_tokens
from .convnext import ConvNeXtConfig, ConvNeXtTokens, convnext_large, convnext_xxl, tiny_convnext
from .vit import (
    ViTConfig,
    VisionTransformer,
    clip_vit_l_336,
    dinov2_giant,
    siglip_so400m_384,
    tiny_vit,
)


def extract_res_interp(model_name: str) -> Tuple[str, Optional[int], Optional[int]]:
    """Parse ``-res{R}`` / ``-interp{T}`` suffixes out of a tower name."""
    res = None
    interp = None
    base_parts = []
    for part in model_name.split("-"):
        if part.startswith("res") and part[3:].isdigit():
            res = int(part[3:])
        elif part.startswith("interp") and part[6:].isdigit():
            interp = int(part[6:])
        else:
            base_parts.append(part)
    return "-".join(base_parts), res, interp


@dataclass
class VisionTower:
    """A vision encoder: Flax module + static config + host image processor.

    ``apply(params, pixels)`` returns token features [B, num_patches, C] after
    the fp32 token-grid interpolation (when ``interp_size`` is set).
    """

    name: str
    module: Any                       # flax nn.Module: pixels NCHW -> [B, N, C]
    config: Any
    hidden_size: int
    image_size: int
    interp_size: Optional[int]
    image_processor: ImageProcessor
    hf_repo: Optional[str] = None     # upstream checkpoint identity

    def init(self, rng, dtype=jnp.float32):
        dummy = jnp.zeros((1, 3, self.image_size, self.image_size), dtype)
        return self.module.init(rng, dummy)["params"]

    def apply(self, params, pixels: jnp.ndarray) -> jnp.ndarray:
        feats = self.module.apply({"params": params}, pixels)
        if self.interp_size is not None and feats.shape[1] != self.interp_size:
            feats = interpolate_tokens(feats, self.interp_size)
        return feats

    @property
    def num_patches(self) -> int:
        if self.interp_size is not None:
            return self.interp_size
        return self.config.num_patches if hasattr(self.config, "num_patches") else (
            (self.image_size // self.config.reduction) ** 2
        )

    @property
    def num_patches_per_side(self) -> int:
        return int(self.num_patches ** 0.5)


# ---------------------------------------------------------------------------
# Builders: substring dispatch like the reference builder
# ---------------------------------------------------------------------------

TowerBuilder = Callable[[str, Optional[int], Optional[int], Any], VisionTower]
_REGISTRY: Dict[str, TowerBuilder] = {}


def register_tower(substr: str):
    def deco(fn: TowerBuilder):
        _REGISTRY[substr] = fn
        return fn
    return deco


@register_tower("clip-convnext")
def _build_convnext(name, res, interp, dtype):
    cfg = convnext_xxl if "XXL" in name else convnext_large
    image_size = res if res is not None else 1024
    multi_stage = "multi-stage" in name
    c = cfg(image_size=image_size, multi_stage=multi_stage)
    interp_side = int(interp ** 0.5) if interp else image_size // c.reduction
    module = ConvNeXtTokens(c, interp_side=interp_side, dtype=dtype)
    return VisionTower(
        name=name, module=module, config=c, hidden_size=c.hidden_size,
        image_size=image_size, interp_size=interp_side ** 2,
        image_processor=ImageProcessor(size=image_size, image_mean=CLIP_MEAN,
                                       image_std=CLIP_STD),
        hf_repo="laion/CLIP-convnext_xxlarge-laion2B-s34B-b82K-augreg-soup"
        if "XXL" in name else "laion/CLIP-convnext_large_d_320.laion2B-s29B-b131K-ft-soup",
    )


@register_tower("siglip")
def _build_siglip(name, res, interp, dtype):
    c = siglip_so400m_384()
    if res is not None and res != c.image_size:
        c = ViTConfig(**{**c.__dict__, "image_size": res})
    module = VisionTransformer(c, dtype=dtype)
    return VisionTower(
        name=name, module=module, config=c, hidden_size=c.hidden_size,
        image_size=c.image_size, interp_size=interp,
        image_processor=ImageProcessor(size=c.image_size, image_mean=SIGLIP_MEAN,
                                       image_std=SIGLIP_STD),
        hf_repo="google/siglip-so400m-patch14-384",
    )


@register_tower("dinov2")
def _build_dinov2(name, res, interp, dtype):
    c = dinov2_giant(image_size=res if res is not None else 518)
    module = VisionTransformer(c, dtype=dtype)
    return VisionTower(
        name=name, module=module, config=c, hidden_size=c.hidden_size,
        image_size=c.image_size, interp_size=interp,
        image_processor=ImageProcessor(size=c.image_size, image_mean=IMAGENET_MEAN,
                                       image_std=IMAGENET_STD),
        hf_repo="facebook/dinov2-giant",
    )


@register_tower("clip-vit")
@register_tower("openai/clip")
def _build_clip(name, res, interp, dtype):
    c = clip_vit_l_336()
    if res is not None and res != c.image_size:
        c = ViTConfig(**{**c.__dict__, "image_size": res})
    module = VisionTransformer(c, dtype=dtype)
    return VisionTower(
        name=name, module=module, config=c, hidden_size=c.hidden_size,
        image_size=c.image_size, interp_size=interp,
        image_processor=ImageProcessor(size=c.image_size, image_mean=CLIP_MEAN,
                                       image_std=CLIP_STD),
        hf_repo="openai/clip-vit-large-patch14-336",
    )


@register_tower("debug-tower")
def _build_debug(name, res, interp, dtype):
    """Tiny randomly-initialized ViT used by tests and the entry dry-runs."""
    c = tiny_vit(image_size=res if res is not None else 32, class_token=False,
                 select_layer=0)
    module = VisionTransformer(c, dtype=dtype)
    return VisionTower(
        name=name, module=module, config=c, hidden_size=c.hidden_size,
        image_size=c.image_size, interp_size=interp,
        image_processor=ImageProcessor(size=c.image_size, image_mean=SIGLIP_MEAN,
                                       image_std=SIGLIP_STD),
    )


def build_vision_tower(name: str, dtype=jnp.float32) -> VisionTower:
    """Dispatch on substring match like the reference
    (multimodal_encoder/builder.py:23-82)."""
    base, res, interp = extract_res_interp(name)
    lowered = name.lower()
    # prefix matches beat substring matches; longer keys beat shorter ones
    # (so "dfn-clip-vit-h" resolves to the dfn builder, not "clip-vit")
    matches = [k for k in _REGISTRY if k.lower() in lowered]
    if not matches:
        raise ValueError(f"Unknown vision tower: {name}")
    def rank(k):
        kl = k.lower()
        return (lowered.startswith(kl),                      # full-name prefix
                lowered.split("/")[-1].startswith(kl),       # after-org prefix
                len(kl))
    key = max(matches, key=rank)
    return _REGISTRY[key](name, res, interp, dtype)


def build_vision_tower_aux_list(tower_names, token_len_list, dtype=jnp.float32):
    """Build all aux towers, appending ``-interp{token_len}`` per tower
    (multimodal_encoder/builder.py:86-148)."""
    towers = []
    for name, token_len in zip(tower_names, token_len_list):
        if "interp" not in name:
            name = f"{name}-interp{token_len}"
        towers.append(build_vision_tower(name, dtype=dtype))
    return towers
