"""ConvNeXt trunk with multi-stage feature taps — the high-resolution tower
(OpenCLIP CLIP-convnext-XXL at res 1024, reduction 32).

Reference behavior (clip_convnext_encoder.py:121-144): run stem + 4 stages,
keep every stage's map (multi-stage) or only the last, bilinearly resize each
map in fp32 to the interp grid (96x96 for -interp9216) and concatenate
channels -> [B, 9216, 384+768+1536+3072=5760].

Layout: NHWC throughout (TPU conv layout); depthwise 7x7 via
feature_group_count.
"""

import os
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.activations import gelu_exact
from ...ops.norms import (
    DenseParams,
    LayerNormParams,
    StreamLayerNorm,
    layer_norm_into_dense,
)
from ...ops.resize import resize_bilinear


def _ln_into_gemm() -> bool:
    """A/B flag for the LN-through-GEMM fold (only-wire-what-wins policy:
    default off until the on-chip measurement lands in docs/PERF_NOTES.md;
    parity gated by tests/test_norms_stream.py either way)."""
    return os.environ.get("CAMBRIAN_LN_INTO_GEMM", "0") == "1"


@dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 4, 30, 3)
    dims: Tuple[int, ...] = (384, 768, 1536, 3072)   # XXL
    image_size: int = 1024
    ln_eps: float = 1e-6
    multi_stage: bool = True

    @property
    def hidden_size(self) -> int:
        return sum(self.dims) if self.multi_stage else self.dims[-1]

    @property
    def reduction(self) -> int:
        return 32


class ConvNeXtBlock(nn.Module):
    """One ConvNeXt block over a FLAT [h*w*b, c] carrier.

    The pointwise GEMMs want one large [rows, C] matmul (the 4-D form runs
    as per-row batched GEMMs at ~22% MXU — docs/PERF_NOTES.md), while XLA's
    dwconv emitter lays NHWC tensors out as (h, w, b, c) in memory with
    (b, c) tiled. Flattening in that order — rows = h*w*b, not the naive
    b*h*w — makes the flatten/unflatten around the dwconv bitcasts instead
    of relayout copies and keeps the residual add in-layout: measured
    -5.8% / -6.0% / -5.9% at stages 0/1/2 (scripts/perf/layout_exp.py, r3).
    Row order is invisible to LN/GEMM/gelu (all row-wise), so numerics and
    checkpoints are unchanged.
    """

    dim: int
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf, spatial):
        hh, ww, b = spatial
        c = self.dim
        x4 = xf.reshape(hh, ww, b, c).transpose(2, 0, 1, 3)
        h = nn.Conv(
            c, kernel_size=(7, 7), padding=3, feature_group_count=c,
            dtype=self.dtype, name="dwconv",
        )(x4)
        h = h.transpose(1, 2, 0, 3).reshape(hh * ww * b, c)
        if _ln_into_gemm():
            # fold the LN normalize through pwconv1 (ops/norms.py::
            # layer_norm_into_dense): the GEMM reads RAW bf16 activations
            # and the normalize leaves its prologue; same param tree
            ln_scale, ln_bias = LayerNormParams(c, name="norm")()
            kernel, dbias = DenseParams(c, 4 * c, name="pwconv1")()
            h = layer_norm_into_dense(h, ln_scale, ln_bias, kernel, dbias,
                                      eps=self.ln_eps,
                                      compute_dtype=self.dtype)
        else:
            h = StreamLayerNorm(epsilon=self.ln_eps, name="norm")(h)
            h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = gelu_exact(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        return xf + h * gamma.astype(h.dtype)


class ConvNeXt(nn.Module):
    """Returns per-stage NHWC feature maps (list of 4)."""

    cfg: ConvNeXtConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        c = self.cfg
        x = jnp.transpose(pixels.astype(self.dtype), (0, 2, 3, 1))  # NCHW -> NHWC
        # stem: 4x4 s4 conv + LN
        x = nn.Conv(c.dims[0], kernel_size=(4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        x = StreamLayerNorm(epsilon=c.ln_eps, name="stem_norm")(x)

        stage_maps = []
        for s, (depth, dim) in enumerate(zip(c.depths, c.dims)):
            if s > 0:
                x = StreamLayerNorm(epsilon=c.ln_eps, name=f"downsample_norm_{s}")(x)
                x = nn.Conv(dim, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"downsample_conv_{s}")(x)
            # flat carry across the stage (see ConvNeXtBlock docstring)
            b, hh, ww, _ = x.shape
            xf = x.transpose(1, 2, 0, 3).reshape(hh * ww * b, dim)
            for blk in range(depth):
                xf = ConvNeXtBlock(dim, ln_eps=c.ln_eps, dtype=self.dtype,
                                   name=f"stage_{s}_block_{blk}")(
                                       xf, (hh, ww, b))
            x = xf.reshape(hh, ww, b, dim).transpose(2, 0, 1, 3)
            stage_maps.append(x)
        return stage_maps


class ConvNeXtTokens(nn.Module):
    """Full tower forward: stages -> fp32 bilinear resize to the target grid
    -> channel concat -> tokens [B, grid^2, hidden]."""

    cfg: ConvNeXtConfig
    interp_side: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        maps = ConvNeXt(c, dtype=self.dtype, name="trunk")(pixels)
        if not c.multi_stage:
            maps = maps[-1:]
        resized = [
            resize_bilinear(m, self.interp_side, self.interp_side) for m in maps
        ]
        x = jnp.concatenate(resized, axis=-1)
        b = x.shape[0]
        return x.reshape(b, self.interp_side * self.interp_side, -1)


def convnext_xxl(image_size: int = 1024, multi_stage: bool = True) -> ConvNeXtConfig:
    return ConvNeXtConfig(depths=(3, 4, 30, 3), dims=(384, 768, 1536, 3072),
                          image_size=image_size, multi_stage=multi_stage)


def convnext_large(image_size: int = 320, multi_stage: bool = True) -> ConvNeXtConfig:
    return ConvNeXtConfig(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536),
                          image_size=image_size, multi_stage=multi_stage)


def tiny_convnext(image_size: int = 64) -> ConvNeXtConfig:
    return ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                          image_size=image_size)
