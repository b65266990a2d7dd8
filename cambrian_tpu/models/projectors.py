"""LLaVA-style baseline projectors (non-SVA): linear, mlp{N}x_gelu, identity,
se_mlp, CAbstractor — the reference's multimodal_projector/builder.py:54-78
and projectors.py:84-122 surface.
"""

import re
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import gelu_exact


class LinearProjector(nn.Module):
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(x)


class MlpGeluProjector(nn.Module):
    hidden_size: int
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc0")(x)
        for i in range(1, self.depth):
            x = gelu_exact(x)
            x = nn.Dense(self.hidden_size, dtype=self.dtype, name=f"fc{i}")(x)
        return x


class IdentityProjector(nn.Module):
    hidden_size: int = 0
    dtype: jnp.dtype = jnp.float32

    def __call__(self, x):
        return x


class SEMlpProjector(nn.Module):
    """Squeeze-excite MLP (multimodal_projector/builder.py:33-52): a global
    token gate followed by a 2-layer projection."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        g = jnp.mean(x, axis=1, keepdims=True)
        g = nn.Dense(in_ch, use_bias=False, dtype=self.dtype, name="se_fc1")(g)
        g = gelu_exact(g)
        g = nn.Dense(in_ch, use_bias=False, dtype=self.dtype, name="se_fc2")(g)
        g = nn.sigmoid(g)
        x = x * g + x
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj_fc1")(x)
        x = gelu_exact(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="proj_fc2")(x)


class CAbstractor(nn.Module):
    """Convolutional abstractor (reference projectors.py:84-122): ResNet-style
    conv blocks around a stride-2 downsample on the token grid. NHWC layout."""

    hidden_size: int
    depth: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        b, n, c = tokens.shape
        side = int(n ** 0.5)
        x = tokens.reshape(b, side, side, c)

        def res_block(x, name):
            h = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"{name}_ln")(h)
            return x + nn.silu(h)

        for i in range(self.depth):
            x = res_block(x, f"pre_{i}")
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for i in range(self.depth):
            x = res_block(x, f"post_{i}")
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="readout")(x)
        return x.reshape(b, -1, self.hidden_size)


def build_projector_module(config, dtype=jnp.float32, name: str = "mm_projector"):
    """Dispatch like the reference build_vision_projector
    (multimodal_projector/builder.py:54-78)."""
    ptype = getattr(config, "mm_projector_type", "linear")
    hidden = config.hidden_size
    if ptype == "linear":
        return LinearProjector(hidden, dtype=dtype, name=name)
    m = re.match(r"^mlp(\d+)x_gelu$", ptype)
    if m:
        return MlpGeluProjector(hidden, depth=int(m.group(1)), dtype=dtype, name=name)
    if ptype == "identity":
        return IdentityProjector(name=name)
    if ptype == "se_mlp":
        return SEMlpProjector(hidden, dtype=dtype, name=name)
    if ptype == "CAbstractor":
        return CAbstractor(hidden, dtype=dtype, name=name)
    raise ValueError(f"Unknown projector type: {ptype}")
