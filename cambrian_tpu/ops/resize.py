"""Bilinear grid resize matching ``torch.nn.functional.interpolate(...,
mode='bilinear', align_corners=False)`` semantics in fp32.

The reference leans on this in two checkpoint-critical places:
- per-tower token-count interpolation (clip_encoder.py:70-96, always fp32)
- SVA query-group upsampling to the final 24x24 grid (cambrian_arch.py:395-401)

``jax.image.resize(method='bilinear')`` uses the same half-pixel-center
convention as align_corners=False (verified by the parity test vs torch), so
this is a thin wrapper that pins fp32 accumulation and restores dtype.
"""

import jax
import jax.numpy as jnp


def _resize_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """[out, in] fp32 matrix equivalent to bilinear resize along one axis
    (extracted by resizing the identity — bilinear resize is linear)."""
    eye = jnp.eye(in_size, dtype=jnp.float32)
    return jax.image.resize(eye, (out_size, in_size), method="bilinear",
                            antialias=False)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize the two trailing-but-one spatial dims of a NHWC or HWC array.

    Args:
        x: [..., H, W, C]
        out_h, out_w: target spatial dims.

    Returns:
        [..., out_h, out_w, C] with x.dtype, computed in fp32.

    For low-precision inputs the resize runs as two fp32-accumulated einsums
    against precomputed axis matrices (bf16 values are exact in fp32, so this
    matches the cast-to-fp32-then-resize reference semantics to output
    rounding; 2.6x faster than materializing the fp32 copy —
    docs/PERF_NOTES.md).
    """
    dtype = x.dtype
    h, w = x.shape[-3], x.shape[-2]
    if dtype in (jnp.bfloat16, jnp.float16):
        wh = _resize_matrix(h, out_h)
        ww = _resize_matrix(w, out_w)
        y = jnp.einsum("hH,...Hwc->...hwc", wh, x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("wW,...hWc->...hwc", ww, y,
                       preferred_element_type=jnp.float32)
        return y.astype(dtype)
    shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    y = jax.image.resize(x.astype(jnp.float32), shape, method="bilinear",
                         antialias=False)
    return y.astype(dtype)


def interpolate_tokens(tokens: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Resample a square token grid [..., N, C] to [..., target_len, C] via
    fp32 bilinear interpolation (clip_encoder.py:70-96 semantics)."""
    n = tokens.shape[-2]
    side = int(n ** 0.5)
    assert side * side == n, f"token count {n} is not a square grid"
    target_side = int(target_len ** 0.5)
    assert target_side * target_side == target_len, f"target {target_len} not square"
    if side == target_side:
        return tokens
    grid = tokens.reshape(tokens.shape[:-2] + (side, side, tokens.shape[-1]))
    grid = resize_bilinear(grid, target_side, target_side)
    return grid.reshape(tokens.shape[:-2] + (target_len, tokens.shape[-1]))
