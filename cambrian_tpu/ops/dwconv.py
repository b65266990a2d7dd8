"""Pallas depthwise 7x7 convolution in the row-major NHWC layout.

Why: XLA lowers ConvNeXt's depthwise convs to its conv emitter, whose
preferred layout ({3,0,2,1}) differs from the row-major layout the
surrounding GEMMs produce — every block then pays two layout flips
(profiled: ~1.2 ms copy_add per stage-2 block plus the LayerNorm stat
fusion dragging a fused transpose; docs/PERF_NOTES.md r2 profile buckets
%copy 37 ms + %copy_add 14 ms + part of %convert_reduce 86 ms per bs-8
batch). A 7x7 depthwise conv is 49 VPU multiply-adds per element — no MXU
involved — so there is nothing to gain from the conv emitter's layout: this
kernel computes it in the tensor's native row-major layout, keeping the
whole ConvNeXt block layout-stable.

Mechanics: the input stays in HBM (`pltpu.ANY`) and each grid cell DMAs an
(th+6, W+6, ct) halo'd tile into VMEM scratch (overlapping reads are not
expressible as standard BlockSpec blocks), then accumulates the 49 taps in
fp32 and writes the (th, W, ct) output tile. Backward is the standard
flipped-kernel correlation, expressed as XLA ops under ``jax.custom_vjp``
(dwconv gradients are bandwidth-trivial; only the forward sits in the hot
encode path).

Reference behavior matched: timm/ConvNeXt ``Conv2d(C, C, 7, padding=3,
groups=C)`` (clip_convnext_encoder.py's trunk), fp32 accumulation.
"""

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

K = 7
PAD = 3


def _kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *, th, w_out, ct):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + K - 1), :, pl.ds(c * ct, ct)],
        scratch, sem)
    copy.start()
    copy.wait()
    acc = jnp.zeros((th, w_out, ct), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            tile = scratch[dy:dy + th, dx:dx + w_out, :].astype(jnp.float32)
            acc += tile * w_ref[dy, dx, :][None, None, :].astype(jnp.float32)
    acc += b_ref[0, 0, :].astype(jnp.float32)[None, None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_tiles(h, c):
    th = 8
    while h % th:
        th //= 2
    ct = 512
    while c % ct:
        ct //= 2
    return max(th, 1), max(ct, 128 if c % 128 == 0 else c)


def _dwconv_fwd_impl(x, w, bias, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wd, c = x.shape
    th, ct = _pick_tiles(h, c)
    # right-pad W so the padded width is 8-aligned (DMA slices along the
    # sublane dim must match the (8, 128) tiling)
    w_extra = -(wd + 2 * PAD) % 8
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD + w_extra), (0, 0)))

    grid = (b, h // th, c // ct)
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, w_out=wd, ct=ct),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((K, K, ct), lambda bb, i, cc: (0, 0, cc)),
            pl.BlockSpec((1, 1, ct), lambda bb, i, cc: (0, 0, cc)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, ct), lambda bb, i, cc: (bb, i, 0, cc)),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + K - 1, wd + 2 * PAD + w_extra, ct), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w, bias.reshape(1, 1, c))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dwconv(x, w, bias, interpret=False):
    return _dwconv_fwd_impl(x, w, bias, interpret)


def _dwconv_fwd(x, w, bias, interpret=False):
    return _dwconv_fwd_impl(x, w, bias, interpret), (x, w)


def _dwconv_bwd(interpret, res, g):
    x, w = res
    g32 = g.astype(jnp.float32)
    # dx: correlation with the spatially-flipped kernel
    dx = jax.lax.conv_general_dilated(
        g32, jnp.flip(w.astype(jnp.float32), (0, 1))[:, :, None, :],
        window_strides=(1, 1), padding=[(PAD, PAD), (PAD, PAD)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1]).astype(x.dtype)
    # dw[dy,dx,c] = sum_{b,h,w} x_pad[b,h+dy,w+dx,c] * g[b,h,w,c]
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    h, wd = g.shape[1], g.shape[2]
    taps = []
    for dy in range(K):
        row = []
        for dxx in range(K):
            row.append(jnp.sum(xp[:, dy:dy + h, dxx:dxx + wd, :] * g32,
                               axis=(0, 1, 2)))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)
    db = jnp.sum(g32, axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


_dwconv.defvjp(_dwconv_fwd, _dwconv_bwd)


def depthwise_conv7x7(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """x [B,H,W,C] (row-major), w [7,7,C], bias [C] -> [B,H,W,C], SAME
    padding, stride 1, fp32 accumulation. Pallas on TPU, XLA elsewhere."""
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        return (jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32)[:, :, None, :],
            window_strides=(1, 1), padding=[(PAD, PAD), (PAD, PAD)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1]) +
            bias.astype(jnp.float32)[None, None, None, :]).astype(x.dtype)
    return _dwconv(x, w, bias, interpret)
