"""Normalization ops with the fp32-upcast discipline the reference enforces on
TPU (train_fsdp.py:1428-1438 replaces HF's RMSNorm with an fp32 version, and
Conv/Linear bias dtypes are harmonized at :1440-1452). Computing the variance
in bf16 silently destroys 34B-scale training; these helpers always reduce in
fp32 and cast back to the input dtype.

Includes a fused single-pass Pallas LayerNorm for the TPU hot path: XLA lowers
the fp32-stat LayerNorm into separate convert/reduce + normalize kernels that
materialize fp32 intermediates in HBM (~87ms of the bs=8 4-tower encode —
docs/PERF_NOTES.md); the fused kernel reads the bf16 activations once, keeps
the fp32 statistics in VMEM, and writes the normalized bf16 output once.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm with fp32 accumulation: y = x / rms(x) * weight."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    variance = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jnp.reciprocal(jnp.sqrt(variance + eps))
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 accumulation."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


# ---------------------------------------------------------------------------
# Fused single-pass LayerNorm (Pallas, TPU)
# ---------------------------------------------------------------------------

_LN_BLOCK_ROWS = 256


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * w_ref[...] + b_ref[...]).astype(o_ref.dtype)


def _ln_pallas(x2, w, b, eps, interpret):
    r, c = x2.shape
    block_r = min(_LN_BLOCK_ROWS, max(8, -(-r // 8) * 8))
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(r, block_r),),
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
        interpret=interpret,
    )(x2, w.reshape(1, c).astype(jnp.float32), b.reshape(1, c).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln(x2, w, b, eps, interpret):
    return _ln_pallas(x2, w, b, eps, interpret)


def _fused_ln_fwd(x2, w, b, eps, interpret):
    return _ln_pallas(x2, w, b, eps, interpret), (x2, w)


def _fused_ln_bwd(eps, interpret, res, g):
    # Standard LayerNorm backward in fp32, recomputing the statistics from the
    # saved input (memory-bound either way; saving fp32 stats would not help).
    x2, w = res
    x = x2.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    gw = gf * w.astype(jnp.float32)
    m1 = jnp.mean(gw, axis=-1, keepdims=True)
    m2 = jnp.mean(gw * xhat, axis=-1, keepdims=True)
    dx = (inv * (gw - m1 - xhat * m2)).astype(x2.dtype)
    dw = jnp.sum(gf * xhat, axis=0).astype(w.dtype)
    db = jnp.sum(gf, axis=0).astype(w.dtype)
    return dx, dw, db


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                     eps: float = 1e-5, *, interpret: bool = False) -> jnp.ndarray:
    """LayerNorm over the trailing axis, fused into one HBM pass on TPU.

    Falls back to the XLA `layer_norm` off-TPU (tests run on the CPU mesh) and
    for feature dims that don't tile the (8, 128) VREG layout. Numerics match
    `layer_norm` (fp32 statistics AND fp32 normalize/affine), which is slightly
    tighter than flax's ``nn.LayerNorm(dtype=bf16)`` (fp32 stats, bf16 affine).
    """
    c = x.shape[-1]
    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or interpret) or c % 128 != 0:
        return layer_norm(x, weight, bias, eps)
    y = _fused_ln(x.reshape(-1, c), weight, bias, eps, interpret)
    return y.reshape(x.shape)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm(epsilon=, dtype=, name=)`` on the trailing
    axis: same param names ("scale"/"bias", fp32) and shapes, so checkpoint
    converters and sharding rules are unchanged; routes to the fused Pallas
    kernel on TPU."""

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return fused_layer_norm(x, scale, bias, self.epsilon)


# ---------------------------------------------------------------------------
# Streaming LayerNorm (jnp-level, no fp32 materialization)
# ---------------------------------------------------------------------------


def _ln_stats_vpu(x: jnp.ndarray):
    """One-pass fp32 (mean, mean-of-squares) on the VPU (lane-dim reduce)."""
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=-1, keepdims=True)
    s2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return s1, s2


def _ln_stats_mxu(x: jnp.ndarray):
    """fp32 (mean, mean-of-squares) via two dots against a ones matrix.

    Measured and SHELVED (r3, default off): wins the microbenchmark (1.4x
    standalone, ~11% on an isolated LN+GEMM pair at the ConvNeXt stage-2
    shape — scripts/perf/ln_stats_exp.py) but regresses the full tower 0.8%
    (437.9 vs 434.6 ms/iter bs=8): in the real graph the stats fusion also
    carries the dwconv relayout copy and the normalize rides the GEMM
    prologue, and splitting stats into dot ops breaks that shared pass.
    Kept as tested infra (tests/test_norms_stream.py); enable explicitly
    with CAMBRIAN_LN_DOT_STATS=1. The squares are computed in fp32 as a
    fused producer of the second dot, so the statistics match the VPU
    one-pass form to fp32 summation order.
    """
    c = x.shape[-1]
    rows_shape = x.shape[:-1]
    x2 = x.reshape(-1, c)
    dims = (((1,), (0,)), ((), ()))
    s1 = jax.lax.dot_general(
        x2, jnp.ones((c, 8), x2.dtype), dims,
        preferred_element_type=jnp.float32)[:, :1] / c
    xf = x2.astype(jnp.float32)
    s2 = jax.lax.dot_general(
        xf * xf, jnp.ones((c, 8), jnp.float32), dims,
        preferred_element_type=jnp.float32)[:, :1] / c
    return (s1.reshape(rows_shape + (1,)), s2.reshape(rows_shape + (1,)))


def _use_mxu_stats(c: int) -> bool:
    import os

    mode = os.environ.get("CAMBRIAN_LN_DOT_STATS", "0")
    return mode == "1" and c % 128 == 0


def layer_norm_stream(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                      eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm with fp32 statistics that never materializes the fp32 input.

    Plain flax LayerNorm makes XLA store the fp32-converted activations in
    HBM (one consumer is the stats reduce, another the normalize epilogue):
    ~25 ms/iter of pure f32 copies in the ConvNeXt tower at bs=8
    (docs/PERF_NOTES.md round-2 profile). Here the stats are a single fused
    pass over the bf16 input (convert folded into the reduce) and the
    normalize re-converts behind an optimization_barrier, so its convert
    cannot CSE with the stats convert and fuses into the consumer (usually a
    GEMM prologue) reading bf16 from HBM.

    CAMBRIAN_LN_DOT_STATS=1 routes the statistics through the MXU
    (``_ln_stats_mxu`` — measured and shelved, see its docstring); numerics
    are fp32 either way (only fp32 summation order differs between paths).
    Variance uses the one-pass E[x^2]-E[x]^2 form in fp32; for LN-scale
    activations (|mean|/std well under 1e3) the cancellation error is far
    below bf16 output resolution (tests/test_norms_stream.py asserts 1-ulp
    agreement with the two-pass fp32 reference).
    """
    if _use_mxu_stats(x.shape[-1]):
        s1, s2 = _ln_stats_mxu(x)
    else:
        s1, s2 = _ln_stats_vpu(x)
    rstd = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + eps)
    xn = jax.lax.optimization_barrier(x).astype(jnp.float32)
    y = (xn - s1) * rstd * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class StreamLayerNorm(nn.Module):
    """Drop-in for nn.LayerNorm (same param names/shapes: scale, bias)."""

    epsilon: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return layer_norm_stream(x, scale, bias, self.epsilon)


def layer_norm_into_dense(x: jnp.ndarray, ln_scale: jnp.ndarray,
                          ln_bias: jnp.ndarray, kernel: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          eps: float = 1e-6,
                          compute_dtype: Optional[jnp.dtype] = None
                          ) -> jnp.ndarray:
    """``Dense(LayerNorm(x))`` with the normalize folded THROUGH the GEMM.

    With per-row fp32 stats mu, r = rsqrt(var + eps) and W' = gamma ∘ W
    (column-scaled kernel):

        LN(x) @ W + b = r·(x @ W') − (r·mu)·colsum(W') + beta @ W + b

    so the GEMM consumes the RAW bf16 activations — the per-element
    normalize work leaves the GEMM prologue entirely (layer_norm_stream's
    normalize fuses there and taxes the MXU pipeline; stage-0 ConvNeXt
    double-GEMM fusions measured 65% MXU, docs/PERF_NOTES.md r3 profile) —
    and the correction is two per-row fp32 scalars against two [N] vectors,
    fused into the GEMM epilogue. Weight-sized preprocessing (gamma ∘ W and
    its column sums) is O(C·N), negligible against the O(rows·C·N) GEMM.

    Numerics: statistics are fp32 (repo discipline); the GEMM rounds RAW x
    to bf16 instead of the normalized x-hat, a same-magnitude rounding. The
    E[x]·colsum correction subtracts in fp32; cancellation only matters when
    |mean| >> std, where LN itself is ill-conditioned
    (tests/test_norms_stream.py gates parity).
    """
    dtype = compute_dtype or x.dtype
    s1, s2 = _ln_stats_vpu(x)                                    # [rows, 1]
    r = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + eps)      # [rows, 1]
    w32 = kernel.astype(jnp.float32)
    wg = ln_scale.astype(jnp.float32)[:, None] * w32             # [C, N]
    colsum = jnp.sum(wg, axis=0)                                 # [N]
    const = ln_bias.astype(jnp.float32) @ w32                    # [N]
    if bias is not None:
        const = const + bias.astype(jnp.float32)
    y = jax.lax.dot_general(
        jax.lax.optimization_barrier(x).astype(dtype), wg.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y * r - (r * s1) * colsum + const
    return y.astype(dtype)


class LayerNormParams(nn.Module):
    """Parameter holder matching StreamLayerNorm/nn.LayerNorm's tree
    ({scale, bias}, fp32) for call sites that consume the params directly
    (layer_norm_into_dense) — checkpoints see an identical structure."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,),
                           jnp.float32))


class DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias}, fp32,
    lecun_normal/zeros init) for fused call sites."""

    in_dim: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias
