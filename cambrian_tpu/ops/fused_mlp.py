"""Fused 2-layer MLP Pallas kernel: out = gelu(x @ W1 + b1) @ W2 + b2.

The ConvNeXt tower's pointwise GEMM pair is 72% of the 4-tower encode
(docs/PERF_NOTES.md); XLA materializes the [M, 4C] intermediate in HBM
between the two matmuls. This kernel keeps the expansion blocked in VMEM:
grid over (M blocks, 4C blocks), each program computes a [bm, bn] slab of
the hidden layer, applies GELU in-register, multiplies by the matching W2
stripe on the MXU, and accumulates into the output block (sequential inner
grid dimension).

Also applicable to ViT MLPs (encoders/vit.py) and any gelu MLP pair.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7, far below bf16
    resolution); Mosaic has no erf/erfc lowering."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _fused_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    x = x_ref[0]               # [bm, C]
    w1 = w1_ref[0]             # [C, bn]
    b1 = b1_ref[0]             # [1, bn]
    h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    h = (0.5 * h * (1.0 + _erf(h * 0.7071067811865476))).astype(x.dtype)
    part = jax.lax.dot_general(h, w2_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part + b2_ref[0].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _round_up(v, m):
    return (v + m - 1) // m * m


def fused_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: Optional[jnp.ndarray],
              w2: jnp.ndarray, b2: Optional[jnp.ndarray],
              block_m: int = 256, block_n: int = 512) -> jnp.ndarray:
    """x [M, C] -> gelu(x @ w1 [C, H] + b1) @ w2 [H, C2] + b2, never writing
    the [M, H] expansion to HBM. Falls back to XLA off TPU."""
    m, c = x.shape
    hdim = w1.shape[1]
    c2 = w2.shape[1]
    if b1 is None:
        b1 = jnp.zeros((hdim,), x.dtype)
    if b2 is None:
        b2 = jnp.zeros((c2,), x.dtype)

    if jax.devices()[0].platform != "tpu":
        h = jax.nn.gelu(x @ w1 + b1.astype(x.dtype), approximate=False)
        return (h @ w2 + b2.astype(x.dtype)).astype(x.dtype)

    m_pad = _round_up(m, block_m)
    h_pad = _round_up(hdim, block_n)
    c_pad = _round_up(c, 128)
    c2_pad = _round_up(c2, 128)

    xp = jnp.pad(x, ((0, m_pad - m), (0, c_pad - c)))[None]
    w1p = jnp.pad(w1, ((0, c_pad - c), (0, h_pad - hdim)))[None]
    b1p = jnp.pad(b1, (0, h_pad - hdim))[None, None]
    w2p = jnp.pad(w2, ((0, h_pad - hdim), (0, c2_pad - c2)))[None]
    b2p = jnp.pad(b2, (0, c2_pad - c2))[None, None]

    grid = (m_pad // block_m, h_pad // block_n)
    out = pl.pallas_call(
        _fused_mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, c_pad), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad, block_n), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, c2_pad), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2_pad), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_m, c2_pad), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, c2_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, c2_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * h_pad * (c_pad + c2_pad) // 2,
            bytes_accessed=(xp.size + w1p.size + w2p.size) * xp.dtype.itemsize,
            transcendentals=m_pad * h_pad,
        ),
    )(xp, w1p, b1p, w2p, b2p)
    return out[0, :m, :c2]
