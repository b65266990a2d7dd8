"""LayerNorm statistics micro-experiment: the bs=8 encode spends ~86 ms/iter
in convert+reduce fusions (LN stats on the VPU, lane-dim reductions). Compare:

  v0 stream : current layer_norm_stream (fp32 one-pass stats on VPU)
  v1 mxu    : stats via dot-with-ones on the MXU (bf16 squares, fp32 accum),
              normalize epilogue unchanged
  v2 mxu32  : like v1 but squares computed in fp32 (exact-ish, slower matmul)

Each timed standalone AND followed by the consuming GEMM (the fusion context
that matters). Shapes = the four ConvNeXt stages + two ViT widths at bs=8.

Usage: python scripts/perf/ln_stats_exp.py [shape_idx] [iters]
(one shape per process — compiling all six in one script exceeds the tunnel's
practical timeout; CLAUDE.md "split scripts")
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.norms import layer_norm_stream

SHAPES = [  # (rows, C) at bs=8
    (8 * 256 * 256, 384),    # cnx stage-0
    (8 * 128 * 128, 768),    # cnx stage-1
    (8 * 64 * 64, 1536),     # cnx stage-2 (x30 blocks)
    (8 * 32 * 32, 3072),     # cnx stage-3
    (8 * 729, 1152),         # siglip tokens
    (8 * 1370, 1536),        # dinov2 tokens
]


def ln_mxu(x, w, b, eps=1e-6, square_dtype=None):
    """LN with MXU statistics: s1/s2 via one [rows, 2C] @ [2C, 8] matmul
    against a block-selector (col 0 sums the x half, col 1 the x^2 half),
    fp32 accumulation on the MXU."""
    c = x.shape[-1]
    sq = (x.astype(jnp.float32) * x.astype(jnp.float32))
    sq = sq.astype(square_dtype or x.dtype)
    aug = jnp.concatenate([x, sq], axis=-1)          # [rows, 2C]
    sel = jnp.zeros((2 * c, 8), aug.dtype)
    sel = sel.at[:c, 0].set(1).at[c:, 1].set(1)
    sums = jax.lax.dot_general(aug, sel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    s1 = sums[:, :1] / c
    s2 = sums[:, 1:2] / c
    rstd = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + eps)
    xn = jax.lax.optimization_barrier(x).astype(jnp.float32)
    y = (xn - s1) * rstd * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)


def ln_mxu2(x, w, b, eps=1e-6, square_dtype=None):
    """LN with MXU statistics, no concat: two dots against a [C, 8] ones
    matrix; the x^2 for the second dot is an elementwise producer XLA can
    fuse into the dot read (no [rows, 2C] materialization). With
    square_dtype=fp32 the squares are exact (identical numerics to the
    stream LN's fp32 one-pass stats)."""
    c = x.shape[-1]
    dims = (((1,), (0,)), ((), ()))
    ones = jnp.ones((c, 8), x.dtype)
    s1 = jax.lax.dot_general(x, ones, dims,
                             preferred_element_type=jnp.float32)[:, :1] / c
    xs = x.astype(square_dtype) if square_dtype is not None else x
    s2 = jax.lax.dot_general(
        xs * xs, jnp.ones((c, 8), xs.dtype), dims,
        preferred_element_type=jnp.float32)[:, :1] / c
    rstd = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + eps)
    xn = jax.lax.optimization_barrier(x).astype(jnp.float32)
    y = (xn - s1) * rstd * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)


def bench(fn, args, iters):
    out = fn(*args)
    np.asarray(out if not isinstance(out, tuple) else out[0])  # warm + flush
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times)) * 1000


def main():
    idx = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rng = np.random.default_rng(0)
    print(f"{'shape':>18} {'v0_stream':>10} {'v1_mxu':>10} {'v2_mxu32':>10}"
          f" {'+gemm v0':>10} {'+gemm v1':>10}", flush=True)
    for rows, c in SHAPES[idx:idx + 1]:
        x = jnp.asarray(rng.standard_normal((rows, c)).astype(np.float32) * 0.7
                        + 0.3, jnp.bfloat16)
        w = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        wg = jnp.asarray(rng.standard_normal((c, 4 * c)).astype(np.float32)
                         * 0.02, jnp.bfloat16)

        f0 = jax.jit(lambda x, w, b: layer_norm_stream(x, w, b))
        f1 = jax.jit(lambda x, w, b: ln_mxu2(x, w, b, square_dtype=jnp.float32))
        g0 = jax.jit(lambda x, w, b, wg: layer_norm_stream(x, w, b) @ wg)
        g1 = jax.jit(lambda x, w, b, wg: ln_mxu2(
            x, w, b, square_dtype=jnp.float32) @ wg)

        t0 = bench(f0, (x, w, b), iters)
        t1 = bench(f1, (x, w, b), iters)
        tg0 = bench(g0, (x, w, b, wg), max(4, iters // 4))
        tg1 = bench(g1, (x, w, b, wg), max(4, iters // 4))
        # numerics: relative error vs the exact two-pass fp32 reference
        from cambrian_tpu.ops.norms import layer_norm
        ref = np.asarray(layer_norm(np.asarray(x, np.float32), np.asarray(w),
                                    np.asarray(b)))
        gotten = np.asarray(f1(x, w, b), np.float32)
        rel = np.abs(gotten - ref).max() / np.abs(ref).max()
        print(f"{rows}x{c:>5} {t0:10.3f} {t1:10.3f} {'-':>10} {tg0:10.3f}"
              f" {tg1:10.3f}   maxrel_v1={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
