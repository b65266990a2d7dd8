"""Microbenchmark: ConvNeXt block stack GEMM scheduling variants.

The profile (parse_xplane on /tmp/cnx_trace) shows XLA fusing the fp32-stat
LayerNorm normalize into the pwconv GEMM prologue; stage-0 runs at ~40% MXU,
stage-2 at ~64%. Variants test optimization_barrier placement to force the
LN (and gelu) to materialize so the GEMMs run clean.

Usage: python scripts/perf/block_exp.py <stage> <variant>
  stage: 0|1|2|3  (stage-2 = 30 blocks @64x64x1536 dominates: 73% of FLOPs)
  variant: base | bln | bgelu | bboth
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

STAGES = {  # (n_blocks, side, dim)  bs=8, XXL@1024
    0: (3, 256, 384),
    1: (4, 128, 768),
    2: (30, 64, 1536),
    3: (3, 32, 3072),
}


class Block(nn.Module):
    dim: int
    barrier_ln: bool = False
    barrier_gelu: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, kernel_size=(7, 7), padding=3,
                    feature_group_count=self.dim, dtype=self.dtype, name="dwconv")(x)
        b, hh, ww, c = h.shape
        h = h.reshape(b * hh * ww, c)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        if self.barrier_ln:
            h = jax.lax.optimization_barrier(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        if self.barrier_gelu:
            h = jax.lax.optimization_barrier(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        return x + (h * gamma.astype(h.dtype)).reshape(b, hh, ww, c)


class Stack(nn.Module):
    n: int
    dim: int
    barrier_ln: bool = False
    barrier_gelu: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = Block(self.dim, self.barrier_ln, self.barrier_gelu,
                      name=f"b{i}")(x)
        return x


def main():
    stage = int(sys.argv[1])
    variant = sys.argv[2]
    n, side, dim = STAGES[stage]
    bln = variant in ("bln", "bboth")
    bgelu = variant in ("bgelu", "bboth")

    mod = Stack(n, dim, bln, bgelu)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, side, side, dim), dtype=np.float32), jnp.bfloat16)
    shapes = jax.eval_shape(mod.init, jax.random.PRNGKey(0), x)["params"]
    leaves, treedef = jax.tree.flatten(shapes)
    key = jax.random.PRNGKey(1)
    params = {"params": jax.tree.unflatten(
        treedef, [0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape, s.dtype)
                  for i, s in enumerate(leaves)])}
    fwd = jax.jit(lambda p, x: mod.apply(p, x))

    out = fwd(params, x); np.asarray(out[0, 0, 0])
    out = fwd(params, x); jax.block_until_ready(out)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = fwd(params, x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(times))
    gemm_tf = 2 * 2 * (8 * side * side) * dim * (4 * dim) * n / 1e12
    print(f"stage{stage} {variant}: {ms:.1f} ms  GEMM {gemm_tf:.2f} TF -> "
          f"{1000*gemm_tf/ms:.0f} TF/s ({100*gemm_tf/ms*1000/197:.0f}% MXU incl. dw/LN)")


if __name__ == "__main__":
    main()
