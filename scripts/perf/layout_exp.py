"""ConvNeXt block-stack layout experiment: kill the relayout copies around
the dwconv.

The encode trace shows the conv emitter picks layout {3,0,2,1} (memory order
h, w, b, c — batch in the sublane dim, 8 batches = 8 sublanes) while the
flattened GEMM form wants rows=(b*h*w): every block pays relayout copies
(copy_add_fusion / convert_reduce's fused copy, ~1-2 ms each at stage 0/1).

If we flatten in the conv's own memory order — transpose(1,2,0,3) then
reshape to [h*w*b, c] — the flatten/unflatten become bitcasts and the
residual add happens in-layout. LN/GEMM/gelu are row-order invariant, so
numerics are identical.

Usage: python scripts/perf/layout_exp.py <stage> <variant> [n_blocks]
  stage: 0|1|2|3
  variant: base   — current block (reshape b*h*w)
           trans  — transpose(1,2,0,3)-flatten inside each block
           carry  — carry the residual flat in [h*w*b, c] across the whole
                    stack; reshape to 4-D only around each dwconv
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from cambrian_tpu.ops.activations import gelu_exact
from cambrian_tpu.ops.norms import StreamLayerNorm

STAGES = {  # (n_blocks, side, dim)  bs=8, XXL@1024
    0: (3, 256, 384),
    1: (4, 128, 768),
    2: (30, 64, 1536),
    3: (3, 32, 3072),
}


class Block(nn.Module):
    dim: int
    variant: str = "base"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, kernel_size=(7, 7), padding=3,
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="dwconv")(x)
        b, hh, ww, c = h.shape
        if self.variant == "trans":
            h = h.transpose(1, 2, 0, 3).reshape(hh * ww * b, c)
        else:
            h = h.reshape(b * hh * ww, c)
        h = StreamLayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = gelu_exact(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        h = h * gamma.astype(h.dtype)
        if self.variant == "trans":
            h = h.reshape(hh, ww, b, c).transpose(2, 0, 1, 3)
        else:
            h = h.reshape(b, hh, ww, c)
        return x + h


class BlockFlatCarry(nn.Module):
    """Residual carried flat in [h*w*b, c]; only the dwconv sees 4-D."""

    dim: int
    side: int
    batch: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xf):
        s, b, c = self.side, self.batch, self.dim
        x4 = xf.reshape(s, s, b, c).transpose(2, 0, 1, 3)
        h = nn.Conv(c, kernel_size=(7, 7), padding=3, feature_group_count=c,
                    dtype=self.dtype, name="dwconv")(x4)
        h = h.transpose(1, 2, 0, 3).reshape(s * s * b, c)
        h = StreamLayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * c, dtype=self.dtype, name="pwconv1")(h)
        h = gelu_exact(h)
        h = nn.Dense(c, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        return xf + h * gamma.astype(h.dtype)


def main():
    stage = int(sys.argv[1])
    variant = sys.argv[2]
    n_blocks, side, dim = STAGES[stage]
    if len(sys.argv) > 3:
        n_blocks = int(sys.argv[3])
    batch = 8
    dtype = jnp.bfloat16

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            if variant == "carry":
                b, hh, ww, c = x.shape
                x = x.transpose(1, 2, 0, 3).reshape(hh * ww * b, c)
                for i in range(n_blocks):
                    x = BlockFlatCarry(dim, side, batch, dtype=dtype,
                                       name=f"b{i}")(x)
                return x.reshape(hh, ww, b, c).transpose(2, 0, 1, 3)
            for i in range(n_blocks):
                x = Block(dim, variant=variant, dtype=dtype, name=f"b{i}")(x)
            return x

    model = Stack()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, side, side, dim), np.float32),
                    dtype)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)["params"]
    leaves, treedef = jax.tree.flatten(shapes)
    key = jax.random.PRNGKey(7)
    params = {"params": jax.tree.unflatten(treedef, [
        0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape, dtype)
        for i, s in enumerate(leaves)])}
    fwd = jax.jit(lambda p, x: model.apply(p, x))

    out = fwd(params, x); np.asarray(out.ravel()[0])
    out = fwd(params, x); jax.block_until_ready(out)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = fwd(params, x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(times))
    tf = n_blocks * 2 * 2 * (batch * side * side) * dim * 4 * dim / 1e12
    print(f"stage{stage} {variant} x{n_blocks}: {ms:.2f} ms  "
          f"{1000 * tf / ms:.0f} TF/s ({100 * tf / ms * 1000 / 197:.0f}% of "
          f"peak, GEMM flops only)", flush=True)


if __name__ == "__main__":
    main()
