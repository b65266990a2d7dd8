"""Decompose stage-2 ConvNeXt block cost: pure GEMM pair stack, dwconv-only
stack, LN-only, gelu-only. Usage: python scripts/perf/piece_exp.py <piece>
piece: gemms | dwconv | ln | gelu | gemms_nogelu
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

N_BLOCKS, SIDE, DIM = 30, 64, 1536
ROWS = 8 * SIDE * SIDE


def bench(fwd, params, x, label, flops_tf=None):
    out = fwd(params, x); np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    out = fwd(params, x); jax.block_until_ready(out)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = fwd(params, x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(times))
    extra = f"  {1000*flops_tf/ms:.0f} TF/s ({100*flops_tf/ms*1000/197:.0f}%)" if flops_tf else ""
    print(f"{label}: {ms:.1f} ms{extra}")


class GemmStack(nn.Module):
    gelu: bool = True

    @nn.compact
    def __call__(self, x):  # x: [ROWS, DIM] bf16
        for i in range(N_BLOCKS):
            h = nn.Dense(4 * DIM, dtype=jnp.bfloat16, name=f"pw1_{i}")(x)
            if self.gelu:
                h = nn.gelu(h, approximate=False)
            h = nn.Dense(DIM, dtype=jnp.bfloat16, name=f"pw2_{i}")(h)
            x = x + h
        return x


class DwStack(nn.Module):
    @nn.compact
    def __call__(self, x):  # x: [8, SIDE, SIDE, DIM]
        for i in range(N_BLOCKS):
            x = x + nn.Conv(DIM, kernel_size=(7, 7), padding=3,
                            feature_group_count=DIM, dtype=jnp.bfloat16,
                            name=f"dw_{i}")(x)
        return x


class LnStack(nn.Module):
    @nn.compact
    def __call__(self, x):  # [ROWS, DIM]
        for i in range(N_BLOCKS):
            x = x + nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16, name=f"ln_{i}")(x)
        return x


def rand_params(mod, x):
    shapes = jax.eval_shape(mod.init, jax.random.PRNGKey(0), x)["params"]
    leaves, treedef = jax.tree.flatten(shapes)
    key = jax.random.PRNGKey(1)
    return {"params": jax.tree.unflatten(
        treedef, [0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape, s.dtype)
                  for i, s in enumerate(leaves)])}


def main():
    piece = sys.argv[1]
    rng = np.random.default_rng(0)
    if piece in ("gemms", "gemms_nogelu", "ln"):
        x = jnp.asarray(rng.standard_normal((ROWS, DIM), dtype=np.float32), jnp.bfloat16)
    else:
        x = jnp.asarray(rng.standard_normal((8, SIDE, SIDE, DIM), dtype=np.float32), jnp.bfloat16)

    if piece == "gelu":
        h = jnp.asarray(rng.standard_normal((ROWS, 4 * DIM), dtype=np.float32), jnp.bfloat16)
        f = jax.jit(lambda h: sum(
            [jnp.sum(nn.gelu(h + i * 0.001, approximate=False), axis=-1) for i in range(N_BLOCKS)]))
        bench(lambda p, x: f(x), None, h, f"gelu x{N_BLOCKS}")
        return

    mod = {"gemms": GemmStack(True), "gemms_nogelu": GemmStack(False),
           "dwconv": DwStack(), "ln": LnStack()}[piece]
    params = rand_params(mod, x)
    fwd = jax.jit(lambda p, x: mod.apply(p, x))
    tf = 37.11 if piece.startswith("gemms") else None
    bench(fwd, params, x, f"{piece} x{N_BLOCKS}", tf)


def fused_stack(block_m, block_n):
    from cambrian_tpu.ops.fused_mlp import fused_mlp
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, DIM), dtype=np.float32), jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    w1s = [0.02 * jax.random.normal(jax.random.fold_in(key, 2 * i), (DIM, 4 * DIM), jnp.bfloat16) for i in range(N_BLOCKS)]
    w2s = [0.02 * jax.random.normal(jax.random.fold_in(key, 2 * i + 1), (4 * DIM, DIM), jnp.bfloat16) for i in range(N_BLOCKS)]

    @jax.jit
    def f(x, w1s, w2s):
        for w1, w2 in zip(w1s, w2s):
            x = x + fused_mlp(x, w1, None, w2, None, block_m=block_m, block_n=block_n)
        return x
    bench(lambda p, args: f(*args), None, (x, w1s, w2s), f"fused_mlp bm{block_m} bn{block_n} x{N_BLOCKS}", 37.11)


def cheap_gelu_stack():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, DIM), dtype=np.float32), jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    w1s = [0.02 * jax.random.normal(jax.random.fold_in(key, 2 * i), (DIM, 4 * DIM), jnp.bfloat16) for i in range(N_BLOCKS)]
    w2s = [0.02 * jax.random.normal(jax.random.fold_in(key, 2 * i + 1), (4 * DIM, DIM), jnp.bfloat16) for i in range(N_BLOCKS)]

    def erf_poly(v):
        p = 0.3275911
        a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
        sign = jnp.sign(v); av = jnp.abs(v)
        t = 1.0 / (1.0 + p * av)
        poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
        return sign * (1.0 - poly * jnp.exp(-av * av))

    @jax.jit
    def f(x, w1s, w2s):
        for w1, w2 in zip(w1s, w2s):
            h = (x @ w1).astype(jnp.float32)
            h = (0.5 * h * (1.0 + erf_poly(h * 0.7071067811865476))).astype(x.dtype)
            x = x + h @ w2
        return x
    bench(lambda p, args: f(*args), None, (x, w1s, w2s), f"cheap_erf_gelu x{N_BLOCKS}", 37.11)


if __name__ == "__main__":
    if sys.argv[1] == "fused":
        fused_stack(int(sys.argv[2]), int(sys.argv[3]))
    elif sys.argv[1] == "cheapgelu":
        cheap_gelu_stack()
    else:
        main()
