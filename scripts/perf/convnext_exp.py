"""ConvNeXt-XXL@1024 tower perf experiments (one TPU chip, bf16).

Usage: python scripts/perf/convnext_exp.py <variant> [batch]
Variants: baseline, bs16, profile
Times the tower-only forward (stages -> resize -> concat tokens).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cambrian_tpu.models.encoders.convnext import ConvNeXtTokens, convnext_xxl


def bench(fn, args, iters=7, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])  # flush first exec (axon)
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(times))
    print(f"{label}: {ms:.1f} ms/iter  ({sorted(round(1000*t,1) for t in times)})")
    return ms


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16

    cfg = convnext_xxl()
    tower = ConvNeXtTokens(cfg, interp_side=96, dtype=dtype)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((batch, 3, 1024, 1024), dtype=np.float32), dtype)

    shapes = jax.eval_shape(tower.init, jax.random.PRNGKey(0), px)["params"]
    leaves, treedef = jax.tree.flatten(shapes)
    key = jax.random.PRNGKey(7)
    params = {"params": jax.tree.unflatten(
        treedef,
        [0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape, dtype)
         for i, s in enumerate(leaves)])}

    fwd = jax.jit(lambda p, x: tower.apply(p, x))

    if variant == "profile":
        out = fwd(params, px); np.asarray(out[0, 0])
        out = fwd(params, px); jax.block_until_ready(out)
        from cambrian_tpu.profiling import trace
        with trace("/tmp/cnx_trace"):
            for _ in range(3):
                out = fwd(params, px)
            jax.block_until_ready(out)
        print("trace written to /tmp/cnx_trace")
        return

    ms = bench(fwd, (params, px), label=f"convnext {variant} bs{batch}")
    print(f"images/sec: {batch / (ms / 1000):.2f}")


if __name__ == "__main__":
    main()
