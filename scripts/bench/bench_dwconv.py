"""Micro-benchmark: Pallas row-major dwconv vs XLA grouped conv at
ConvNeXt-XXL stage shapes (bs=8 @1024 input). The XLA baseline includes the
layout flips a real block pays (conv between two row-major GEMM tensors),
measured by forcing row-major in/out via a dummy elementwise op chain."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.dwconv import depthwise_conv7x7

ITERS = 20

STAGES = [  # (H=W, C, blocks) per ConvNeXt-XXL @1024
    (256, 384, 3),
    (128, 768, 4),
    (64, 1536, 30),
    (32, 3072, 3),
]


def bench(fn, *args):
    f = jax.jit(fn)
    np.asarray(f(*args))
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    rng = np.random.default_rng(0)
    results = {}
    for hw, c, blocks in STAGES:
        x = jnp.asarray(rng.standard_normal((8, hw, hw, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((7, 7, c)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(c), jnp.float32)

        def xla(x, w, bias):
            # row-major in, row-major consumer (mimic the block: conv output
            # feeds a flattened GEMM-side op)
            out = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype)[:, :, None, :], (1, 1),
                [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
            out = out + bias.astype(out.dtype)
            return (out.reshape(-1, c) * 1.0001).sum(0)

        def pallas(x, w, bias):
            out = depthwise_conv7x7(x, w, bias)
            return (out.reshape(-1, c) * 1.0001).sum(0)

        t_x = bench(xla, x, w, bias)
        t_p = bench(pallas, x, w, bias)
        results[f"stage_{hw}x{c}"] = {
            "xla_ms": round(t_x, 3), "pallas_ms": round(t_p, 3),
            "speedup": round(t_x / t_p, 2), "blocks": blocks,
        }
    results["projected_saving_ms_per_batch"] = round(sum(
        (v["xla_ms"] - v["pallas_ms"]) * v["blocks"]
        for v in results.values() if isinstance(v, dict) and "blocks" in v), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
