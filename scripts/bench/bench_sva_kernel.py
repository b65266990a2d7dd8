"""Micro-benchmark: fused Pallas windowed cross-attention vs the jnp einsum
form at SVA shapes (connector: B=8 Q=576 W=19 H=16 D=64; in-LLM injection at
train batch: B=32). Run on the TPU; results recorded in docs/PERF_NOTES.md."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.attention import windowed_cross_attention
from cambrian_tpu.ops.sva_attention import fused_windowed_cross_attention

ITERS = 30


def bench(fn, *args):
    from functools import partial

    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out)          # first-run flush through the axon tunnel
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    rng = np.random.default_rng(0)
    results = {}
    for tag, b, q, w, h, d in [
        ("connector_bs8", 8, 576, 19, 16, 64),
        ("train_bs32", 32, 576, 19, 16, 64),
        ("inject_bs8_10layers", 8, 576, 19, 16, 64),
    ]:
        reps = 10 if "10layers" in tag else 1
        qa = jnp.asarray(rng.standard_normal((b, q, h, d)), jnp.bfloat16)
        ka = jnp.asarray(rng.standard_normal((b, q, w, h, d)), jnp.bfloat16)
        va = jnp.asarray(rng.standard_normal((b, q, w, h, d)), jnp.bfloat16)
        mask = jnp.asarray(rng.random((b, q, w)) > 0.1)

        def ref(qa, ka, va, mask):
            out = qa
            for _ in range(reps):
                out = windowed_cross_attention(out, ka, va, mask)
            return out

        def fused(qa, ka, va, mask):
            out = qa
            for _ in range(reps):
                out = fused_windowed_cross_attention(out, ka, va, mask)
            return out

        t_ref = bench(ref, qa, ka, va, mask)
        t_fused = bench(fused, qa, ka, va, mask)
        results[tag] = {"einsum_ms": round(t_ref, 3),
                        "pallas_ms": round(t_fused, 3),
                        "speedup": round(t_ref / t_fused, 2)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
