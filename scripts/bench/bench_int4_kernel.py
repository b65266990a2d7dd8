"""int4 dequant-matmul kernel A/B (r4): v1 (even/odd shift unpack) vs v2
(pltpu.bitcast int4 convert) vs int8, at 13B decoder GEMM shapes.

Protocol: warm + host fetch, then N enqueues + one block (CLAUDE.md)."""
import os
import time

import numpy as np


def run():
    import jax
    import jax.numpy as jnp

    from cambrian_tpu.ops import quant

    rng = np.random.default_rng(0)
    shapes = [(16, 5120, 5120), (256, 5120, 13824), (704, 13824, 5120)]
    ITERS = 20
    for m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
        wq, s = quant.quantize_int4(w)
        wq8, s8 = quant.quantize_int8(w)
        ref = np.asarray(
            (x.astype(jnp.float32) @ quant.dequantize_int4(wq, s, jnp.float32)),
            np.float32)

        def timed(fn, *args):
            out = fn(*args)
            np.asarray(out)  # warm/flush (single-call result for parity)

            # amortize the ~2 ms/call tunnel dispatch with an in-graph loop;
            # the iteration index perturbs x so XLA cannot hoist the matmul
            x0 = args[0]

            @jax.jit
            def loop(x0, *rest):
                def body(i, acc):
                    # real data dependency on i so XLA cannot hoist the matmul
                    xi = x0.at[0, 0].add((i % 2).astype(x0.dtype) * 1e-6)
                    y = fn(xi, *rest)
                    return acc + y[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

            r = loop(x0, *args[1:])
            np.asarray(r)  # warm/flush the loop program
            t0 = time.perf_counter()
            r = loop(x0, *args[1:])
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / ITERS
            return out, dt * 1e3

        os.environ["CAMBRIAN_INT4_V1"] = "1"
        f1 = jax.jit(lambda a, b, c: quant.int4_matmul(a, b, c))
        o1, t1 = timed(f1, x, wq, s)
        os.environ["CAMBRIAN_INT4_V1"] = "0"
        f2 = jax.jit(lambda a, b, c: quant.int4_matmul(a, b, c))
        o2, t2 = timed(f2, x, wq, s)
        f8 = jax.jit(lambda a, b, c: quant.int8_matmul(a, b, c))
        o8, t8 = timed(f8, x, wq8, s8)

        e2 = np.abs(np.asarray(o2, np.float32) - ref).max() / np.abs(ref).max()
        e1 = np.abs(np.asarray(o1, np.float32) - ref).max() / np.abs(ref).max()
        wbytes = wq.size + s.size * 4
        ideal_ms = wbytes / 819e9 * 1e3
        print(f"[{m},{k},{n}] v1 {t1:.2f} ms  v2 {t2:.2f} ms "
              f"({t1 / t2:.2f}x)  int8 {t8:.2f} ms  "
              f"weightHBM-ideal {ideal_ms:.2f} ms  "
              f"v2@{ideal_ms / t2 * 100:.0f}%  relerr v1 {e1:.1e} v2 {e2:.1e}",
              flush=True)


if __name__ == "__main__":
    run()
