"""int4 GEMV kernel experiment at 13B DECODE shapes (m=1 -> block_m=8).

The r4 decode-chunk profile (profile_decode_chunk.py) attributed ~94% of
13B-int4 decode time to the int4 Pallas GEMVs themselves, each running
~2.7x its weight-DMA time — VPU-bound on dequant. Sweeps kernel version
(v2 weight-mul vs v3 partial-sum scaling) x block_n, plus int8 at the same
shapes for reference. Parity-checked against the XLA dequant matmul.

Usage: timeout 1200 env PYTHONPATH=/root/repo:$PYTHONPATH \
           python scripts/perf/int4_gemv_exp.py
"""
import os
import time

import numpy as np


def run():
    import jax
    import jax.numpy as jnp

    from cambrian_tpu.ops import quant

    rng = np.random.default_rng(0)
    # 13B decode GEMV shapes (m=1; kernel pads to block_m=8)
    shapes = [(1, 5120, 13824), (1, 13824, 5120), (1, 5120, 5120)]
    ITERS = 50

    def timed(fn, x, *rest):
        out = fn(x, *rest)
        np.asarray(out)

        @jax.jit
        def loop(x0, *r):
            def body(i, acc):
                xi = x0.at[0, 0].add((i % 2).astype(x0.dtype) * 1e-6)
                return acc + fn(xi, *r)[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        r = loop(x, *rest)
        np.asarray(r)
        t0 = time.perf_counter()
        loop(x, *rest).block_until_ready()
        return out, (time.perf_counter() - t0) / ITERS * 1e6  # us/call

    for m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
        wq, s = quant.quantize_int4(w)
        wq8, s8 = quant.quantize_int8(w)
        ref = np.asarray(x.astype(jnp.float32)
                         @ quant.dequantize_int4(wq, s, jnp.float32))
        dma_us = (k * n / 2) / 819e9 * 1e6
        print(f"== m={m} k={k} n={n}  (weight DMA ideal {dma_us:.0f} us)",
              flush=True)
        for ver in ("2", "3"):
            os.environ["CAMBRIAN_INT4_V2"] = "1" if ver == "2" else "0"
            for bn in (512, 1024, 2048):
                f = jax.jit(lambda a, b, c, bn=bn: quant.int4_matmul(
                    a, b, c, block_m=8, block_n=bn))
                try:
                    out, us = timed(f, x, wq, s)
                except Exception as e:
                    print(f"  v{ver} bn={bn}: FAIL {type(e).__name__}: "
                          f"{str(e)[:120]}")
                    continue
                err = np.abs(np.asarray(out, np.float32) - ref).max()
                rel = err / (np.abs(ref).max() + 1e-9)
                print(f"  v{ver} bn={bn}: {us:7.1f} us  "
                      f"({us / dma_us:4.2f}x DMA)  maxrel={rel:.2e}",
                      flush=True)
        f8 = jax.jit(lambda a, b, c: quant.int8_matmul(a, b, c, block_m=8))
        out8, us8 = timed(f8, x, wq8, s8)
        dma8 = (k * n) / 819e9 * 1e6
        print(f"  int8 bn=512: {us8:7.1f} us ({us8 / dma8:4.2f}x its DMA "
              f"{dma8:.0f} us)", flush=True)
    os.environ.pop("CAMBRIAN_INT4_V2", None)


if __name__ == "__main__":
    run()
