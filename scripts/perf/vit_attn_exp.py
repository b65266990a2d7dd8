"""ViT attention wrapper-overhead experiment: the bs=8 encode pays ~19 ms/iter
of BQHD->BHQD relayout copies around the flash kernel (trace r3: 160x
[8,24,730,64] copies + friends). Variants:

  base   : current ViTAttention (Dense -> reshape -> flash_attention's
           internal transpose(0,2,1,3))
  einsum : q/k/v produced DIRECTLY in [B, H, S, D] via einsum against the
           reshaped kernel ([C, H, D]) so XLA can fuse the transpose into the
           GEMM epilogue; out-projection consumes [B, H, S, D] the same way.
           Param shapes/names unchanged.

Usage: python scripts/perf/vit_attn_exp.py <variant> [layers]
Shapes: DINOv2-giant (1536 hidden, 24 heads, d=64, 730 tokens, bs=8).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from cambrian_tpu.ops.flash_attention import _flash, flash_attention
from cambrian_tpu.ops.norms import StreamLayerNorm

B, S, H, D = 8, 730, 24, 64
C = H * D


class Attn(nn.Module):
    variant: str = "base"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        wq = self.param("q_kernel", nn.initializers.normal(0.02), (C, C),
                        jnp.float32).astype(self.dtype)
        wk = self.param("k_kernel", nn.initializers.normal(0.02), (C, C),
                        jnp.float32).astype(self.dtype)
        wv = self.param("v_kernel", nn.initializers.normal(0.02), (C, C),
                        jnp.float32).astype(self.dtype)
        wo = self.param("o_kernel", nn.initializers.normal(0.02), (C, C),
                        jnp.float32).astype(self.dtype)
        b, s, _ = x.shape
        if self.variant == "base":
            q = (x @ wq).reshape(b, s, H, D)
            k = (x @ wk).reshape(b, s, H, D)
            v = (x @ wv).reshape(b, s, H, D)
            out = flash_attention(q, k, v).reshape(b, s, C)
            return out @ wo
        # einsum: GEMM outputs land directly in [B, H, S, D]
        q = jnp.einsum("bsc,chd->bhsd", x, wq.reshape(C, H, D))
        k = jnp.einsum("bsc,chd->bhsd", x, wk.reshape(C, H, D))
        v = jnp.einsum("bsc,chd->bhsd", x, wv.reshape(C, H, D))
        valid = jnp.ones((b * H, s), bool)
        out = _flash(q.reshape(b * H, s, D), k.reshape(b * H, s, D),
                     v.reshape(b * H, s, D), valid, D ** -0.5, False, None,
                     0, 768)
        out = out.reshape(b, H, s, D)
        return jnp.einsum("bhsd,hdc->bsc", out, wo.reshape(H, D, C))


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(layers):
                h = StreamLayerNorm(epsilon=1e-6, name=f"ln{i}")(x)
                x = x + Attn(variant=variant, dtype=dtype, name=f"a{i}")(h)
            return x

    model = Stack()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, C)), dtype)
    params = model.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    fwd = jax.jit(lambda p, x: model.apply(p, x))

    out = fwd(params, x); np.asarray(out.ravel()[0])
    out = fwd(params, x); jax.block_until_ready(out)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = fwd(params, x)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ms = 1000 * float(np.median(ts))
    print(f"{variant} x{layers}: {ms:.2f} ms  ({ms/layers:.3f} ms/layer)",
          flush=True)


if __name__ == "__main__":
    main()
