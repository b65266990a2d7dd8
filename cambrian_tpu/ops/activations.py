"""Fast exact-GELU for TPU.

``jax.nn.gelu(approximate=False)`` lowers erf through XLA's high-degree
polynomial: measured 45 ms of pure VPU time across the ConvNeXt stage-2
pointwise stack (docs/PERF_NOTES.md). The Abramowitz-Stegun 7.1.26 rational
erf (|abs err| < 1.5e-7) is several times cheaper and far below bf16 output
resolution, so ``gelu_exact`` is a drop-in for every erf-GELU hot path
(ConvNeXt blocks, SVA MLPs, SAM neck — reference uses torch.nn.GELU default,
e.g. vision_sampler.py:241, which is the exact erf form).

Accuracy: gelu error = |x|/2 * erf_err <= 7.5e-8*|x|, at least two orders of
magnitude under the bf16 ulp at any |x| (verified in tests/test_activations).
"""

import jax.numpy as jnp


def erf_fast(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 rational erf approximation: |err| < 1.5e-7
    analytic, < 5e-7 in fp32 evaluation (rounding near 0).

    Computed in the input dtype (callers pass fp32); same formula as the
    Pallas kernels use (ops/fused_mlp.py) since Mosaic has no erf lowering.
    """
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """GELU(x) = x/2 * (1 + erf(x/sqrt(2))), fp32-accumulated, fast erf."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + erf_fast(xf * 0.7071067811865476))
    return y.astype(x.dtype)
