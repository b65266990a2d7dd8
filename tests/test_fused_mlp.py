"""Fused MLP kernel: CPU-fallback numerics (TPU timing in PERF_NOTES)."""

import numpy as np

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.fused_mlp import fused_mlp


def test_fused_mlp_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((48, 96)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(96).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((96, 48)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(48).astype(np.float32) * 0.1)
    out = fused_mlp(x, w1, b1, w2, b2)
    ref = jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_no_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32) * 0.1)
    out = fused_mlp(x, w1, None, w2, None)
    ref = jax.nn.gelu(x @ w1, approximate=False) @ w2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
