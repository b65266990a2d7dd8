"""gelu_exact must be numerically indistinguishable from erf-GELU at bf16
resolution (it replaces nn.gelu(approximate=False) on every vision hot path)."""

import jax
import jax.numpy as jnp
import numpy as np

from cambrian_tpu.ops.activations import erf_fast, gelu_exact


def test_erf_fast_abs_error():
    x = jnp.linspace(-6.0, 6.0, 20001, dtype=jnp.float32)
    err = np.abs(np.asarray(erf_fast(x)) - np.asarray(jax.lax.erf(x)))
    # 1.5e-7 analytic bound + fp32 evaluation rounding (~3e-7 near 0)
    assert err.max() < 1e-6, err.max()


def test_gelu_exact_fp32_matches_reference():
    x = jnp.linspace(-10.0, 10.0, 40001, dtype=jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    got = gelu_exact(x)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    assert err.max() < 1e-6, err.max()


def test_gelu_exact_bf16_bitwise_close():
    # bf16 in/out: outputs round to the same bf16 value (allow 1 ulp slack)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(100000) * 3,
                    jnp.bfloat16)
    ref = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(jnp.bfloat16)
    got = gelu_exact(x)
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    scale = np.maximum(np.abs(np.asarray(ref, np.float32)), 2 ** -14)
    assert (diff / scale).max() < 2 ** -7, (diff / scale).max()  # <=1 bf16 ulp


def test_gelu_exact_edge_values():
    x = jnp.asarray([0.0, -0.0, 1e-8, -1e-8, 30.0, -30.0], jnp.float32)
    got = np.asarray(gelu_exact(x))
    assert got[0] == 0.0 and got[1] == 0.0
    assert np.isclose(got[4], 30.0)
    assert got[5] == 0.0
    assert np.all(np.isfinite(got))
