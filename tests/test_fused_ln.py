"""Fused Pallas LayerNorm: interpret-mode kernel parity vs the XLA fp32-stat
reference, custom-vjp gradient parity, and drop-in compatibility of the
FusedLayerNorm module with nn.LayerNorm param trees (checkpoint converters
depend on the "scale"/"bias" names)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cambrian_tpu.ops.norms import (FusedLayerNorm, fused_layer_norm,
                                    layer_norm)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("rows,cols", [(64, 128), (300, 256), (7, 384)])
def test_kernel_matches_reference(dtype, rows, cols):
    # odd row counts exercise the padded final grid block
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (rows, cols), jnp.float32) * 3 + 1).astype(dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (cols,), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (cols,), jnp.float32)
    ref = layer_norm(x, w, b, 1e-6)
    got = fused_layer_norm(x, w, b, 1e-6, interpret=True)
    assert got.dtype == ref.dtype
    # bf16 output rounds rsqrt vs reciprocal(sqrt) ties differently: 1 ULP
    tol = dict(atol=1e-6, rtol=1e-6) if dtype == jnp.float32 else \
        dict(atol=1e-3, rtol=8e-3)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), **tol)


def test_kernel_leading_batch_dims():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 9, 128), jnp.bfloat16)
    w = jnp.ones((128,)) * 1.5
    b = jnp.zeros((128,))
    ref = layer_norm(x, w, b)
    got = fused_layer_norm(x, w, b, interpret=True)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=1e-6)


def test_grad_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (48, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256,), jnp.float32) + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (256,), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (48, 256), jnp.float32)

    def loss_ref(x, w, b):
        return jnp.sum((layer_norm(x, w, b, 1e-5) - tgt) ** 2)

    def loss_fused(x, w, b):
        return jnp.sum((fused_layer_norm(x, w, b, 1e-5, interpret=True) - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=2e-4)


def test_unaligned_cols_fall_back():
    # 100 cols doesn't tile (8,128); must silently use the XLA path
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 100), jnp.float32)
    w, b = jnp.ones((100,)), jnp.zeros((100,))
    np.testing.assert_allclose(np.asarray(fused_layer_norm(x, w, b)),
                               np.asarray(layer_norm(x, w, b)), atol=1e-6)


def test_module_drop_in_for_nn_layernorm():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 128), jnp.float32)
    ref_mod = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    new_mod = FusedLayerNorm(epsilon=1e-6, dtype=jnp.float32)
    ref_params = ref_mod.init(jax.random.PRNGKey(1), x)
    new_params = new_mod.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(ref_params) == \
        jax.tree_util.tree_structure(new_params)
    assert {k: v.shape for k, v in ref_params["params"].items()} == \
        {k: v.shape for k, v in new_params["params"].items()}
    # same weights -> same output (fp32 path is bit-compatible semantics)
    y_ref = ref_mod.apply(ref_params, x)
    y_new = new_mod.apply(ref_params, x)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)
