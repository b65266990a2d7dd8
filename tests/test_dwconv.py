"""Pallas row-major depthwise 7x7 conv: interpret-mode parity vs the XLA
grouped conv, forward and gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.dwconv import depthwise_conv7x7

RNG = np.random.default_rng(11)


def _ref(x, w, bias):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32)[:, :, None, :],
        window_strides=(1, 1), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return (out + bias.astype(jnp.float32)[None, None, None, :]).astype(x.dtype)


def _inputs(b=2, h=16, wd=16, c=256, dtype=np.float32):
    x = jnp.asarray(RNG.standard_normal((b, h, wd, c)).astype(dtype))
    w = jnp.asarray(RNG.standard_normal((7, 7, c)).astype(np.float32))
    bias = jnp.asarray(RNG.standard_normal(c).astype(np.float32))
    return x, w, bias


def test_forward_parity_fp32():
    x, w, bias = _inputs()
    got = depthwise_conv7x7(x, w, bias, interpret=True)
    ref = _ref(x, w, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16_and_ragged_tiles():
    """H not divisible by 8 and C not divisible by 512 exercise tile picking."""
    x, w, bias = _inputs(h=12, c=384)
    x = x.astype(jnp.bfloat16)
    got = depthwise_conv7x7(x, w, bias, interpret=True)
    ref = _ref(x, w, bias)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_gradients_match_xla():
    x, w, bias = _inputs(b=1, h=8, wd=8, c=128)

    def loss(fn, x, w, bias):
        return jnp.sum(fn(x, w, bias) ** 2)

    ref_grads = jax.grad(lambda *a: loss(_ref, *a), argnums=(0, 1, 2))(x, w, bias)
    got_grads = jax.grad(
        lambda *a: loss(lambda *t: depthwise_conv7x7(*t, interpret=True), *a),
        argnums=(0, 1, 2))(x, w, bias)
    for r, g in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)
