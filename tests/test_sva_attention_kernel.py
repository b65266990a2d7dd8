"""Fused SVA windowed cross-attention kernel: interpret-mode parity vs the
jnp einsum form, forward and backward, with ragged tower masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.attention import windowed_cross_attention
from cambrian_tpu.ops.sva_attention import fused_windowed_cross_attention

RNG = np.random.default_rng(3)


def _inputs(b=2, q=128, w=22, h=4, d=32, dtype=np.float32):
    q_ = RNG.standard_normal((b, q, h, d)).astype(dtype)
    k_ = RNG.standard_normal((b, q, w, h, d)).astype(dtype)
    v_ = RNG.standard_normal((b, q, w, h, d)).astype(dtype)
    mask = RNG.random((b, q, w)) > 0.2
    mask[:, :, 0] = True          # every query keeps at least one key
    return (jnp.asarray(q_), jnp.asarray(k_), jnp.asarray(v_),
            jnp.asarray(mask))


def test_forward_parity_fp32():
    q, k, v, mask = _inputs()
    ref = windowed_cross_attention(q, k, v, mask)
    got = fused_windowed_cross_attention(q, k, v, mask, block_q=64,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_no_mask_ragged_q():
    """Q not a multiple of block_q exercises the padding path."""
    q, k, v, _ = _inputs(q=150)
    ref = windowed_cross_attention(q, k, v, None)
    got = fused_windowed_cross_attention(q, k, v, None, block_q=64,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    q, k, v, mask = _inputs(dtype=np.float32)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    ref = windowed_cross_attention(q, k, v, mask)
    got = fused_windowed_cross_attention(q, k, v, mask, block_q=64,
                                         interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_backward_parity():
    q, k, v, mask = _inputs(q=64, w=9)

    def loss(fn, *args):
        return jnp.sum(fn(*args) ** 2)

    ref_grads = jax.grad(
        lambda a, b_, c: loss(windowed_cross_attention, a, b_, c, mask),
        argnums=(0, 1, 2))(q, k, v)
    got_grads = jax.grad(
        lambda a, b_, c: loss(
            lambda *t: fused_windowed_cross_attention(*t, mask, block_q=64,
                                                      interpret=True),
            a, b_, c),
        argnums=(0, 1, 2))(q, k, v)
    for r, g in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_small_q_falls_back():
    q, k, v, mask = _inputs(q=16)
    out = fused_windowed_cross_attention(q, k, v, mask, block_q=64)
    ref = windowed_cross_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
