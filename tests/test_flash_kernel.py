"""Interpret-mode parity for the Pallas flash-attention FORWARD kernel vs the
XLA reference path — the kernel itself, not the CPU fallback that the rest of
the suite exercises. Covers the r3 softmax-chain rewrite (additive mask bias,
post-PV row normalization, fully-masked-row zeroing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.flash_attention import _flash_fwd_impl, _xla_reference


def _mk(bh, s_q, s_k, d, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((bh, s_q, d)), dtype)
    k = jnp.asarray(rng.standard_normal((bh, s_k, d)), dtype)
    v = jnp.asarray(rng.standard_normal((bh, s_k, d)), dtype)
    return q, k, v


def _run(q, k, v, valid, causal=False, sliding_window=None, q_offset=0,
         block_q=128):
    d = q.shape[-1]
    got = _flash_fwd_impl(q, k, v, valid, d ** -0.5, causal, sliding_window,
                          q_offset, block_q, interpret=True)
    ref = _xla_reference(q, k, v, valid, d ** -0.5, causal, sliding_window,
                         q_offset)
    return np.asarray(got, np.float32), np.asarray(ref, np.float32)


def test_full_attention_parity():
    q, k, v = _mk(2, 130, 150, 64)  # off-tile sizes exercise padding
    valid = jnp.ones((2, 150), bool)
    got, ref = _run(q, k, v, valid)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_key_padding_mask_parity():
    q, k, v = _mk(2, 64, 128, 64, seed=1)
    valid = jnp.asarray(np.arange(128)[None, :] < np.array([[97], [128]]))
    got, ref = _run(q, k, v, valid)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_causal_parity():
    q, k, v = _mk(3, 128, 128, 64, seed=2)
    valid = jnp.ones((3, 128), bool)
    got, ref = _run(q, k, v, valid, causal=True)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_causal_offset_parity():
    # decode-style: 8 query rows appended at position 120 of a 128-key cache
    q, k, v = _mk(2, 8, 128, 64, seed=3)
    valid = jnp.asarray(np.arange(128)[None, :] < np.array([[128], [100]]))
    got, ref = _run(q, k, v, valid, causal=True, q_offset=120)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_sliding_window_parity():
    q, k, v = _mk(2, 128, 128, 64, seed=4)
    valid = jnp.ones((2, 128), bool)
    got, ref = _run(q, k, v, valid, causal=True, sliding_window=32)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_fully_masked_rows_are_zero():
    # every key invalid for batch-head 0: outputs must be exactly 0 (the old
    # select-based kernel zeroed them; the additive-bias kernel must too)
    q, k, v = _mk(2, 16, 64, 64, seed=5)
    valid = jnp.asarray(np.array([[False] * 64, [True] * 64]))
    got = _flash_fwd_impl(q, k, v, valid, 0.125, False, None, 0, 128,
                          interpret=True)
    got = np.asarray(got, np.float32)
    assert np.all(got[0] == 0.0)
    assert np.all(np.isfinite(got))
    ref = np.asarray(_xla_reference(q, k, v, valid, 0.125, False, None, 0),
                     np.float32)
    np.testing.assert_allclose(got[1], ref[1], atol=2e-5, rtol=2e-5)


def test_all_double_masked_rows_are_zero():
    # every entry masked by BOTH the window predicate and key validity:
    # NEG_INF + NEG_INF overflows to -inf and exp(-inf - -inf) is NaN inside
    # the kernel; the output select must still yield exact zeros
    q, k, v = _mk(1, 8, 64, 64, seed=7)
    valid = jnp.zeros((1, 64), bool)
    got = _flash_fwd_impl(q, k, v, valid, 0.125, True, 10, 1000, 128,
                          interpret=True)
    got = np.asarray(got, np.float32)
    assert np.all(got == 0.0)


def test_bf16_parity():
    q, k, v = _mk(2, 128, 128, 64, jnp.bfloat16, seed=6)
    valid = jnp.asarray(np.arange(128)[None, :] < np.array([[110], [128]]))
    got, ref = _run(q, k, v, valid)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
