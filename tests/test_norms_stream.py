"""Streaming LayerNorm: fp32-stat parity of both the VPU one-pass path and
the MXU dot-stats path (used on TPU for lane-aligned widths) against the
two-pass fp32 reference, plus gradient flow through the dot-stats form."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.norms import layer_norm, layer_norm_stream


def _data(rows, cols, scale=0.7, shift=0.3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, cols)) * scale + shift,
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(cols), jnp.float32)
    b = jnp.asarray(rng.standard_normal(cols), jnp.float32)
    return x, w, b


def _assert_one_ulp(got, ref_f32):
    # reference rounded to bf16: agreement within one bf16 ulp
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref_f32.astype(jnp.bfloat16), np.float32)
    ulp = np.maximum(np.abs(ref) * 2.0 ** -8, 2.0 ** -133)
    assert np.all(np.abs(got - ref) <= 2 * ulp)


@pytest.mark.parametrize("rows,cols", [(64, 128), (300, 384), (40, 200)])
def test_vpu_path_matches_two_pass(monkeypatch, rows, cols):
    monkeypatch.setenv("CAMBRIAN_LN_DOT_STATS", "0")
    x, w, b = _data(rows, cols)
    ref = layer_norm(x.astype(jnp.float32), w, b, 1e-6)
    _assert_one_ulp(layer_norm_stream(x, w, b, 1e-6), ref)


@pytest.mark.parametrize("rows,cols", [(64, 128), (300, 384), (48, 1536)])
def test_mxu_path_matches_two_pass(monkeypatch, rows, cols):
    # "1" forces the dot-stats path for lane-aligned widths on any backend
    monkeypatch.setenv("CAMBRIAN_LN_DOT_STATS", "1")
    x, w, b = _data(rows, cols)
    ref = layer_norm(x.astype(jnp.float32), w, b, 1e-6)
    _assert_one_ulp(layer_norm_stream(x, w, b, 1e-6), ref)


def test_mxu_path_matches_vpu_path_closely(monkeypatch):
    # fp32 accumulation both ways: only the summation order differs, so the
    # two paths agree far inside bf16 output resolution
    x, w, b = _data(128, 768)
    monkeypatch.setenv("CAMBRIAN_LN_DOT_STATS", "0")
    vpu = np.asarray(layer_norm_stream(x, w, b, 1e-6), np.float32)
    monkeypatch.setenv("CAMBRIAN_LN_DOT_STATS", "1")
    mxu = np.asarray(layer_norm_stream(x, w, b, 1e-6), np.float32)
    np.testing.assert_allclose(vpu, mxu, atol=2.0 ** -7, rtol=2.0 ** -7)


def test_mxu_path_unaligned_width_falls_back(monkeypatch):
    monkeypatch.setenv("CAMBRIAN_LN_DOT_STATS", "1")
    x, w, b = _data(32, 200)  # 200 % 128 != 0 -> VPU path
    ref = layer_norm(x.astype(jnp.float32), w, b, 1e-6)
    _assert_one_ulp(layer_norm_stream(x, w, b, 1e-6), ref)


def test_mxu_path_gradients(monkeypatch):
    monkeypatch.setenv("CAMBRIAN_LN_DOT_STATS", "1")
    x, w, b = _data(64, 256)
    xf = x.astype(jnp.float32)

    def loss_stream(x, w, b):
        return jnp.sum(layer_norm_stream(x, w, b, 1e-6).astype(jnp.float32) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(layer_norm(x, w, b, 1e-6) ** 2)

    g_stream = jax.grad(loss_stream, argnums=(0, 1, 2))(xf, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xf, w, b)
    for gs, gr in zip(g_stream, g_ref):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   atol=1e-3, rtol=1e-3)


def test_mxu_path_3d_input(monkeypatch):
    monkeypatch.setenv("CAMBRIAN_LN_DOT_STATS", "1")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 17, 256)), jnp.bfloat16)
    w = jnp.ones((256,), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    got = layer_norm_stream(x, w, b, 1e-6)
    assert got.shape == x.shape
    ref = layer_norm(x.astype(jnp.float32), w, b, 1e-6)
    _assert_one_ulp(got, ref)
