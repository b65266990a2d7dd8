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


def test_layer_norm_into_dense_parity():
    """Dense(LN(x)) folded through the GEMM (layer_norm_into_dense) must
    match the unfused StreamLayerNorm -> Dense pipeline to bf16 rounding —
    the gate for CAMBRIAN_LN_INTO_GEMM (ConvNeXt block fast path)."""
    import jax
    from cambrian_tpu.ops.norms import layer_norm_into_dense, layer_norm_stream

    rng = np.random.default_rng(0)
    rows, c, n = 512, 384, 1536
    # realistic post-dwconv scale: nonzero mean, O(1) std
    x = jnp.asarray(rng.standard_normal((rows, c)) * 1.3 + 0.7, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((c,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((c, n)) * 0.05, jnp.float32)
    dbias = jnp.asarray(rng.standard_normal((n,)) * 0.02, jnp.float32)

    fused = layer_norm_into_dense(x, w, b, kernel, dbias, eps=1e-6,
                                  compute_dtype=jnp.bfloat16)
    xn = layer_norm_stream(x, w, b, 1e-6)
    ref = (xn.astype(jnp.bfloat16) @ kernel.astype(jnp.bfloat16)
           + dbias.astype(jnp.bfloat16))

    assert fused.dtype == jnp.bfloat16
    f = np.asarray(fused, np.float32)
    r = np.asarray(ref, np.float32)
    # bf16-rounding-level agreement, scale-relative
    scale = np.abs(r).max()
    np.testing.assert_allclose(f, r, atol=0.02 * scale, rtol=0.05)

    # fp32 exactness of the algebra itself (no rounding): identical inputs
    # in fp32 must agree tightly
    x32 = x.astype(jnp.float32)
    fused32 = layer_norm_into_dense(x32, w, b, kernel, dbias, eps=1e-6,
                                    compute_dtype=jnp.float32)
    from cambrian_tpu.ops.norms import layer_norm
    ref32 = layer_norm(x32, w, b, 1e-6) @ kernel + dbias
    np.testing.assert_allclose(np.asarray(fused32), np.asarray(ref32),
                               atol=2e-4 * float(np.abs(ref32).max()),
                               rtol=1e-3)


def test_convnext_block_ln_into_gemm_parity(monkeypatch):
    """The full ConvNeXtBlock under CAMBRIAN_LN_INTO_GEMM=1 matches the
    default path on the same params (tree structure identical)."""
    import jax
    from cambrian_tpu.models.encoders.convnext import ConvNeXtBlock

    rng = np.random.default_rng(2)
    hh = ww = 8
    bsz, c = 2, 128
    xf = jnp.asarray(rng.standard_normal((hh * ww * bsz, c)), jnp.bfloat16)

    blk = ConvNeXtBlock(c, dtype=jnp.bfloat16)
    monkeypatch.setenv("CAMBRIAN_LN_INTO_GEMM", "0")
    params = blk.init(jax.random.PRNGKey(0), xf, (hh, ww, bsz))
    base = blk.apply(params, xf, (hh, ww, bsz))

    monkeypatch.setenv("CAMBRIAN_LN_INTO_GEMM", "1")
    params_fused = blk.init(jax.random.PRNGKey(0), xf, (hh, ww, bsz))
    # identical param trees (names, shapes, dtypes)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_fused)
    fused = blk.apply(params, xf, (hh, ww, bsz))

    b0 = np.asarray(base, np.float32)
    f0 = np.asarray(fused, np.float32)
    scale = np.abs(b0).max()
    np.testing.assert_allclose(f0, b0, atol=0.02 * scale, rtol=0.05)


@pytest.mark.parametrize("variant", ["plain", "swiglu", "swiglu_ln"])
def test_vit_block_ln_into_gemm_parity(monkeypatch, variant):
    """ViTBlock under CAMBRIAN_LN_INTO_GEMM_VIT=1 matches the default path
    on the same params across all three MLP variants."""
    import jax
    from cambrian_tpu.models.encoders.vit import ViTBlock, ViTConfig

    cfg = ViTConfig(
        image_size=32, patch_size=8, hidden_size=128, intermediate_size=256,
        num_layers=1, num_heads=4,
        swiglu=(variant == "swiglu"), swiglu_ln=(variant == "swiglu_ln"))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 17, 128)), jnp.bfloat16)

    blk = ViTBlock(cfg, dtype=jnp.bfloat16)
    monkeypatch.setenv("CAMBRIAN_LN_INTO_GEMM_VIT", "0")
    params = blk.init(jax.random.PRNGKey(0), x)
    base = blk.apply(params, x)

    monkeypatch.setenv("CAMBRIAN_LN_INTO_GEMM_VIT", "1")
    params_fused = blk.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_fused)
    fused = blk.apply(params, x)

    b0 = np.asarray(base, np.float32)
    f0 = np.asarray(fused, np.float32)
    scale = np.abs(b0).max()
    np.testing.assert_allclose(f0, b0, atol=0.02 * scale, rtol=0.05)
