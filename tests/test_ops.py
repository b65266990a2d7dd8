"""Numerical parity of core ops vs torch (the reference's substrate)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cambrian_tpu.ops import dot_product_attention, layer_norm, rms_norm, resize_bilinear
from cambrian_tpu.ops.attention import windowed_cross_attention
from cambrian_tpu.ops.resize import interpolate_tokens

RNG = np.random.default_rng(0)


def test_rms_norm_parity():
    x = RNG.standard_normal((2, 5, 64), dtype=np.float32)
    w = RNG.standard_normal(64, dtype=np.float32)
    ours = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5))

    xt = torch.from_numpy(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    ref = (xt * torch.rsqrt(var + 1e-5)) * torch.from_numpy(w)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_layer_norm_parity():
    x = RNG.standard_normal((3, 7, 32), dtype=np.float32)
    w = RNG.standard_normal(32, dtype=np.float32)
    b = RNG.standard_normal(32, dtype=np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5))
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-5
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_side,out_side", [(4, 24), (24, 4), (96, 24), (5, 7)])
def test_resize_bilinear_matches_torch_interpolate(in_side, out_side):
    """align_corners=False parity (cambrian_arch.py:395-401 semantics)."""
    x = RNG.standard_normal((2, in_side, in_side, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_side, out_side))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=(out_side, out_side),
        mode="bilinear",
        align_corners=False,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_interpolate_tokens_identity():
    x = RNG.standard_normal((2, 16, 8), dtype=np.float32)
    out = interpolate_tokens(jnp.asarray(x), 16)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_sdpa_parity_with_mask():
    b, q, k, h, d = 2, 5, 9, 4, 16
    qx = RNG.standard_normal((b, q, h, d), dtype=np.float32)
    kx = RNG.standard_normal((b, k, h, d), dtype=np.float32)
    vx = RNG.standard_normal((b, k, h, d), dtype=np.float32)
    mask = RNG.random((b, 1, q, k)) > 0.3
    mask[..., 0] = True  # no all-masked rows

    ours = np.asarray(
        dot_product_attention(jnp.asarray(qx), jnp.asarray(kx), jnp.asarray(vx),
                              jnp.asarray(mask))
    )
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(qx).permute(0, 2, 1, 3),
        torch.from_numpy(kx).permute(0, 2, 1, 3),
        torch.from_numpy(vx).permute(0, 2, 1, 3),
        attn_mask=torch.from_numpy(mask),
    ).permute(0, 2, 1, 3)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_windowed_equals_flattened_sdpa():
    """The windowed layout must equal the reference's flatten-to-batch trick."""
    b, nq, w, h, d = 2, 4, 6, 4, 8
    qx = RNG.standard_normal((b, nq, h, d), dtype=np.float32)
    kx = RNG.standard_normal((b, nq, w, h, d), dtype=np.float32)
    vx = RNG.standard_normal((b, nq, w, h, d), dtype=np.float32)
    mask = RNG.random((b, nq, w)) > 0.3
    mask[..., 0] = True

    ours = np.asarray(
        windowed_cross_attention(jnp.asarray(qx), jnp.asarray(kx), jnp.asarray(vx),
                                 jnp.asarray(mask))
    )
    # flatten (B,Q) into batch => plain SDPA with q_len=1
    flat = np.asarray(
        dot_product_attention(
            jnp.asarray(qx.reshape(b * nq, 1, h, d)),
            jnp.asarray(kx.reshape(b * nq, w, h, d)),
            jnp.asarray(vx.reshape(b * nq, w, h, d)),
            jnp.asarray(mask.reshape(b * nq, 1, 1, w)),
        )
    ).reshape(b, nq, h, d)
    np.testing.assert_allclose(ours, flat, rtol=1e-5, atol=1e-6)


def test_flash_attention_cpu_fallback_grads():
    """Off-TPU the wrapper uses the XLA path; grads must match a direct
    reference (guards the custom_vjp wiring)."""
    import jax

    from cambrian_tpu.ops.flash_attention import flash_attention

    b, s, h, d = 1, 12, 2, 8
    q = jnp.asarray(RNG.standard_normal((b, s, h, d), dtype=np.float32))
    valid = jnp.ones((b, s), dtype=bool)
    g = jnp.asarray(RNG.standard_normal((b, s, h, d), dtype=np.float32))

    def loss(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, valid, causal=True), g)

    def ref_loss(q, k, v):
        mask = valid[:, None, None, :] & jnp.tril(jnp.ones((s, s), bool))[None, None]
        return jnp.vdot(dot_product_attention(q, k, v, mask), g)

    ga = jax.grad(loss, argnums=(0, 1, 2))(q, q, q)
    gb = jax.grad(ref_loss, argnums=(0, 1, 2))(q, q, q)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_resize_bilinear_bf16_matrix_path_matches_f32_path():
    """The einsum-matrix resize for bf16 must equal cast-to-fp32-then-resize
    within output rounding (1 bf16 ulp)."""
    x32 = RNG.standard_normal((2, 24, 24, 8), dtype=np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    out16 = resize_bilinear(x16, 96, 96)
    ref = jax.image.resize(x16.astype(jnp.float32), (2, 96, 96, 8), "bilinear")
    diff = np.abs(np.asarray(out16, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)) + 1e-6
    assert (diff / scale).max() < 1e-2  # ~1 bf16 ulp

    # downscale direction too
    out_down = resize_bilinear(jnp.asarray(
        RNG.standard_normal((1, 96, 96, 4), dtype=np.float32), jnp.bfloat16), 24, 24)
    assert out_down.shape == (1, 24, 24, 4)
