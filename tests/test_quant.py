"""int8 weight-only quantization tests (CPU path; the Pallas kernel's TPU
numerics are exercised by bench tooling on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.ops.quant import (
    dequantize_int8,
    int8_matmul,
    quantize_int8,
    quantize_params,
)

RNG = np.random.default_rng(29)


def test_quantize_roundtrip_error_bounded():
    w = RNG.standard_normal((128, 256)).astype(np.float32)
    q, s = quantize_int8(jnp.asarray(w))
    back = np.asarray(dequantize_int8(q, s, jnp.float32))
    err = np.abs(back - w)
    # symmetric per-channel int8: error bounded by scale/2 per element
    bound = np.asarray(s)[None, :] * 0.51
    assert (err <= bound + 1e-6).all()


def test_int8_matmul_matches_dequant():
    x = jnp.asarray(RNG.standard_normal((8, 64)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((64, 96)).astype(np.float32))
    q, s = quantize_int8(w)
    out = int8_matmul(x, q, s)
    ref = x @ dequantize_int8(q, s, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_quantize_params_targets():
    params = {
        "layers_0": {"self_attn": {"q_proj": {"kernel": jnp.ones((16, 16))}},
                     "input_layernorm": {"weight": jnp.ones(16)}},
        "embed_tokens": {"embedding": jnp.ones((32, 16))},
    }
    qtree, scales = quantize_params(params)
    assert qtree["layers_0"]["self_attn"]["q_proj"]["kernel"].dtype == jnp.int8
    # norms and embeddings untouched
    assert qtree["layers_0"]["input_layernorm"]["weight"].dtype != jnp.int8
    assert qtree["embed_tokens"]["embedding"].dtype != jnp.int8
    assert len(scales) == 1
