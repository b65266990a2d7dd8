"""Normalization ops with the fp32-upcast discipline the reference enforces on
TPU (train_fsdp.py:1428-1438 replaces HF's RMSNorm with an fp32 version, and
Conv/Linear bias dtypes are harmonized at :1440-1452). Computing the variance
in bf16 silently destroys 34B-scale training; these helpers always reduce in
fp32 and cast back to the input dtype.
"""

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm with fp32 accumulation: y = x / rms(x) * weight."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    variance = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jnp.reciprocal(jnp.sqrt(variance + eps))
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 accumulation."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
