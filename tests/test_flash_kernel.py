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


# ---------------------------------------------------------------------------
# shard_map path (multi-device mesh): the TPU-topology AOT compiles exposed
# that GSPMD cannot auto-partition a pallas_call ("Mosaic kernels cannot be
# automatically partitioned"), so under a >1-device mesh flash_attention runs
# the kernel per-shard inside jax.shard_map. These tests run the same wrapper
# on the 8-device CPU mesh with the interpret-mode kernel inside.
# ---------------------------------------------------------------------------

import functools

from jax.sharding import PartitionSpec as P

from cambrian_tpu.ops.flash_attention import (
    _attend_bqhd,
    _mesh_attention_specs,
)


def _mesh_222():
    from cambrian_tpu.parallel.mesh import MeshConfig, create_mesh
    return create_mesh(MeshConfig(data=2, fsdp=2, model=2),
                       devices=jax.devices()[:8])


def _mk_bqhd(b, s_q, s_k, h, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s_q, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s_k, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s_k, h, d)), jnp.float32)
    valid = jnp.asarray(
        np.arange(s_k)[None, :] < rng.integers(s_k // 2, s_k + 1, (b, 1)))
    return q, k, v, valid


def test_mesh_attention_specs():
    mesh = _mesh_222()
    # fully consumable: batch over data*fsdp (4 | 8), heads over model (2 | 4)
    qkv, valid = _mesh_attention_specs(8, 4, mesh)
    assert qkv == P(("data", "fsdp"), None, ("model",), None)
    assert valid == P(("data", "fsdp"), None)
    # batch can only take data (b=2): fsdp unconsumed -> refuse
    assert _mesh_attention_specs(2, 4, mesh) is None
    # heads not divisible by model -> refuse
    assert _mesh_attention_specs(8, 3, mesh) is None


def test_shard_map_kernel_parity_and_grad():
    """The exact wrapper flash_attention builds on TPU, on the CPU mesh with
    the interpret-mode kernel: per-shard outputs and custom_vjp grads must
    match the global XLA reference."""
    mesh = _mesh_222()
    b, s_q, s_k, h, d = 8, 64, 64, 4, 64
    q, k, v, valid = _mk_bqhd(b, s_q, s_k, h, d, seed=11)
    qkv_spec, valid_spec = _mesh_attention_specs(b, h, mesh)

    attend = functools.partial(
        _attend_bqhd, scale=d ** -0.5, causal=True, sliding_window=None,
        q_offset=0, block_q=64)
    sharded = jax.shard_map(
        functools.partial(attend, use_pallas=True, interpret=True),
        mesh=mesh, in_specs=(qkv_spec, qkv_spec, qkv_spec, valid_spec),
        out_specs=qkv_spec, check_vma=False)
    ref_fn = functools.partial(attend, use_pallas=False)

    with jax.set_mesh(mesh):
        got = jax.jit(sharded)(q, k, v, valid)
    ref = ref_fn(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_sharded(q, k, v):
        return jnp.sum(sharded(q, k, v, valid) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref_fn(q, k, v, valid) ** 2)

    with jax.set_mesh(mesh):
        gs = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)
