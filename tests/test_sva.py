"""Golden parity of the SVA modules vs the reference torch implementation.

The reference's vision_sampler.py is importable standalone (torch + numpy).
We transplant torch weights into the flax modules and require allclose outputs
— this is the per-block golden-value tier of the test pyramid (SURVEY.md §4b).
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cambrian_tpu.models.sva import (
    MultiKVCrossAttention,
    VisionCrossAttentionLayer,
    VisionTokenSampler,
    get_2d_sincos_pos_embed,
)

REF_PATH = "/root/reference/cambrian/model/vision_sampler.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_vision_sampler", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vision_sampler"] = mod
    spec.loader.exec_module(mod)
    return mod


ref = _load_ref()
RNG = np.random.default_rng(42)

B, Q, HID = 2, 4, 32           # query grid 2x2, vision hidden 32 (16 heads x 2)
KV_SIZES = [1, 2]              # tower windows: 1 token and 2x2=4 tokens
Q_DIM = 48                     # decoder-side query dim (different from hidden)


def _np(x):
    return x.detach().numpy()


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _seq_weights(seq):
    """torch Sequential(LayerNorm, Linear) -> flax {ln, dense} params."""
    ln, lin = seq[0], seq[1]
    out = {
        "ln": {"scale": _np(ln.weight), "bias": _np(ln.bias)},
        "dense": {"kernel": _np(lin.weight).T},
    }
    if lin.bias is not None:
        out["dense"]["bias"] = _np(lin.bias)
    return out


def _mkv_params(tmod, num_towers):
    p = {}
    q = _seq_weights(tmod.q_proj)
    p["q_ln"] = q["ln"]
    p["q_proj"] = q["dense"]
    for i in range(num_towers):
        k = _seq_weights(getattr(tmod, f"k_proj_{i}"))
        v = _seq_weights(getattr(tmod, f"v_proj_{i}"))
        p[f"k_ln_{i}"] = k["ln"]
        p[f"k_proj_{i}"] = k["dense"]
        p[f"v_ln_{i}"] = v["ln"]
        p[f"v_proj_{i}"] = v["dense"]
    p["o_proj"] = {"kernel": _np(tmod.o_proj.weight).T}
    return p


def _mlp_params(tmod):
    return {
        "linear_1": {"kernel": _np(tmod.linear_1.weight).T},
        "linear_2": {"kernel": _np(tmod.linear_2.weight).T},
    }


def _xattn_layer_params(tlayer, num_towers):
    p = {
        "proj_context": {"kernel": _np(tlayer.proj_context.weight).T},
        "proj_in": {"kernel": _np(tlayer.proj_in.weight).T},
        "proj_out": _mlp_params(tlayer.proj_out),
        "norm": {"scale": _np(tlayer.norm.weight), "bias": _np(tlayer.norm.bias)},
        "cross_attn": _mkv_params(tlayer.cross_attn, num_towers),
    }
    for i in range(num_towers):
        if hasattr(tlayer, f"pos_embed_{i}"):
            p[f"pos_embed_{i}"] = _np(getattr(tlayer, f"pos_embed_{i}"))
    return p


def _rand_inputs():
    """Window-layout inputs + the reference's flattened views."""
    queries = RNG.standard_normal((B, Q, HID), dtype=np.float32)
    context = RNG.standard_normal((B, Q, HID), dtype=np.float32)
    kvs, masks = [], []
    for s in KV_SIZES:
        w = s * s
        kvs.append(RNG.standard_normal((B, Q, w, HID), dtype=np.float32))
        m = RNG.random((B, Q, w)) > 0.3
        m[..., 0] = True
        masks.append(m)
    return queries, context, kvs, masks


def _flatten_for_ref(queries, context, kvs, masks):
    tq = _t(queries.reshape(B * Q, 1, -1))
    tc = _t(context.reshape(B * Q, 1, -1))
    tkv = [_t(kv.reshape(B * Q, kv.shape[2], -1)) for kv in kvs]
    tm = [_t(m.reshape(B * Q, m.shape[2])) for m in masks]
    return tq, tc, tkv, tm


def test_multikv_cross_attention_parity():
    queries, _, kvs, masks = _rand_inputs()

    tmod = ref.MultiKVCrossAttention(HID, [HID] * len(KV_SIZES), HID, 16)
    tmod.eval()
    tq = _t(queries.reshape(B * Q, 1, -1))
    tkv = [_t(kv.reshape(B * Q, kv.shape[2], -1)) for kv in kvs]
    tm = [
        _t(m.reshape(B * Q, 1, 1, m.shape[2])) for m in masks
    ]  # [bsz,1,q_len,v_len]
    with torch.no_grad():
        ref_out = tmod(tq, *tkv, *tm).numpy().reshape(B, Q, HID)

    fmod = MultiKVCrossAttention(hidden_dim=HID, out_dim=HID, num_towers=len(KV_SIZES))
    params = {"params": jax.tree.map(jnp.asarray, _mkv_params(tmod, len(KV_SIZES)))}
    ours = np.asarray(
        fmod.apply(params, jnp.asarray(queries), [jnp.asarray(k) for k in kvs],
                   [jnp.asarray(m) for m in masks])
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_vision_cross_attention_layer_parity():
    queries, context, kvs, masks = _rand_inputs()
    queries = RNG.standard_normal((B, Q, Q_DIM), dtype=np.float32)

    tlayer = ref.VisionCrossAttentionLayer(Q_DIM, HID, [HID] * len(KV_SIZES), KV_SIZES, HID)
    tlayer.eval()
    tq, tc, tkv, tm = _flatten_for_ref(queries, context, kvs, masks)
    with torch.no_grad():
        ref_out = tlayer(tq, tc, *tkv, *tm).numpy().reshape(B, Q, Q_DIM)

    flayer = VisionCrossAttentionLayer(q_dim=Q_DIM, kv_size_list=KV_SIZES, hidden_dim=HID)
    params = {"params": jax.tree.map(jnp.asarray, _xattn_layer_params(tlayer, len(KV_SIZES)))}
    ours = np.asarray(
        flayer.apply(params, jnp.asarray(queries), jnp.asarray(context),
                     [jnp.asarray(k) for k in kvs], [jnp.asarray(m) for m in masks])
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_vision_token_sampler_parity():
    queries, context, kvs, masks = _rand_inputs()

    depth = 3
    tsampler = ref.VisionTokenSampler(HID, HID, [HID] * len(KV_SIZES), KV_SIZES, HID, depth)
    tsampler.eval()
    tq, tc, tkv, tm = _flatten_for_ref(queries, context, kvs, masks)
    with torch.no_grad():
        ref_out = tsampler(tq, tc, *tkv, *tm).numpy().reshape(B, Q, HID)

    fsampler = VisionTokenSampler(
        q_dim=HID, kv_size_list=KV_SIZES, vision_hidden_size=HID, num_of_layers=depth
    )
    params = {
        "params": {
            f"layers_{i}": jax.tree.map(
                jnp.asarray, _xattn_layer_params(tsampler.layers[i], len(KV_SIZES))
            )
            for i in range(depth)
        }
    }
    ours = np.asarray(
        fsampler.apply(params, jnp.asarray(queries), jnp.asarray(context),
                       [jnp.asarray(k) for k in kvs], [jnp.asarray(m) for m in masks])
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=2e-5)


def test_sincos_pos_embed_parity():
    ours = get_2d_sincos_pos_embed(64, 8, cls_token=True)
    theirs = ref.get_2d_sincos_pos_embed(64, 8, cls_token=True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_vision_aggregation_layer_parity():
    """'sep' layer type (VisionAggregationLayer, vision_sampler.py:330-405)."""
    queries, context, kvs, masks = _rand_inputs()

    tlayer = ref.VisionAggregationLayer(HID, HID, [HID] * len(KV_SIZES), KV_SIZES, HID)
    tlayer.eval()
    tq, tc, tkv, tm = _flatten_for_ref(queries, context, kvs, masks)
    with torch.no_grad():
        ref_out = tlayer(tq, tc, *tkv, *tm).numpy().reshape(B, Q, HID)

    from cambrian_tpu.models.sva import VisionAggregationLayer

    params = {
        "proj_context": {"kernel": _np(tlayer.proj_context.weight).T},
        "proj_in": {"kernel": _np(tlayer.proj_in.weight).T},
        "proj_out": _mlp_params(tlayer.proj_out),
        "norm": {"scale": _np(tlayer.norm.weight), "bias": _np(tlayer.norm.bias)},
        "weight_mlp": _mlp_params(tlayer.weight_mlp),
    }
    for i, ks in enumerate(KV_SIZES):
        if hasattr(tlayer, f"pos_embed_{i}"):
            params[f"pos_embed_{i}"] = _np(getattr(tlayer, f"pos_embed_{i}"))
        agg = getattr(tlayer, f"aggregate_{i}")
        if agg.attention:
            a = agg.attention_layer
            params[f"aggregate_{i}"] = {"attention_layer": {
                "q_ln": _seq_weights(a.q_proj)["ln"],
                "q_proj": _seq_weights(a.q_proj)["dense"],
                "k_ln": _seq_weights(a.k_proj)["ln"],
                "k_proj": _seq_weights(a.k_proj)["dense"],
                "v_ln": _seq_weights(a.v_proj)["ln"],
                "v_proj": _seq_weights(a.v_proj)["dense"],
                "o_proj": {"kernel": _np(a.o_proj.weight).T},
            }}
        else:
            params[f"aggregate_{i}"] = {
                "attention_layer": _mlp_params(agg.attention_layer)}

    flayer = VisionAggregationLayer(q_dim=HID, kv_size_list=KV_SIZES, hidden_dim=HID)
    ours = np.asarray(flayer.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(queries), jnp.asarray(context),
        [jnp.asarray(k) for k in kvs], [jnp.asarray(m) for m in masks],
    ))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)
