"""Checkpoint-bridge parity: our decoder vs HF LlamaForCausalLM with
transplanted weights (the per-block golden tier, SURVEY.md §4b), plus
convert/export round-trips."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cambrian_tpu.checkpoint.hf_llm import (
    convert_cambrian,
    convert_llama_decoder,
    export_cambrian,
)
from cambrian_tpu.models.cambrian import CambrianLM
from cambrian_tpu.models.config import CambrianConfig, tiny_debug

RNG = np.random.default_rng(5)


def _tiny_hf_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=256,
        attention_bias=False, tie_word_embeddings=False,
    )
    return LlamaForCausalLM(hf_cfg).eval(), hf_cfg


def test_llama_decoder_logit_parity():
    hf, hf_cfg = _tiny_hf_llama()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = CambrianConfig(
        model_type="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=256,
        mm_vision_tower_aux_list=("debug-tower-0",),
        mm_vision_tower_aux_token_len_list=(16,),
        query_num_list=(16,), image_token_len=16, num_query_group=1,
        connector_only=True, vision_hidden_size=32,
    )
    model = CambrianLM(cfg, (32,))

    params = convert_llama_decoder(sd, cfg)
    params["lm_head"] = {"kernel": sd["lm_head.weight"].T}
    # connector params unused on the text path; init then overwrite decoder
    ids = RNG.integers(0, 128, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), dtype=bool)
    pos = np.tile(np.arange(12), (2, 1))
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(pos), None, None)
    merged = dict(init["params"])
    merged.update(jax.tree.map(jnp.asarray, params))

    ours = np.asarray(model.apply({"params": merged}, jnp.asarray(ids),
                                  jnp.asarray(mask), jnp.asarray(pos), None, None))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_llama_parity_with_padding_mask():
    """Right-padded batch: masked positions must not influence valid logits."""
    hf, _ = _tiny_hf_llama()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = CambrianConfig(
        model_type="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        mm_vision_tower_aux_list=("debug-tower-0",),
        mm_vision_tower_aux_token_len_list=(16,), query_num_list=(16,),
        image_token_len=16, connector_only=True, vision_hidden_size=32,
        rope_theta=10000.0,
    )
    model = CambrianLM(cfg, (32,))
    ids = RNG.integers(0, 128, (1, 10)).astype(np.int32)
    valid = 7
    mask = np.zeros((1, 10), dtype=bool)
    mask[:, :valid] = True
    pos = np.tile(np.arange(10), (1, 1))

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(pos), None, None)
    merged = dict(init["params"])
    merged.update(jax.tree.map(jnp.asarray, convert_llama_decoder(sd, cfg)))
    merged["lm_head"] = {"kernel": jnp.asarray(sd["lm_head.weight"].T)}

    ours = np.asarray(model.apply({"params": merged}, jnp.asarray(ids),
                                  jnp.asarray(mask), jnp.asarray(pos), None, None))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids[:, :valid].astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours[:, :valid], ref, rtol=1e-4, atol=1e-4)


def test_cambrian_convert_export_roundtrip():
    """export_cambrian(convert_cambrian(sd)) == sd for a tiny full model."""
    cfg = tiny_debug(num_towers=2)
    from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list

    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list
    )
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers))

    # random params -> HF layout -> back -> identical pytree
    ids = np.zeros((1, cfg.tokenizer_model_max_length), dtype=np.int32)
    mask = np.ones_like(ids, dtype=bool)
    pos = np.tile(np.arange(ids.shape[1]), (1, 1))
    feats = [
        jnp.asarray(RNG.standard_normal((1, t.interp_size, t.hidden_size),
                                        dtype=np.float32))
        for t in towers
    ]
    aux_masks = [
        jnp.ones((1, cfg.image_token_len, w * w), dtype=bool)
        for w in cfg.cross_att_window_sizes()
    ]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(pos), feats, aux_masks)["params"]

    sd = export_cambrian(params, cfg)
    back = convert_cambrian(sd, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {jax.tree_util.keystr(p): l
              for p, l in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(flat_b) == {jax.tree_util.keystr(p) for p, _ in flat_a}
    for p, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[jax.tree_util.keystr(p)]),
            err_msg=jax.tree_util.keystr(p),
        )
