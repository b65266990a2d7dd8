"""End-to-end model-core tests on the tiny debug config: packed multimodal
forward, in-decoder SVA injection, prefill/decode-step consistency, and
gradient flow through the whole stack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from cambrian_tpu.data.packing import prepare_multimodal_data
from cambrian_tpu.models.cambrian import (
    CambrianLM,
    chunked_cross_entropy,
    cross_entropy_loss,
    extract_head,
    head_logits,
    unwindow_mask,
    window_features,
    window_mask,
)
from cambrian_tpu.models.config import tiny_debug
from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list
from cambrian_tpu.models.language.llama import init_kv_cache

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_debug(num_towers=2)
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list
    )
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers))

    # pack a toy batch: image marker at cfg.image_position
    b, seq = 2, 40
    ids = RNG.integers(5, cfg.vocab_size, (b, seq)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    mask = np.ones((b, seq), dtype=bool)
    max_len = cfg.tokenizer_model_max_length
    pids, plabels, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, labels, mask, [(640, 360)] * b, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, max_len,
    )

    # tower features (random pixels through the debug towers)
    tower_params = [t.init(jax.random.PRNGKey(i)) for i, t in enumerate(towers)]
    feats = []
    for t, p in zip(towers, tower_params):
        px = jnp.asarray(RNG.standard_normal((b, 3, t.image_size, t.image_size),
                                             dtype=np.float32))
        feats.append(t.apply(p, px))

    batch = dict(
        input_ids=jnp.asarray(pids), labels=jnp.asarray(plabels),
        attention_mask=jnp.asarray(pmask), position_ids=jnp.asarray(ppos),
        aux_features=feats, aux_masks=[jnp.asarray(m) for m in aux_masks],
    )
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["position_ids"], batch["aux_features"], batch["aux_masks"],
    )
    return cfg, model, params, batch


def test_forward_shapes_and_finiteness(setup):
    cfg, model, params, batch = setup
    logits = model.apply(params, batch["input_ids"], batch["attention_mask"],
                         batch["position_ids"], batch["aux_features"],
                         batch["aux_masks"])
    b, s = batch["input_ids"].shape
    assert logits.shape == (b, s, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())


def test_sva_injection_changes_output(setup):
    """connector_only=False must differ from a run with injection disabled."""
    cfg, model, params, batch = setup
    logits = model.apply(params, batch["input_ids"], batch["attention_mask"],
                         batch["position_ids"], batch["aux_features"],
                         batch["aux_masks"])
    cfg_no_inject = cfg.replace(connector_only=True)
    model2 = CambrianLM(cfg_no_inject, model.tower_hidden_sizes)
    # same params minus the sampler layers
    params2 = {"params": {k: v for k, v in params["params"].items()
                          if not k.startswith("vision_sampler_layers_")}}
    logits2 = model2.apply(params2, batch["input_ids"], batch["attention_mask"],
                           batch["position_ids"], batch["aux_features"],
                           batch["aux_masks"])
    diff = np.abs(np.asarray(logits - logits2)).max()
    assert diff > 1e-3, "in-decoder SVA injection had no effect"


def test_text_only_forward(setup):
    cfg, model, params, batch = setup
    logits = model.apply(params, batch["input_ids"], batch["attention_mask"],
                         batch["position_ids"], None, None)
    assert bool(jnp.isfinite(logits).all())


def test_loss_and_grads(setup):
    cfg, model, params, batch = setup

    def loss_fn(p):
        logits = model.apply(p, batch["input_ids"], batch["attention_mask"],
                             batch["position_ids"], batch["aux_features"],
                             batch["aux_masks"])
        return cross_entropy_loss(logits, batch["labels"])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # gradient reaches the connector, the injected samplers, and the embeddings
    gp = grads["params"]
    assert float(jnp.abs(gp["vision_query"]).max()) > 0
    assert float(jnp.abs(jax.tree.leaves(gp["vision_sampler_layers_0"])[0]).max()) > 0
    assert float(jnp.abs(gp["image_newline"]).max()) > 0


def test_chunked_ce_matches_full_loss_and_grads(setup):
    """chunked_cross_entropy over hidden_states (the train step's default
    memory-bounded CE — the fp32 [B, S, V] logits never materialize) must
    reproduce the whole-sequence loss AND its gradients, including with a
    chunk size that does not divide the padded sequence length."""
    cfg, model, params, batch = setup

    def full_loss(p):
        logits = model.apply(p, batch["input_ids"], batch["attention_mask"],
                             batch["position_ids"], batch["aux_features"],
                             batch["aux_masks"])
        return cross_entropy_loss(logits, batch["labels"])

    def chunk_loss(p, chunk):
        hidden = model.apply(p, batch["input_ids"], batch["attention_mask"],
                             batch["position_ids"], batch["aux_features"],
                             batch["aux_masks"],
                             method=CambrianLM.hidden_states)
        head, spec = extract_head(cfg, p)
        return chunked_cross_entropy(
            hidden, batch["labels"],
            lambda hd, hc: head_logits(cfg, hd, hc), chunk, head, spec)

    l_full, g_full = jax.value_and_grad(full_loss)(params)
    for chunk in (16, 24):  # 24 does not divide the packed length
        l_c, g_c = jax.value_and_grad(chunk_loss)(params, chunk)
        assert abs(float(l_full) - float(l_c)) < 1e-5, (chunk, l_full, l_c)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g_full, g_c)
        assert max(jax.tree.leaves(diffs)) < 1e-4, chunk


def test_head_logits_matches_module(setup):
    """head_logits (the pure-function lm_head the chunked CE differentiates
    through) must match CambrianLM._logits exactly — same dot, same dtype
    discipline — or the chunked and full losses silently diverge."""
    cfg, model, params, batch = setup
    hidden = model.apply(params, batch["input_ids"], batch["attention_mask"],
                         batch["position_ids"], batch["aux_features"],
                         batch["aux_masks"], method=CambrianLM.hidden_states)
    head, _ = extract_head(cfg, params)
    via_fn = head_logits(cfg, head, hidden)
    via_module = model.apply(params, hidden, method=CambrianLM.logits)
    np.testing.assert_array_equal(np.asarray(via_fn), np.asarray(via_module))


def test_prefill_decode_matches_full_forward(setup):
    """Decode-step logits must equal the no-cache forward at the same position."""
    cfg, model, params, batch = setup
    ids = batch["input_ids"]
    amask = batch["attention_mask"]
    pos = batch["position_ids"]
    b, s = ids.shape

    full_logits = model.apply(params, ids, amask, pos,
                              batch["aux_features"], batch["aux_masks"])

    k_len = s + 8
    cache = init_kv_cache(cfg, b, k_len, dtype=jnp.float32)
    t = s - 1  # prefill everything but the final token
    prefill_logits, cache = model.apply(
        params, ids[:, :t], amask[:, :t], pos[:, :t], cache,
        batch["aux_features"], batch["aux_masks"], method=CambrianLM.prefill,
    )
    np.testing.assert_allclose(
        np.asarray(prefill_logits), np.asarray(full_logits[:, :t]),
        rtol=2e-4, atol=2e-4,
    )

    # decode the final token
    cache_valid = jnp.zeros((b, k_len), dtype=bool)
    cache_valid = cache_valid.at[:, :t].set(amask[:, :t])
    cache_valid = cache_valid.at[:, t].set(True)
    step_logits, cache = model.apply(
        params, ids[:, t:t + 1], pos[:, t:t + 1], cache, cache_valid,
        jnp.int32(t), method=CambrianLM.decode_step,
    )
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full_logits[:, t]),
        rtol=2e-4, atol=2e-4,
    )


def test_window_roundtrip():
    flat = jnp.asarray(RNG.random((2, 64)) > 0.5)
    w = window_mask(flat.astype(np.float32) * 0 + flat, 4)  # [2,16,4]
    assert w.shape == (2, 16, 4)
    # unwindow of a mask without dead windows reproduces the flat mask
    alive = jnp.ones((2, 64), dtype=bool)
    assert bool((unwindow_mask(window_mask(alive, 4), 4) == alive).all())


def test_window_features_matches_reference_flattening():
    feats = jnp.asarray(RNG.standard_normal((2, 36, 5), dtype=np.float32))
    w = window_features(feats, 3)  # S=6, q=3, r=2
    assert w.shape == (2, 9, 4, 5)
    # query (row 0, col 0) owns grid cells (0,0),(0,1),(1,0),(1,1)
    grid = np.asarray(feats).reshape(2, 6, 6, 5)
    np.testing.assert_array_equal(np.asarray(w[0, 0, 0]), grid[0, 0, 0])
    np.testing.assert_array_equal(np.asarray(w[0, 0, 1]), grid[0, 0, 1])
    np.testing.assert_array_equal(np.asarray(w[0, 0, 2]), grid[0, 1, 0])
    np.testing.assert_array_equal(np.asarray(w[0, 0, 3]), grid[0, 1, 1])
