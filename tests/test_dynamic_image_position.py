"""The image block must be spliced (and SVA-injected) at each sample's
marker position, not at the static config.image_position — inference prompts
place <image> wherever the user wrote it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
from cambrian_tpu.data.packing import prepare_multimodal_data
from cambrian_tpu.models.cambrian import CambrianLM
from cambrian_tpu.models.config import tiny_debug
from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list
from cambrian_tpu.models.language.llama import init_kv_cache

RNG = np.random.default_rng(77)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_debug(num_towers=1)  # image_position=5 in the config
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list
    )
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers))
    return cfg, towers, model


def _pack(cfg, marker_pos, seq=30, max_len=64):
    ids = RNG.integers(5, cfg.vocab_size, (1, seq)).astype(np.int64)
    ids[:, marker_pos] = IMAGE_TOKEN_INDEX
    mask = np.ones((1, seq), dtype=bool)
    return prepare_multimodal_data(
        ids, ids.copy(), mask, [(64, 64)], cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, max_len,
    )


def _feats(cfg, towers):
    return [jnp.asarray(RNG.standard_normal(
        (1, t.interp_size, t.hidden_size), dtype=np.float32)) for t in towers]


def test_marker_off_config_position_causality(setup):
    """With the marker at position 2 (config says 5): image content must not
    influence logits BEFORE the marker and must influence them after."""
    cfg, towers, model = setup
    marker = 2
    pids, _, pmask, ppos, aux = _pack(cfg, marker)
    feats_a = _feats(cfg, towers)
    feats_b = [f + 1.0 for f in feats_a]
    args = (jnp.asarray(pids), jnp.asarray(pmask), jnp.asarray(ppos))
    params = model.init(jax.random.PRNGKey(0), *args,
                        feats_a, [jnp.asarray(m) for m in aux])

    la = model.apply(params, *args, feats_a, [jnp.asarray(m) for m in aux])
    lb = model.apply(params, *args, feats_b, [jnp.asarray(m) for m in aux])
    diff = np.abs(np.asarray(la - lb))
    block_end = marker + cfg.image_block_len
    assert diff[0, :marker].max() < 1e-5, "image leaked before its position"
    assert diff[0, block_end:].max() > 1e-4, "image had no effect after block"


def test_prefill_decode_parity_with_shifted_marker(setup):
    cfg, towers, model = setup
    marker = 9  # neither 5 (config) nor a degenerate edge
    pids, _, pmask, ppos, aux = _pack(cfg, marker)
    feats = _feats(cfg, towers)
    auxj = [jnp.asarray(m) for m in aux]
    args = (jnp.asarray(pids), jnp.asarray(pmask), jnp.asarray(ppos))
    params = model.init(jax.random.PRNGKey(0), *args, feats, auxj)

    full = model.apply(params, *args, feats, auxj)

    s = pids.shape[1]
    k_len = s + 4
    cache = init_kv_cache(cfg, 1, k_len, dtype=jnp.float32)
    t = s - 1
    pre, cache = model.apply(
        params, args[0][:, :t], args[1][:, :t], args[2][:, :t], cache,
        feats, auxj, method=CambrianLM.prefill,
    )
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :t]),
                               rtol=2e-4, atol=2e-4)


def test_batch_with_mixed_marker_positions(setup):
    """Two samples with different marker positions in ONE batch."""
    cfg, towers, model = setup
    p1 = _pack(cfg, 2)
    p2 = _pack(cfg, 8)
    pids = np.concatenate([p1[0], p2[0]])
    pmask = np.concatenate([p1[2], p2[2]])
    ppos = np.concatenate([p1[3], p2[3]])
    aux = [np.concatenate([a, b]) for a, b in zip(p1[4], p2[4])]
    feats = [jnp.concatenate([f, f]) for f in _feats(cfg, towers)]
    args = (jnp.asarray(pids), jnp.asarray(pmask), jnp.asarray(ppos))
    params = model.init(jax.random.PRNGKey(0), *args, feats,
                        [jnp.asarray(m) for m in aux])
    logits = model.apply(params, *args, feats, [jnp.asarray(m) for m in aux])
    assert bool(jnp.isfinite(logits).all())

    # each sample must equal its single-sample forward (batch independence)
    for i, p in enumerate([p1, p2]):
        single = model.apply(
            params, jnp.asarray(p[0]), jnp.asarray(p[2]), jnp.asarray(p[3]),
            [f[i:i + 1] for f in feats], [jnp.asarray(a) for a in p[4]],
        )
        np.testing.assert_allclose(np.asarray(logits[i:i + 1]),
                                   np.asarray(single), rtol=2e-4, atol=2e-4)
