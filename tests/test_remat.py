"""Gradient checkpointing: remat must not change values or gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
from cambrian_tpu.data.packing import prepare_multimodal_data
from cambrian_tpu.models.cambrian import CambrianLM, cross_entropy_loss
from cambrian_tpu.models.config import tiny_debug
from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list

RNG = np.random.default_rng(17)


def test_remat_matches_no_remat():
    cfg = tiny_debug(num_towers=1)
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list
    )
    hidden_sizes = tuple(t.hidden_size for t in towers)

    b, seq = 1, 24
    ids = RNG.integers(5, cfg.vocab_size, (b, seq)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    mask = np.ones((b, seq), dtype=bool)
    pids, plabels, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, ids.copy(), mask, [(64, 64)] * b, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, cfg.tokenizer_model_max_length,
    )
    feats = [jnp.asarray(RNG.standard_normal(
        (b, t.interp_size, t.hidden_size), dtype=np.float32)) for t in towers]
    args = (jnp.asarray(pids), jnp.asarray(pmask), jnp.asarray(ppos),
            feats, [jnp.asarray(m) for m in aux_masks])

    model_plain = CambrianLM(cfg.replace(remat=False), hidden_sizes)
    model_remat = CambrianLM(cfg.replace(remat=True), hidden_sizes)
    params = model_plain.init(jax.random.PRNGKey(0), *args)

    def loss(model, p):
        return cross_entropy_loss(model.apply(p, *args), jnp.asarray(plabels))

    l1, g1 = jax.value_and_grad(lambda p: loss(model_plain, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(model_remat, p))(params)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for (p1, a), (p2, b_) in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0],
        jax.tree_util.tree_flatten_with_path(g2)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))


def test_cast_frozen_params_dtype_and_training():
    """Frozen groups store bf16, trainable keep fp32 master, and a train
    step still decreases finite loss (optimizer.cast_frozen_params — the
    34B-stage-1-fits-v5e mechanism, tests/test_production_compile.py)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    import __graft_entry__
    from cambrian_tpu.train.optimizer import (TrainConfig, cast_frozen_params,
                                              label_params)
    from cambrian_tpu.train.train_step import init_train_state, make_train_step

    cfg, model, towers, params, tower_params, batch = __graft_entry__._build(
        num_towers=1, batch=2)
    tconf = TrainConfig(learning_rate=1e-3, total_steps=4, warmup_ratio=0.0,
                        lr_scheduler_type="constant", tune_mm_mlp_adapter=True)
    cast = cast_frozen_params(params, tconf)
    labels = label_params(params, tconf)

    from cambrian_tpu.train.optimizer import _NORM_PATH_RE

    flat = jax.tree_util.tree_leaves_with_path(cast)
    flat_labels = jax.tree_util.tree_leaves_with_path(labels)
    n_bf16 = n_fp32 = n_norm_fp32 = 0
    for (path, leaf), (_, label) in zip(flat, flat_labels):
        comps = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        is_norm = any(_NORM_PATH_RE.search(c) for c in comps)
        if label == "frozen" and not is_norm:
            assert leaf.dtype != jnp.float32, path
            n_bf16 += leaf.dtype == jnp.bfloat16
        elif label == "frozen":
            # norm scales/biases are applied in fp32 (numerics discipline):
            # they keep fp32 storage even when frozen
            assert leaf.dtype == jnp.float32, path
            n_norm_fp32 += 1
        elif leaf.dtype == jnp.float32:
            n_fp32 += 1
    assert n_bf16 > 0 and n_fp32 > 0 and n_norm_fp32 > 0  # all populations present

    state = init_train_state(cast, tconf)
    step_fn = jax.jit(make_train_step(model, towers))
    l0 = l1 = None
    for _ in range(3):
        state, metrics = step_fn(state, tower_params, batch)
        l0 = l0 if l0 is not None else float(metrics["loss"])
        l1 = float(metrics["loss"])
    assert np.isfinite(l1) and l1 < l0
    # frozen leaves really did not move or change dtype
    after = jax.tree_util.tree_leaves_with_path(state.params)
    before = dict((jax.tree_util.keystr(p), l) for p, l in flat)
    for (path, leaf), (_, label) in zip(after, flat_labels):
        if label == "frozen":
            np.testing.assert_array_equal(
                np.asarray(leaf, np.float32),
                np.asarray(before[jax.tree_util.keystr(path)], np.float32))
