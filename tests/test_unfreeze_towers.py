"""unfreeze_mm_vision_tower must actually train the tower weights (they join
the differentiated tree under the vision_tower LR group)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
from cambrian_tpu.data.packing import prepare_multimodal_data
from cambrian_tpu.models.cambrian import CambrianLM
from cambrian_tpu.models.config import tiny_debug
from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list
from cambrian_tpu.train.optimizer import TrainConfig, label_params
from cambrian_tpu.train.train_step import init_train_state, make_train_step

RNG = np.random.default_rng(41)


def _build():
    cfg = tiny_debug(num_towers=1)
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list
    )
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers))
    b, seq = 2, 24
    ids = RNG.integers(5, cfg.vocab_size, (b, seq)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    mask = np.ones((b, seq), dtype=bool)
    pids, plabels, pmask, ppos, aux = prepare_multimodal_data(
        ids, ids.copy(), mask, [(64, 64)] * b, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, cfg.tokenizer_model_max_length,
    )
    images = [jnp.asarray(RNG.standard_normal(
        (b, 3, t.image_size, t.image_size), dtype=np.float32)) for t in towers]
    batch = dict(
        input_ids=jnp.asarray(pids), labels=jnp.asarray(plabels),
        attention_mask=jnp.asarray(pmask), position_ids=jnp.asarray(ppos),
        images=images, aux_masks=[jnp.asarray(m) for m in aux],
    )
    tower_params = [t.init(jax.random.PRNGKey(1)) for t in towers]
    feats = [t.apply(tp, px) for t, tp, px in zip(towers, tower_params, images)]
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["attention_mask"], batch["position_ids"],
                        feats, batch["aux_masks"])
    return cfg, model, towers, params, tower_params, batch


def test_unfrozen_towers_receive_updates():
    cfg, model, towers, params, tower_params, batch = _build()
    tconf = TrainConfig(learning_rate=1e-2, mm_vision_tower_lr=1e-2,
                        total_steps=10, warmup_ratio=0.0,
                        lr_scheduler_type="constant",
                        unfreeze_mm_vision_tower=True)
    combined = {"model": params, "vision_towers": tower_params}
    labels = label_params(combined, tconf)
    flat = {jax.tree_util.keystr(p): l for p, l in
            jax.tree_util.tree_flatten_with_path(labels)[0]}
    assert all(l == "vision_tower" for p, l in flat.items()
               if "vision_towers" in p), "tower params mislabeled"

    state = init_train_state(combined, tconf)
    step = make_train_step(model, towers, train_towers=True)
    jstep = jax.jit(step)
    state, _ = jstep(state, [], batch)
    state, metrics = jstep(state, [], batch)
    assert np.isfinite(float(metrics["loss"]))

    before = jax.tree.leaves(tower_params)[0]
    after = jax.tree.leaves(state.params["vision_towers"])[0]
    assert np.abs(np.asarray(after - before)).max() > 0, "towers did not move"


def test_frozen_towers_untouched_by_default():
    cfg, model, towers, params, tower_params, batch = _build()
    tconf = TrainConfig(learning_rate=1e-2, total_steps=10, warmup_ratio=0.0,
                        lr_scheduler_type="constant")
    state = init_train_state(params, tconf)
    step = make_train_step(model, towers, train_towers=False)
    jstep = jax.jit(step)
    state, _ = jstep(state, tower_params, batch)
    state, _ = jstep(state, tower_params, batch)
    # model moved, towers are an untouched argument by construction
    assert np.abs(np.asarray(
        state.params["params"]["vision_query"] - params["params"]["vision_query"]
    )).max() > 0
