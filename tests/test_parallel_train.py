"""Sharded training-step tests on a virtual 8-device CPU mesh
(data=2, fsdp=2, model=2): the full image->loss pipeline compiles and runs
under GSPMD, losses decrease, and freeze policies hold (SURVEY.md §4c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
from cambrian_tpu.data.packing import prepare_multimodal_data
from cambrian_tpu.models.cambrian import CambrianLM
from cambrian_tpu.models.config import tiny_debug
from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list
from cambrian_tpu.parallel.mesh import MeshConfig, create_mesh
from cambrian_tpu.parallel.sharding import infer_param_shardings
from cambrian_tpu.train.optimizer import TrainConfig, label_params
from cambrian_tpu.train.train_step import (
    batch_shardings,
    init_train_state,
    make_train_step,
    state_shardings,
)

RNG = np.random.default_rng(11)


def _make_batch(cfg, towers, batch_size=8):
    seq = 40
    ids = RNG.integers(5, cfg.vocab_size, (batch_size, seq)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    mask = np.ones((batch_size, seq), dtype=bool)
    pids, plabels, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, labels, mask, [(640, 360)] * batch_size, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, cfg.tokenizer_model_max_length,
    )
    images = [
        jnp.asarray(RNG.standard_normal(
            (batch_size, 3, t.image_size, t.image_size), dtype=np.float32))
        for t in towers
    ]
    return {
        "input_ids": jnp.asarray(pids),
        "labels": jnp.asarray(plabels),
        "attention_mask": jnp.asarray(pmask),
        "position_ids": jnp.asarray(ppos),
        "images": images,
        "aux_masks": [jnp.asarray(m) for m in aux_masks],
    }


@pytest.fixture(scope="module")
def world():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    cfg = tiny_debug(num_towers=2)
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list
    )
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers))
    batch = _make_batch(cfg, towers)
    tower_params = [t.init(jax.random.PRNGKey(i + 1)) for i, t in enumerate(towers)]
    feats = [t.apply(tp, px) for t, tp, px in zip(towers, tower_params, batch["images"])]
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["position_ids"], feats, batch["aux_masks"],
    )
    return mesh, cfg, model, towers, params, tower_params, batch


def test_sharded_train_step_runs_and_learns(world):
    mesh, cfg, model, towers, params, tower_params, batch = world
    tconf = TrainConfig(learning_rate=1e-3, total_steps=50, warmup_ratio=0.0,
                        lr_scheduler_type="constant")
    state = init_train_state(params, tconf)
    step_fn = make_train_step(model, towers)

    state_sh = state_shardings(state, mesh)
    tower_sh = [infer_param_shardings(tp, mesh) for tp in tower_params]
    batch_sh = batch_shardings(mesh, num_towers=2)

    with jax.set_mesh(mesh):
        # no donation here: the module-scoped fixture params would be aliased
        # and deleted (production loops donate the state; see train/trainer.py)
        jstep = jax.jit(step_fn, in_shardings=(state_sh, tower_sh, batch_sh),
                        out_shardings=(state_sh, None))
        state = jax.device_put(state, state_sh)
        tps = [jax.device_put(tp, sh) for tp, sh in zip(tower_params, tower_sh)]
        b = jax.device_put(batch, batch_sh)

        losses = []
        for _ in range(5):
            state, metrics = jstep(state, tps, b)
            losses.append(float(metrics["loss"]))

    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_param_shardings_actually_shard(world):
    mesh, cfg, model, towers, params, *_ = world
    sh = infer_param_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    sharded = [
        s for p, s in flat if any(ax is not None for ax in s.spec)
    ]
    assert len(sharded) > 20, "expected most matrices to be sharded"
    # a q_proj kernel must be (fsdp, model) sharded
    qspec = {
        jax.tree_util.keystr(p): s.spec for p, s in flat
        if "q_proj" in jax.tree_util.keystr(p) and "kernel" in jax.tree_util.keystr(p)
    }
    assert any(spec == ("fsdp", "model") for spec in qspec.values()), qspec


def test_freeze_policy_stage1(world):
    mesh, cfg, model, towers, params, tower_params, batch = world
    tconf = TrainConfig(learning_rate=1e-2, total_steps=10, warmup_ratio=0.0,
                        lr_scheduler_type="constant", tune_mm_mlp_adapter=True)
    labels = label_params(params, tconf)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    by_path = {jax.tree_util.keystr(p): l for p, l in flat}
    # decoder + embeddings frozen; connector trainable
    assert all(
        l == "frozen" for p, l in by_path.items() if "layers_0/self_attn" in p or "embed_tokens" in p
    )
    assert all(
        l != "frozen" for p, l in by_path.items()
        if "vision_query" in p or "mm_projector/" in p or "vision_sampler_0" in p
    )

    state = init_train_state(params, tconf)
    # freeze=tconf is how the trainer wires it: frozen subtrees run under
    # stop_gradient, so no decoder dW is ever computed (34B stage-1 OOM fix)
    # and the clip norm covers trainable grads only (reference semantics).
    step_fn = make_train_step(model, towers, freeze=tconf)
    with jax.set_mesh(mesh):
        jstep = jax.jit(step_fn)
        # two steps: warmup LR is 0 at step 0 by construction
        state2, m1 = jstep(state, tower_params, batch)
        state2, _ = jstep(state2, tower_params, batch)
    # frozen decoder weights unchanged; connector weights moved
    before = params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    after = state2.params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    vq_before = params["params"]["vision_query"]
    vq_after = state2.params["params"]["vision_query"]
    assert np.abs(np.asarray(vq_after - vq_before)).max() > 0

    # grad_norm under stop_gradient counts trainable grads only: it must be
    # strictly below the all-params norm (real-but-discarded frozen grads)
    step_all = make_train_step(model, towers)
    with jax.set_mesh(mesh):
        _, m_all = jax.jit(step_all)(state, tower_params, batch)
    assert float(m1["grad_norm"]) < float(m_all["grad_norm"]), (
        float(m1["grad_norm"]), float(m_all["grad_norm"]))
