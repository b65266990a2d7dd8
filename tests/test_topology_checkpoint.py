"""Topology-change checkpoint tests (VERDICT r2 item 6): Orbax training
state saved under one mesh must restore BIT-IDENTICALLY under different mesh
geometries (the pod-resize / train-on-pod-consolidate-on-VM reality the
reference handled with per-rank torch shards + consolidate.py:55-138), and
the consolidate -> HF -> load_pretrained_model pipeline must work from a
mesh-saved checkpoint.

Uses the REAL CambrianTrainer checkpoint methods (trainer.py:169-202) so the
trainer's Composite layout is what gets exercised, with one real sharded
train step first so optimizer state is non-trivial.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

import __graft_entry__
from cambrian_tpu.train.optimizer import TrainConfig
from cambrian_tpu.train.train_step import (
    batch_shardings,
    init_train_state,
    make_train_step,
    state_shardings,
)
from cambrian_tpu.train.trainer import CambrianTrainer, TrainingArguments
from cambrian_tpu.parallel.sharding import infer_param_shardings


def _trainer_for_mesh(out_dir, data, fsdp, model):
    args = TrainingArguments(output_dir=out_dir, mesh_data=data,
                             mesh_fsdp=fsdp, mesh_model=model)
    return CambrianTrainer(model=None, towers=None, args=args,
                           train_dataset=None, data_collator=None,
                           tower_params=None)


@pytest.fixture(scope="module")
def saved_state(tmp_path_factory):
    """One sharded train step on mesh (2,2,2), saved via the trainer."""
    out = str(tmp_path_factory.mktemp("topo_ckpt"))
    cfg, model, towers, params, tower_params, batch = __graft_entry__._build(
        num_towers=2, batch=4)

    tconf = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
                        lr_scheduler_type="constant")
    state = init_train_state(params, tconf)
    step_fn = make_train_step(model, towers)

    trainer = _trainer_for_mesh(out, 2, 2, 2)
    mesh = trainer.mesh
    state_sh = state_shardings(state, mesh)
    tower_sh = [infer_param_shardings(tp, mesh) for tp in tower_params]
    batch_sh = batch_shardings(mesh, num_towers=len(towers))

    with jax.set_mesh(mesh):
        jstep = jax.jit(step_fn, in_shardings=(state_sh, tower_sh, batch_sh),
                        out_shardings=(state_sh, None))
        state = jax.device_put(state, state_sh)
        tps = [jax.device_put(tp, sh) for tp, sh in zip(tower_params, tower_sh)]
        b = jax.device_put(batch, batch_sh)
        state, metrics = jstep(state, tps, b)
    assert np.isfinite(float(metrics["loss"]))

    rng = jax.random.PRNGKey(17)
    trainer._save_checkpoint(state, rng, step=1)
    host_state = jax.device_get(state)
    return out, cfg, model, towers, host_state, np.asarray(rng)


@pytest.mark.parametrize("geometry", [(8, 1, 1), (1, 4, 2)])
def test_restore_under_different_mesh(saved_state, geometry, tmp_path):
    out, cfg, model, towers, host_state, rng_np = saved_state
    d, f, m = geometry
    trainer = _trainer_for_mesh(out, d, f, m)
    mesh = trainer.mesh
    assert tuple(mesh.shape[a] for a in ("data", "fsdp", "model")) == geometry

    # zeroed template sharded under the NEW mesh
    tconf = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
                        lr_scheduler_type="constant")
    template = init_train_state(jax.tree.map(jnp.zeros_like,
                                             host_state.params), tconf)
    sh = state_shardings(template, mesh)
    with jax.set_mesh(mesh):
        template = jax.device_put(template, sh)
        restored, rng, step = trainer._restore_checkpoint(
            template, jax.random.PRNGKey(0))

    assert step == 1
    np.testing.assert_array_equal(np.asarray(rng), rng_np)

    # every param and optimizer leaf identical to the mesh-A state
    flat_a = jax.tree_util.tree_leaves_with_path(host_state.params)
    flat_b = jax.tree_util.tree_leaves_with_path(
        jax.device_get(restored.params))
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))
    mu_a = jax.tree.leaves(host_state.opt_state)
    mu_b = jax.tree.leaves(jax.device_get(restored.opt_state))
    assert len(mu_a) == len(mu_b)
    nonzero = 0
    for la, lb in zip(mu_a, mu_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        if np.asarray(la).size and np.abs(np.asarray(la)).sum() > 0:
            nonzero += 1
    assert nonzero > 0, "optimizer state was trivially zero — test is vacuous"


def test_consolidate_from_mesh_checkpoint(saved_state, tmp_path):
    """Mesh-saved Orbax checkpoint -> consolidate -> HF safetensors ->
    load_pretrained_model, with weights matching the saved state."""
    out, cfg, model, towers, host_state, _ = saved_state
    with open(os.path.join(out, "config.json"), "w") as f:
        f.write(cfg.to_json())

    from cambrian_tpu.checkpoint.consolidate import consolidate
    from cambrian_tpu.models.builder import load_pretrained_model

    hf_dir = str(tmp_path / "hf")
    consolidate(out, hf_dir)
    tokenizer, loaded, procs, _ = load_pretrained_model(hf_dir)

    want = np.asarray(host_state.params["params"]["vision_query"])
    got = np.asarray(loaded.params["params"]["vision_query"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    want = np.asarray(
        host_state.params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"])
    got = np.asarray(
        loaded.params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)  # bf16 export
