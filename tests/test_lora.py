"""LoRA adapter tests: init/merge semantics, adapter-only gradients, and
state-dict round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.models.cambrian import CambrianLM, cross_entropy_loss
from cambrian_tpu.models.config import tiny_debug
from cambrian_tpu.train.lora import (
    apply_lora,
    init_lora_params,
    lora_from_state_dict,
    lora_state_dict,
    make_lora_loss_fn,
    merge_lora,
)

RNG = np.random.default_rng(13)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_debug(num_towers=1).replace(connector_only=True)
    model = CambrianLM(cfg, (32,))
    ids = RNG.integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), dtype=bool)
    pos = np.tile(np.arange(16), (2, 1))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask), jnp.asarray(pos), None, None)
    return cfg, model, params, (jnp.asarray(ids), jnp.asarray(mask),
                                jnp.asarray(pos))


def test_init_targets_decoder_kernels(setup):
    cfg, model, params, _ = setup
    adapters = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(1))
    assert adapters, "no adapters created"
    assert all("q_proj" in k or "k_proj" in k or "v_proj" in k or "o_proj" in k
               or "gate_proj" in k or "up_proj" in k or "down_proj" in k
               for k in adapters)
    a = next(iter(adapters.values()))
    assert a["a"].shape[1] == 4 and a["b"].shape[0] == 4
    assert float(jnp.abs(a["b"]).max()) == 0.0  # delta starts at zero


def test_zero_b_is_identity(setup):
    cfg, model, params, args = setup
    adapters = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(1))
    merged = apply_lora(params, adapters, alpha=8, rank=4)
    out1 = model.apply(params, *args, None, None)
    out2 = model.apply(merged, *args, None, None)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_adapter_gradients_change_output(setup):
    cfg, model, params, args = setup
    ids = args[0]
    adapters = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(1))

    def base_loss(p):
        return cross_entropy_loss(model.apply(p, *args, None, None), ids)

    wrapped = make_lora_loss_fn(model, params, alpha=8, rank=4,
                                loss_fn=lambda p: base_loss(p))
    grads = jax.grad(wrapped)(adapters)
    # b starts at zero so dL/da == 0 on the first step, but dL/db must flow
    gb = [np.abs(np.asarray(v["b"])).max() for v in grads.values()]
    assert max(gb) > 0

    # one SGD step on adapters changes the merged model's output
    stepped = jax.tree.map(lambda a, g: a - 1e-1 * g, adapters, grads)
    out_before = model.apply(params, *args, None, None)
    out_after = model.apply(merge_lora(params, stepped, 8, 4), *args, None, None)
    assert np.abs(np.asarray(out_after - out_before)).max() > 0


def test_lora_step_honors_loss_chunk(setup):
    """Regression (ADVICE r4 medium): make_lora_train_step must route through
    the same chunked-CE path as the full-finetune step when cfg.loss_chunk is
    set — identical loss and adapter updates, no [B, S, V] logits."""
    from cambrian_tpu.train.optimizer import TrainConfig
    from cambrian_tpu.train.train_step import TrainState, init_train_state, \
        make_lora_train_step

    cfg, model, params, args = setup
    ids, mask, pos = args
    batch = {"input_ids": ids, "labels": ids, "attention_mask": mask,
             "position_ids": pos, "images": None, "aux_masks": None}
    adapters = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(3))
    # b starts at zero -> da == 0; nudge b so both branches produce real grads
    adapters = jax.tree.map(lambda x: x + 0.01, adapters)

    tconf = TrainConfig(learning_rate=1e-2, total_steps=4)
    results = {}
    for chunk in (0, 8, 6):  # 6 does not divide the 16-token sequence
        m = CambrianLM(cfg.replace(loss_chunk=chunk), (32,))
        step = make_lora_train_step(m, None, params, alpha=8, rank=4)
        state = init_train_state(adapters, tconf)
        state, metrics = step(state, None, batch)
        results[chunk] = (float(metrics["loss"]), state.params)

    l0, p0 = results[0]
    for chunk in (8, 6):
        lc, pc = results[chunk]
        assert abs(l0 - lc) < 1e-5, (chunk, l0, lc)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, pc)
        assert max(jax.tree.leaves(diffs)) < 1e-4, chunk


def test_state_dict_roundtrip(setup):
    cfg, model, params, _ = setup
    adapters = init_lora_params(params, rank=2, rng=jax.random.PRNGKey(2))
    sd = lora_state_dict(adapters)
    back = lora_from_state_dict(sd)
    assert set(back) == set(adapters)
    for k in adapters:
        np.testing.assert_array_equal(np.asarray(adapters[k]["a"]),
                                      np.asarray(back[k]["a"]))
