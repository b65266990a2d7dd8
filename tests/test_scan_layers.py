"""scan_layers: lax.scan over uniform decoder runs must match the unrolled
loop exactly (same per-layer params, same math) in forward, prefill, and
decode — and compile fewer distinct layer bodies."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import __graft_entry__
from cambrian_tpu.infer.engine import GenerationConfig, GenerationEngine
from cambrian_tpu.models.cambrian import CambrianLM


@pytest.fixture(scope="module")
def built():
    return __graft_entry__._build(num_towers=1, batch=2)


def _logits(model, params, towers, tower_params, batch):
    feats = [t.apply(tp, px)
             for t, tp, px in zip(towers, tower_params, batch["images"])]
    return model.apply(params, batch["input_ids"], batch["attention_mask"],
                       batch["position_ids"], feats, batch["aux_masks"])


def test_scan_forward_matches_unrolled(built):
    cfg, model, towers, params, tower_params, batch = built
    scan_model = CambrianLM(cfg.replace(scan_layers=True),
                            model.tower_hidden_sizes)
    base = np.asarray(_logits(model, params, towers, tower_params, batch))
    scanned = np.asarray(_logits(scan_model, params, towers, tower_params, batch))
    # scan changes XLA fusion/accumulation order slightly (bf16 compute);
    # greedy decode below is still token-exact
    np.testing.assert_allclose(scanned, base, rtol=2e-3, atol=1e-5)


def test_scan_generate_matches_unrolled(built):
    cfg, model, towers, params, tower_params, batch = built
    feats = [t.apply(tp, px)
             for t, tp, px in zip(towers, tower_params, batch["images"])]
    gcfg = GenerationConfig(max_new_tokens=7, temperature=0.0)
    outs = []
    for m in (model, CambrianLM(cfg.replace(scan_layers=True),
                                model.tower_hidden_sizes)):
        engine = GenerationEngine(m, params, towers=towers, max_len=128)
        outs.append(engine.generate(
            np.asarray(batch["input_ids"]), np.asarray(batch["attention_mask"]),
            np.asarray(batch["position_ids"]), aux_features=feats,
            aux_masks=batch["aux_masks"], config=gcfg))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_scan_init_creates_same_params(built):
    """init with scan_layers=True must create the identical per-layer tree
    (checkpoint compatibility)."""
    cfg, model, towers, params, tower_params, batch = built
    scan_model = CambrianLM(cfg.replace(scan_layers=True),
                            model.tower_hidden_sizes)
    feats = [t.apply(tp, px)
             for t, tp, px in zip(towers, tower_params, batch["images"])]
    p2 = jax.eval_shape(
        lambda: scan_model.init(jax.random.PRNGKey(0), batch["input_ids"],
                                batch["attention_mask"], batch["position_ids"],
                                feats, batch["aux_masks"]))
    flat1 = {"/".join(map(str, k)): (v.shape, str(v.dtype))
             for k, v in jax.tree_util.tree_flatten_with_path(
                 jax.eval_shape(lambda: params))[0]}
    flat2 = {"/".join(map(str, k)): (v.shape, str(v.dtype))
             for k, v in jax.tree_util.tree_flatten_with_path(p2)[0]}
    assert flat1 == flat2
