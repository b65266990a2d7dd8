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


def test_deep_checkpoints_default_to_scan(tmp_path):
    """load_config turns scan_layers on for 40+-layer checkpoints unless the
    config pins it (34B compile-time default)."""
    import json

    from cambrian_tpu.models.builder import load_config

    base = dict(model_type="cambrian_llama", vocab_size=256, hidden_size=64,
                intermediate_size=128, num_attention_heads=4,
                num_key_value_heads=4,
                mm_vision_tower_aux_list=["debug-tower-0"],
                mm_vision_tower_aux_token_len_list=[16],
                query_num_list=[16], image_token_len=16, num_query_group=1,
                vision_hidden_size=32)
    for layers, pinned, expect in [(60, None, True), (60, False, False),
                                   (32, None, False)]:
        cfg_raw = dict(base, num_hidden_layers=layers)
        if pinned is not None:
            cfg_raw["scan_layers"] = pinned
        d = tmp_path / f"ckpt_{layers}_{pinned}"
        d.mkdir()
        (d / "config.json").write_text(json.dumps(cfg_raw))
        assert load_config(str(d)).scan_layers is expect, (layers, pinned)
