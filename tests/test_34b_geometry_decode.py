"""Executed greedy decode at the 34B deployment MESH shape (VERDICT r4
item 5: the repo's best model had AOT-compile rows for the (1,2,4) serve
mesh but had never produced a token at that geometry).

The config is Yi-34B's STRUCTURE at CPU-executable width: scan_layers on,
stride-7 in-LLM SVA injection (pretrain_cambrian_34b.sh:23-28 /
/root/reference/scripts/cambrian/finetune_cambrian_34b.sh), GQA with
kv-heads divisible by the model axis, untied vocab head — decoding
multimodal prompts through the real engine on the (data=1, fsdp=2, model=4)
virtual mesh, with token parity against the single-device engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
from cambrian_tpu.data.packing import prepare_multimodal_data
from cambrian_tpu.infer.engine import GenerationConfig, GenerationEngine
from cambrian_tpu.models.cambrian import CambrianLM
from cambrian_tpu.models.config import tiny_debug
from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list
from cambrian_tpu.parallel.mesh import MeshConfig, create_mesh

RNG = np.random.default_rng(34)


def scaled_34b_config():
    """Yi-34B structure at test width: 14 layers keep two stride-7 injection
    points (the real model runs 60 layers / 9 samplers at stride 7);
    8 heads / 4 kv-heads mirror the 56/8 GQA ratio and shard over model=4."""
    return tiny_debug(num_towers=2).replace(
        model_type="llama",
        num_hidden_layers=14,
        num_attention_heads=8,
        num_key_value_heads=4,
        hidden_size=256,
        intermediate_size=512,
        num_of_vision_sampler_layers=2,
        start_of_vision_sampler_layers=0,
        stride_of_vision_sampler_layers=7,
        scan_layers=True,
        tie_word_embeddings=False,
    )


@pytest.fixture(scope="module")
def bundle():
    cfg = scaled_34b_config()
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list)
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers))

    b, seq = 1, 24
    ids = RNG.integers(5, cfg.vocab_size, (b, seq)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    mask = np.ones((b, seq), dtype=bool)
    pids, _, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, ids.copy(), mask, [(640, 360)] * b, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list,
        cfg.tokenizer_model_max_length,
    )
    tower_params = [t.init(jax.random.PRNGKey(i)) for i, t in enumerate(towers)]
    feats = []
    for t, p in zip(towers, tower_params):
        px = jnp.asarray(RNG.standard_normal(
            (b, 3, t.image_size, t.image_size), dtype=np.float32))
        feats.append(t.apply(p, px))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pids),
                        jnp.asarray(pmask), jnp.asarray(ppos), feats,
                        [jnp.asarray(m) for m in aux_masks])
    prompt = (np.asarray(pids), np.asarray(pmask), np.asarray(ppos),
              feats, [jnp.asarray(m) for m in aux_masks])
    return cfg, model, params, prompt


def test_34b_mesh_decode_matches_single_device(bundle):
    cfg, model, params, (ids, mask, pos, feats, aux_masks) = bundle
    gcfg = GenerationConfig(max_new_tokens=8, temperature=0.0)

    plain = GenerationEngine(model, params, max_len=128,
                             cache_dtype=jnp.float32)
    out_plain = plain.generate(ids, mask, pos, feats, aux_masks, gcfg)

    mesh = create_mesh(MeshConfig(data=1, fsdp=2, model=4),
                       devices=jax.devices()[:8])
    sharded = GenerationEngine(model, params, max_len=128,
                               cache_dtype=jnp.float32, mesh=mesh)
    with jax.set_mesh(mesh):
        out_sharded = sharded.generate(ids, mask, pos, feats, aux_masks, gcfg)

    np.testing.assert_array_equal(np.asarray(out_plain),
                                  np.asarray(out_sharded))
    assert out_plain.shape[1] == 8
