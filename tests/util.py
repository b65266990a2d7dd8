"""Shared test helpers: fabricate a tiny-but-complete local checkpoint
(config.json + safetensors + fast tokenizer) for end-to-end load/generate
tests without network access."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def make_tiny_tokenizer(path: str):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        special_tokens=["<unk>", "<s>", "</s>"], vocab_size=400
    )
    corpus = [
        "hello world what is in this image",
        "a cat sat on the mat",
        "describe the picture please",
        "<image> user assistant system",
    ] * 50
    tok.train_from_iterator(corpus, trainer)
    os.makedirs(path, exist_ok=True)
    tok.save(os.path.join(path, "tokenizer.json"))
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
        }, f)


def make_tiny_checkpoint(path: str, num_towers: int = 2, seed: int = 0):
    """Write a loadable HF-layout Cambrian checkpoint with random weights."""
    from cambrian_tpu.checkpoint.save import save_pretrained
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import tiny_debug
    from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list

    cfg = tiny_debug(num_towers=num_towers)
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list
    )
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers))

    rng = np.random.default_rng(seed)
    ids = np.zeros((1, cfg.tokenizer_model_max_length), dtype=np.int32)
    mask = np.ones_like(ids, dtype=bool)
    pos = np.tile(np.arange(ids.shape[1]), (1, 1))
    feats = [
        jnp.asarray(rng.standard_normal((1, t.interp_size, t.hidden_size),
                                        dtype=np.float32))
        for t in towers
    ]
    aux_masks = [
        jnp.ones((1, cfg.image_token_len, w * w), dtype=bool)
        for w in cfg.cross_att_window_sizes()
    ]
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(ids),
                        jnp.asarray(mask), jnp.asarray(pos), feats, aux_masks)

    save_pretrained(params, cfg, path)
    make_tiny_tokenizer(path)
    return cfg
