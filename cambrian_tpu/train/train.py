"""Training entry point — the reference's train() (train_fsdp.py:1400-1781)
re-designed for single-controller GSPMD: no xmp.spawn, no FSDP wrapper, no
dtype monkey patches (fp32 RMSNorm and bias harmonization are defaults of the
model core).

Usage:
    python -m cambrian_tpu.train.train \
        --model_name_or_path <hf-dir-or-stock-name> \
        --data_path train.jsonl --image_folder images/ \
        --vision_tower_aux_list '["siglip/CLIP-ViT-SO400M-14-384", ...]' \
        --vision_tower_aux_token_len_list '[576, ...]' \
        --output_dir ckpt/ ...
"""

import json
import logging
import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import conversation as conversation_lib
from ..models.cambrian import CambrianLM
from ..models.config import (
    CAMBRIAN_SVA,
    COMMAND_R_35B,
    CambrianConfig,
    GEMMA_7B,
    LLAMA3_8B,
    PHI3_MINI,
    VICUNA_13B,
    YI_34B,
    tiny_debug,
)
from ..models.encoders.base import build_vision_tower_aux_list
from ..models.builder import load_tower_params
from .trainer import CambrianTrainer, TrainingArguments

logger = logging.getLogger(__name__)


@dataclass
class ModelArguments:
    """SVA + model flags (train_fsdp.py:83-107)."""

    model_name_or_path: str = "llama3-8b"
    version: str = "llama_3"
    vision_tower_aux_list: str = json.dumps([
        "siglip/CLIP-ViT-SO400M-14-384",
        "openai/clip-vit-large-patch14-336",
        "facebook/dinov2-giant-res378",
        "clip-convnext-XXL-multi-stage",
    ])
    vision_tower_aux_token_len_list: str = json.dumps([576, 576, 576, 9216])
    image_token_len: int = 576
    num_query_group: int = 1
    query_num_list: str = json.dumps([576])
    connector_depth: int = 3
    connector_only: bool = False
    num_of_vision_sampler_layers: int = 10
    start_of_vision_sampler_layers: int = 0
    stride_of_vision_sampler_layers: int = 3
    vision_hidden_size: int = 1024
    mm_projector_type: str = "sva"
    mm_vision_select_layer: int = -2
    mm_vision_select_feature: str = "patch"
    pretrain_mm_mlp_adapter: Optional[str] = None
    mm_use_im_start_end: bool = False
    mm_use_im_patch_token: bool = False


@dataclass
class DataArguments:
    """(train_fsdp.py:110-118)."""

    data_path: str = ""
    image_folder: str = ""
    is_multimodal: bool = True
    image_position: int = 91
    image_aspect_ratio: str = "pad"
    lazy_preprocess: bool = True
    model_max_length: int = 2048


_STOCK = {
    "llama3-8b": LLAMA3_8B, "llama-3-8b": LLAMA3_8B,
    "vicuna-13b": VICUNA_13B, "yi-34b": YI_34B, "phi3": PHI3_MINI,
    "phi-3": PHI3_MINI, "gemma-7b": GEMMA_7B, "gemma": GEMMA_7B,
    "command-r": COMMAND_R_35B, "c4ai": COMMAND_R_35B, "tiny-debug": None,
}


def build_config(model_args: ModelArguments, data_args: DataArguments) -> CambrianConfig:
    name = model_args.model_name_or_path
    sva = dict(
        mm_projector_type=model_args.mm_projector_type,
        vision_hidden_size=model_args.vision_hidden_size,
        num_query_group=model_args.num_query_group,
        query_num_list=tuple(json.loads(model_args.query_num_list)),
        connector_depth=model_args.connector_depth,
        connector_only=model_args.connector_only,
        num_of_vision_sampler_layers=model_args.num_of_vision_sampler_layers,
        start_of_vision_sampler_layers=model_args.start_of_vision_sampler_layers,
        stride_of_vision_sampler_layers=model_args.stride_of_vision_sampler_layers,
        image_token_len=model_args.image_token_len,
        image_position=data_args.image_position,
        mm_vision_tower_aux_list=tuple(json.loads(model_args.vision_tower_aux_list)),
        mm_vision_tower_aux_token_len_list=tuple(
            json.loads(model_args.vision_tower_aux_token_len_list)),
        mm_vision_select_layer=model_args.mm_vision_select_layer,
        mm_vision_select_feature=model_args.mm_vision_select_feature,
        tokenizer_model_max_length=data_args.model_max_length,
    )
    if os.path.isdir(name) and os.path.exists(os.path.join(name, "config.json")):
        from ..models.builder import load_config

        base = load_config(name).to_dict()
        base.update(sva)
        return CambrianConfig.from_dict(base)
    key = name.lower().split("/")[-1]
    for stock_key, stock in _STOCK.items():
        if stock_key in key:
            if stock is None:
                cfg = tiny_debug()
                return cfg.replace(image_position=data_args.image_position,
                                   tokenizer_model_max_length=data_args.model_max_length)
            return CambrianConfig(**{**stock, **sva})
    raise ValueError(f"unknown model {name}")


def train(model_args: ModelArguments, data_args: DataArguments,
          training_args: TrainingArguments, tokenizer=None):
    # Join the multi-host runtime (no-op single process / auto-detect on TPU
    # pods) BEFORE any backend touch so jax.devices() is the global list.
    from ..parallel.distributed import initialize_distributed

    initialize_distributed(training_args.coordinator_address,
                           training_args.num_processes,
                           training_args.process_id)

    conversation_lib.default_conversation = conversation_lib.conv_templates[
        model_args.version
    ]

    config = build_config(model_args, data_args)
    dtype = jnp.bfloat16 if training_args.bf16 else jnp.float32
    towers = build_vision_tower_aux_list(
        config.mm_vision_tower_aux_list, config.mm_vision_tower_aux_token_len_list,
        dtype=dtype,
    )
    model = CambrianLM(config, tuple(t.hidden_size for t in towers), dtype=dtype)

    if tokenizer is None:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_args.model_name_or_path)
    tokenizer.model_max_length = data_args.model_max_length
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.eos_token

    # data
    data_args.image_processor_aux_list = [t.image_processor for t in towers]
    data_args.image_token_len = config.image_token_len
    data_args.image_token_len_aux_list = list(config.mm_vision_tower_aux_token_len_list)
    from ..data.dataset import make_supervised_data_module

    data_module = make_supervised_data_module(tokenizer, data_args)

    # params
    tower_params = [load_tower_params(t, jax.random.PRNGKey(i + 1))
                    for i, t in enumerate(towers)]
    name = model_args.model_name_or_path
    if os.path.isdir(name) and any(
        f.endswith((".safetensors", ".bin")) for f in os.listdir(name)
    ):
        from ..checkpoint.hf_llm import convert_cambrian
        from ..models.builder import _load_state_dict

        sd = _load_state_dict(name)
        try:
            params = {"params": jax.tree.map(jnp.asarray, convert_cambrian(sd, config))}
        except KeyError:
            # plain-LLM checkpoint: decoder weights only, fresh connector
            from ..checkpoint.hf_llm import convert_llama_decoder

            params = _init_params(model, towers, config)
            params["params"].update(
                jax.tree.map(jnp.asarray, convert_llama_decoder(sd, config)))
            if "lm_head.weight" in sd:
                params["params"]["lm_head"] = {
                    "kernel": jnp.asarray(sd["lm_head.weight"].T)}
    else:
        params = _init_params(model, towers, config)

    # stage-2 from a stage-1 connector dump (train_fsdp pretrain_mm_mlp_adapter)
    if model_args.pretrain_mm_mlp_adapter:
        from ..checkpoint.hf_llm import convert_cambrian
        from ..models.builder import _load_state_dict

        adapter_sd = _load_state_dict(model_args.pretrain_mm_mlp_adapter) \
            if os.path.isdir(model_args.pretrain_mm_mlp_adapter) else None
        if adapter_sd is None:
            import torch

            adapter_sd = {
                k: v.float().numpy()
                for k, v in torch.load(model_args.pretrain_mm_mlp_adapter,
                                       map_location="cpu",
                                       weights_only=True).items()
            }
        connector_keys = ("mm_projector", "vision_sampler", "vision_query",
                          "image_newline")
        converted = convert_cambrian(
            {**adapter_sd}, config
        ) if any(k.startswith("model.layers") for k in adapter_sd) else None
        if converted is None:
            # connector-only dump: convert just the matching subtrees
            full = {k: v for k, v in adapter_sd.items()}
            from ..checkpoint import hf_llm

            tmp = {}
            num_towers = len(towers)
            if "model.mm_projector.0.weight" in full:
                tmp["mm_projector"] = {
                    "fc1": {"kernel": full["model.mm_projector.0.weight"].T,
                            "bias": full["model.mm_projector.0.bias"]},
                    "fc2": {"kernel": full["model.mm_projector.2.weight"].T,
                            "bias": full["model.mm_projector.2.bias"]},
                }
            for i in range(num_towers):
                pfx = f"model.mm_projector_aux_{i}."
                if pfx + "0.weight" in full:
                    tmp[f"mm_projector_aux_{i}"] = {
                        "fc1": {"kernel": full[pfx + "0.weight"].T,
                                "bias": full[pfx + "0.bias"]},
                        "fc2": {"kernel": full[pfx + "2.weight"].T,
                                "bias": full[pfx + "2.bias"]},
                        "ln": {"scale": full[pfx + "3.weight"],
                               "bias": full[pfx + "3.bias"]},
                    }
            for g in range(config.num_query_group):
                if f"model.vision_sampler_{g}.layers.0.proj_in.weight" in full:
                    tmp[f"vision_sampler_{g}"] = hf_llm._convert_sampler(
                        full, f"model.vision_sampler_{g}.", config.connector_depth,
                        num_towers)
            if not config.connector_only:
                for k in range(config.num_of_vision_sampler_layers):
                    key = f"model.vision_sampler_layers.{k}.layers.0.proj_in.weight"
                    if key in full:
                        tmp[f"vision_sampler_layers_{k}"] = hf_llm._convert_sampler(
                            full, f"model.vision_sampler_layers.{k}.", 1, num_towers)
            if "model.vision_query" in full:
                tmp["vision_query"] = full["model.vision_query"]
            if "model.image_newline" in full:
                tmp["image_newline"] = full["model.image_newline"]
            converted = tmp
        params["params"].update(jax.tree.map(jnp.asarray, converted))
        logger.info("loaded pretrain_mm_mlp_adapter: %s",
                    sorted(converted.keys()))

    trainer = CambrianTrainer(
        model=model, towers=towers, args=training_args,
        train_dataset=data_module["train_dataset"],
        data_collator=data_module["data_collator"],
        tower_params=tower_params, init_params=params,
    )
    history = trainer.train(
        resume_from_checkpoint=training_args.resume_from_checkpoint is not None
        or training_args.train_continue
    )
    trainer.save_model(training_args.output_dir,
                       state=getattr(trainer, "_final_state", None))
    return history


def _init_params(model, towers, config):
    rng = np.random.default_rng(0)
    b = 1
    ids = np.zeros((b, config.tokenizer_model_max_length), dtype=np.int32)
    mask = np.ones_like(ids, dtype=bool)
    pos = np.tile(np.arange(ids.shape[1]), (b, 1))
    feats = [
        jnp.asarray(rng.standard_normal((b, t.interp_size, t.hidden_size),
                                        dtype=np.float32))
        for t in towers
    ]
    aux_masks = [
        jnp.ones((b, config.image_token_len, w * w), dtype=bool)
        for w in config.cross_att_window_sizes()
    ]
    return model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(pos), feats, aux_masks)


def main():
    import transformers

    parser = transformers.HfArgumentParser(
        (ModelArguments, DataArguments, TrainingArguments))
    model_args, data_args, training_args = parser.parse_args_into_dataclasses()
    logging.basicConfig(level=logging.INFO)
    train(model_args, data_args, training_args)


if __name__ == "__main__":
    main()
