"""Checkpoint loader: the reference's public entry point
``load_pretrained_model`` (model/builder.py:29-173) re-implemented for the
JAX stack. Returns ``(tokenizer, model, image_processor_list, context_len)``
where ``model`` is a :class:`CambrianForInference` bundle exposing
``generate`` / ``process`` with the reference's semantics.

Checkpoint format: an HF-style directory with ``config.json`` (self-
describing, incl. all SVA hyperparams — cambrian_arch.py:113-121) and
``*.safetensors`` / ``pytorch_model*.bin`` shards in the published parameter
naming. Vision-tower weights load from local snapshot dirs (zero-egress
environments) resolved via ``CAMBRIAN_TOWER_CACHE`` or an HF cache layout;
missing towers fall back to random init with a loud warning.
"""

import glob
import json
import os
import warnings
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from ..data.packing import prepare_multimodal_data
from ..mm_utils import process_images, tokenizer_image_token, tokenizer_image_token_llama3
from .cambrian import CambrianLM
from .config import CambrianConfig
from .encoders.base import VisionTower, build_vision_tower_aux_list


def _load_state_dict(model_path: str) -> dict:
    """Flat {name: numpy} from safetensors or torch .bin shards."""
    sd = {}
    st_files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="numpy") as sf:
                for k in sf.keys():
                    sd[k] = sf.get_tensor(k)
        return sd
    bin_files = sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin"))) or \
        sorted(glob.glob(os.path.join(model_path, "*.pth")))
    if bin_files:
        import torch

        for f in bin_files:
            chunk = torch.load(f, map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
                       for k, v in chunk.items()})
        return sd
    raise FileNotFoundError(f"no weight shards found in {model_path}")


_MODEL_TYPE_MAP = {
    "cambrian_llama": "llama",
    "cambrian_phi3": "phi3",
    "cambrian_mistral": "mistral",
    "cambrian_gemma": "gemma",
    "cambrian_cohere": "cohere",
}


def load_config(model_path: str) -> CambrianConfig:
    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    raw["model_type"] = _MODEL_TYPE_MAP.get(raw.get("model_type", "llama"),
                                            raw.get("model_type", "llama"))
    if "tokenizer_model_max_length" not in raw:
        raw["tokenizer_model_max_length"] = raw.get("max_position_embeddings", 2048)
    if "scan_layers" not in raw and raw.get("num_hidden_layers", 0) >= 40:
        # 34B-class checkpoints (60 layers): scan the uniform decoder runs by
        # default — greedy tokens are identical to the unrolled loop
        # (tests/test_scan_layers.py) and trace time stays one-layer-sized
        # (docs/PERF_NOTES.md). Set "scan_layers": false in config.json to
        # opt out.
        raw["scan_layers"] = True
    return CambrianConfig.from_dict(raw)


def _tower_snapshot_dir(tower: VisionTower) -> Optional[str]:
    """Resolve a local snapshot for a tower's upstream repo (zero-egress)."""
    if tower.hf_repo is None:
        return None
    candidates = []
    cache = os.environ.get("CAMBRIAN_TOWER_CACHE")
    if cache:
        candidates.append(os.path.join(cache, tower.hf_repo.replace("/", "--")))
        candidates.append(os.path.join(cache, tower.hf_repo))
    hf_home = os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    hub_dir = os.path.join(hf_home, "hub",
                           "models--" + tower.hf_repo.replace("/", "--"), "snapshots")
    if os.path.isdir(hub_dir):
        snaps = sorted(os.listdir(hub_dir))
        if snaps:
            candidates.append(os.path.join(hub_dir, snaps[-1]))
    for c in candidates:
        if os.path.isdir(c):
            return c
    return None


def load_tower_params(tower: VisionTower, rng=None):
    """Tower weights from a local snapshot, else random init with a warning."""
    from ..checkpoint import hf_vision

    snap = _tower_snapshot_dir(tower)
    if snap is not None:
        sd = _load_state_dict(snap)
        name = tower.name.lower()
        if "convnext" in name:
            return jax.tree.map(jnp.asarray,
                                hf_vision.convert_convnext(sd, tower.config))
        if "siglip" in name:
            timm_style = any(".attn.qkv." in k for k in sd)
            conv = (hf_vision.convert_siglip_timm if timm_style
                    else hf_vision.convert_siglip_vision)
            return jax.tree.map(jnp.asarray, conv(sd, tower.config))
        if "dinov2" in name:
            return jax.tree.map(jnp.asarray,
                                hf_vision.convert_dinov2(sd, tower.config))
        if "midas" in name:
            return jax.tree.map(jnp.asarray,
                                hf_vision.convert_dpt_vit(sd, tower.config))
        if "eva" in name:
            return jax.tree.map(jnp.asarray,
                                hf_vision.convert_eva02(sd, tower.config))
        if "diffusion" in name or "pixart" in name:
            return jax.tree.map(jnp.asarray,
                                hf_vision.convert_sd_tower(sd, tower.config))
        return jax.tree.map(jnp.asarray,
                            hf_vision.convert_clip_vision(sd, tower.config))
    if tower.hf_repo is not None:
        warnings.warn(
            f"No local snapshot for tower {tower.name} ({tower.hf_repo}); "
            "using RANDOM weights. Set CAMBRIAN_TOWER_CACHE for real inference."
        )
    return tower.init(jax.random.PRNGKey(0) if rng is None else rng)


@dataclass
class CambrianForInference:
    """User-facing bundle: config + params + towers + generation."""

    config: CambrianConfig
    lm: CambrianLM
    params: Any
    towers: List[VisionTower]
    tower_params: List[Any]
    tokenizer: Any = None
    _engine: Any = None

    @property
    def engine(self):
        if self._engine is None:
            from ..infer.engine import GenerationEngine

            self._engine = GenerationEngine(
                self.lm, self.params, self.towers,
                max_len=self.config.tokenizer_model_max_length + 1024,
            )
        return self._engine

    def pack_prompt(self, input_ids: np.ndarray, image_size: Tuple[int, int],
                    pad_to: Optional[int] = None):
        """Expand the <image> marker into the static block and build masks.
        ``input_ids``: 1-D token ids containing IMAGE_TOKEN_INDEX."""
        ids = np.asarray(input_ids)[None]
        labels = np.full_like(ids, IGNORE_INDEX)
        mask = np.ones_like(ids, dtype=bool)
        max_len = pad_to or (ids.shape[1] + self.config.image_block_len - 1)
        pids, _, pmask, ppos, aux_masks = prepare_multimodal_data(
            ids, labels, mask, [image_size], self.config.image_token_len,
            self.config.mm_vision_tower_aux_token_len_list, max_len,
        )
        return pids, pmask, ppos, aux_masks

    def generate(self, input_ids: np.ndarray, images: Optional[Sequence] = None,
                 image_sizes: Optional[Sequence] = None, **gen_kwargs) -> np.ndarray:
        """Reference generate() semantics (cambrian_llama.py:437-483): packed
        prompt + per-tower image batches -> generated ids."""
        args = self._prepare_generate(input_ids, images, image_sizes, **gen_kwargs)
        return self.engine.generate(*args)

    def generate_stream(self, input_ids: np.ndarray,
                        images: Optional[Sequence] = None,
                        image_sizes: Optional[Sequence] = None, **gen_kwargs):
        """Yields generated ids so far after each decode step (serving tier)."""
        args = self._prepare_generate(input_ids, images, image_sizes, **gen_kwargs)
        yield from self.engine.generate_stream(*args)

    def _prepare_generate(self, input_ids, images=None, image_sizes=None,
                          **gen_kwargs):
        from ..infer.engine import GenerationConfig

        if images is not None:
            image_size = image_sizes[0] if image_sizes else (
                self.towers[0].image_size, self.towers[0].image_size)
            pids, pmask, ppos, aux_masks = self.pack_prompt(input_ids, image_size)
            feats = self.engine.encode_images(
                self.tower_params, [jnp.asarray(im) for im in images]
            )
            aux_masks = [jnp.asarray(m) for m in aux_masks]
        else:
            pids = np.asarray(input_ids)[None]
            pmask = np.ones_like(pids, dtype=bool)
            ppos = np.tile(np.arange(pids.shape[1]), (pids.shape[0], 1))
            feats, aux_masks = None, None

        cfg = GenerationConfig(
            max_new_tokens=gen_kwargs.get("max_new_tokens", 128),
            temperature=gen_kwargs.get("temperature", 0.0) if
            gen_kwargs.get("do_sample", False) else 0.0,
            top_p=gen_kwargs.get("top_p", 1.0) or 1.0,
            eos_token_id=gen_kwargs.get(
                "eos_token_id",
                getattr(self.tokenizer, "eos_token_id", None) or self.config.eos_token_id,
            ),
            stream_chunk=gen_kwargs.get("stream_chunk", 8),
        )
        return pids, pmask, ppos, feats, aux_masks, cfg


def initialize_vision_tokenizer(params, tokenizer, config: CambrianConfig,
                                mm_use_im_start_end: bool = False,
                                mm_use_im_patch_token: bool = False):
    """Add image special tokens and mean-init the new embedding rows
    (reference cambrian_arch.py:611-653). Returns (params, config) with the
    resized vocab; the tokenizer is mutated in place."""
    from ..constants import (
        DEFAULT_IM_END_TOKEN,
        DEFAULT_IM_START_TOKEN,
        DEFAULT_IMAGE_PATCH_TOKEN,
    )

    new_tokens = []
    if mm_use_im_patch_token:
        new_tokens.append(DEFAULT_IMAGE_PATCH_TOKEN)
    if mm_use_im_start_end:
        new_tokens.extend([DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN])
    if not new_tokens:
        return params, config
    num_new = tokenizer.add_tokens(new_tokens, special_tokens=True)
    if num_new == 0:
        return params, config

    tree = params["params"] if "params" in params else params
    embed = tree["embed_tokens"]["embedding"]
    mean_row = jnp.mean(embed, axis=0, keepdims=True)
    tree["embed_tokens"]["embedding"] = jnp.concatenate(
        [embed, jnp.tile(mean_row, (num_new, 1))], axis=0)
    if "lm_head" in tree:
        head = tree["lm_head"]["kernel"]  # [H, V]
        mean_col = jnp.mean(head, axis=1, keepdims=True)
        tree["lm_head"]["kernel"] = jnp.concatenate(
            [head, jnp.tile(mean_col, (1, num_new))], axis=1)
    config = config.replace(vocab_size=config.vocab_size + num_new)
    return params, config


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    model_name: Optional[str] = None,
    load_8bit: bool = False,
    load_4bit: bool = False,
    device_map: str = "auto",
    device: str = "tpu",
    use_flash_attn: bool = False,
    dtype=jnp.bfloat16,
    **kwargs,
):
    """(tokenizer, model, image_processor_list, context_len) — reference
    model/builder.py:29-173 semantics on the JAX stack."""
    if load_8bit and load_4bit:
        raise ValueError("load_8bit and load_4bit are mutually exclusive")
    from transformers import AutoTokenizer

    from ..checkpoint.hf_llm import convert_cambrian

    quant_mode = "int8" if load_8bit else "int4" if load_4bit else None
    config = load_config(model_path)
    if quant_mode:
        # weight-only quantized decoder GEMMs (reference builder.py:35-44
        # loads bitsandbytes int8/nf4 linears; lm_head/embeddings stay full
        # precision). int4 packs two nibbles per byte with K-groupwise scales
        # (ops/quant.py) — the 34B-on-small-slices capacity option.
        config = config.replace(quantize=quant_mode)
    if kwargs.get("lm_head_bf16"):
        # serving option: halve the vocab-head HBM read (fp32 accumulation,
        # greedy-parity-gated — models/cambrian.py::_logits)
        config = config.replace(lm_head_dtype="bf16")
    towers = build_vision_tower_aux_list(
        config.mm_vision_tower_aux_list,
        config.mm_vision_tower_aux_token_len_list,
        dtype=dtype,
    )
    lm = CambrianLM(config, tuple(t.hidden_size for t in towers), dtype=dtype)

    sd = _load_state_dict(model_path)
    params = {"params": jax.tree.map(jnp.asarray, convert_cambrian(sd, config))}
    if config.lm_head_dtype == "bf16" and "lm_head" in params["params"]:
        params["params"]["lm_head"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), params["params"]["lm_head"])
    if quant_mode:
        from ..ops.quant import quantize_dense_tree

        layers = params["params"]
        for name in list(layers):
            if name.startswith("layers_"):
                layers[name] = quantize_dense_tree(layers[name],
                                                   mode=quant_mode)
    tower_params = [load_tower_params(t, jax.random.PRNGKey(i))
                    for i, t in enumerate(towers)]

    tokenizer = None
    try:
        tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)
    except Exception as e:  # tokenizer-less test checkpoints
        warnings.warn(f"tokenizer not loaded from {model_path}: {e}")

    model = CambrianForInference(
        config=config, lm=lm, params=params, towers=towers,
        tower_params=tower_params, tokenizer=tokenizer,
    )
    image_processor_list = [t.image_processor for t in towers]
    context_len = config.tokenizer_model_max_length
    return tokenizer, model, image_processor_list, context_len
