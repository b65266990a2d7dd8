"""Checkpoint writing: HF-layout directory (config.json + safetensors) using
the published parameter naming, consumable by ``load_pretrained_model`` and
by the reference implementation's loaders (SURVEY.md §5 checkpoint formats,
format (3))."""

import json
import os
from typing import Any, Optional

import numpy as np

from ..models.config import CambrianConfig
from .hf_llm import export_cambrian

_REVERSE_MODEL_TYPE = {
    "llama": "cambrian_llama",
    "phi3": "cambrian_phi3",
    "mistral": "cambrian_mistral",
    "gemma": "cambrian_gemma",
    "cohere": "cambrian_cohere",
}


def save_pretrained(params: Any, config: CambrianConfig, path: str,
                    tokenizer: Optional[Any] = None,
                    shard_size_bytes: int = 4 * 1024 ** 3) -> None:
    """Write an HF-format checkpoint directory."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    raw = config.to_dict()
    raw["model_type"] = _REVERSE_MODEL_TYPE.get(config.model_type, config.model_type)
    raw["architectures"] = ["CambrianLlamaForCausalLM"]
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(raw, f, indent=2, sort_keys=True)

    if "params" in params:
        params = params["params"]
    sd = export_cambrian(params, config)
    # ascontiguousarray is load-bearing: safetensors' numpy writer serializes
    # the raw underlying buffer, so a transposed VIEW (every exported
    # `kernel.T`) would be written with the transposed shape but the
    # original element order — silent weight corruption on load (caught by
    # tests/test_topology_checkpoint.py round-trip, r3)
    sd = {k: np.ascontiguousarray(np.asarray(v)) for k, v in sd.items()}

    # greedy sharding by size
    shards, cur, cur_bytes = [], {}, 0
    for k, v in sd.items():
        nbytes = v.nbytes
        if cur and cur_bytes + nbytes > shard_size_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += nbytes
    if cur:
        shards.append(cur)

    if len(shards) == 1:
        save_file(shards[0], os.path.join(path, "model.safetensors"))
    else:
        index = {"metadata": {"total_size": sum(v.nbytes for v in sd.values())},
                 "weight_map": {}}
        for i, shard in enumerate(shards):
            fname = f"model-{i + 1:05d}-of-{len(shards):05d}.safetensors"
            save_file(shard, os.path.join(path, fname))
            for k in shard:
                index["weight_map"][k] = fname
        with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
            json.dump(index, f, indent=2)

    if tokenizer is not None:
        tokenizer.save_pretrained(path)
