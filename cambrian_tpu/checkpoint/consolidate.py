"""Checkpoint consolidation CLI — the reference's model/consolidate.py +
eval/scripts/convert_hf_model.py pipeline (SURVEY.md §3.5) collapsed into one
step: training checkpoints are Orbax-sharded (not per-rank torch shards), so
"consolidate" = restore the Orbax tree and export HF-format safetensors that
``load_pretrained_model`` (ours or the reference's) can consume.

Usage:
    python -m cambrian_tpu.checkpoint.consolidate \
        --ckpt_dir runs/exp1 [--step 2000] --config runs/exp1/config.json \
        --output_dir runs/exp1/hf
"""

import argparse
import json
import os


def consolidate(ckpt_dir: str, output_dir: str, config_path: str = None,
                step: int = None):
    import jax
    import orbax.checkpoint as ocp

    from ..models.config import CambrianConfig
    from .save import save_pretrained

    orbax_path = os.path.join(ckpt_dir, "orbax")
    if not os.path.isdir(orbax_path):
        orbax_path = ckpt_dir
    mgr = ocp.CheckpointManager(os.path.abspath(orbax_path))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {orbax_path}")

    config_path = config_path or os.path.join(ckpt_dir, "config.json")
    with open(config_path) as f:
        raw = json.load(f)
    raw.setdefault("model_type", "llama")
    from ..models.builder import _MODEL_TYPE_MAP

    raw["model_type"] = _MODEL_TYPE_MAP.get(raw["model_type"], raw["model_type"])
    config = CambrianConfig.from_dict(raw)

    # Restore onto THIS host regardless of the saving topology (consolidation
    # typically runs on a CPU VM, not the pod that trained). The checkpoint's
    # own sharding metadata names the original devices, so build the abstract
    # restore target from the model structure with local shardings instead.
    import jax.numpy as jnp
    import numpy as np

    from ..models.cambrian import CambrianLM
    from ..models.encoders.base import build_vision_tower_aux_list

    towers = build_vision_tower_aux_list(
        config.mm_vision_tower_aux_list, config.mm_vision_tower_aux_token_len_list
    )
    model = CambrianLM(config, tuple(t.hidden_size for t in towers))

    def _abstract_init():
        b = 1
        ids = jnp.zeros((b, config.tokenizer_model_max_length), jnp.int32)
        mask = jnp.ones_like(ids, dtype=bool)
        pos = jnp.zeros_like(ids)
        feats = [jnp.zeros((b, t.interp_size, t.hidden_size), jnp.float32)
                 for t in towers]
        aux = [jnp.ones((b, config.image_token_len, w * w), dtype=bool)
               for w in config.cross_att_window_sizes()]
        return model.init(jax.random.PRNGKey(0), ids, mask, pos, feats, aux)

    shapes = jax.eval_shape(_abstract_init)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    target = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding),
        shapes,
    )
    restored = mgr.restore(step, args=ocp.args.Composite(
        params=ocp.args.StandardRestore(target),
    ))
    params = restored["params"]

    params = jax.device_get(params)
    save_pretrained(params, config, output_dir)
    print(f"consolidated step {step} -> {output_dir}")
    return output_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", required=True,
                        help="training output dir containing orbax/")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--config", default=None,
                        help="config.json (defaults to ckpt_dir/config.json)")
    parser.add_argument("--step", type=int, default=None)
    args = parser.parse_args()
    consolidate(args.ckpt_dir, args.output_dir, args.config, args.step)


if __name__ == "__main__":
    main()
