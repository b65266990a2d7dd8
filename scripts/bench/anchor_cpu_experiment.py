"""Measured anchor experiment for bench.py's ``vs_baseline`` (VERDICT r1
item 10): same-host, same-shape CPU comparison of

  (a) the reference encode path in torch eager — HF towers at the exact
      production geometry + the reference's OWN vendored VisionTokenSampler
      (/root/reference/cambrian/model/vision_sampler.py, imported standalone)
      driven the reference's way: windows batch-flattened to B*576 queries of
      length 1 (cambrian_arch.py:271-287);
  (b) our JAX encode (towers + CambrianLM.prepare_vision), jit on CPU.

Rationale: the reference's torch-xla TPU throughput was never published, so
round 1 anchored vs_baseline on an estimated 4.0 img/s. A direct CPU
measurement of the two implementations at identical shapes gives a measured
slowdown ratio R = jax_time / torch_time whose dominant causes — eager per-op
dispatch, no cross-op fusion, the B*576-way flattened SVA attention — hit
*harder* under torch-xla lazy tensors on TPU than on CPU (every tiny op
becomes an XLA graph node; fusion barriers cost HBM round-trips). R is
therefore a conservative (torch-favoring) estimate of the TPU-side gap, and

    anchor = our_measured_tpu_images_per_sec * R

Run on an otherwise-idle host:  python scripts/bench/anchor_cpu_experiment.py
Prints one JSON line; the resulting anchor is recorded in bench.py and
docs/PERF_NOTES.md.

Cost note: fp32 on CPU for both sides (CPU has no bf16 compute units; both
frameworks use oneDNN GEMMs, so the framework comparison is fair).
"""

import importlib.util
import json
import sys
import time

import numpy as np

BATCH = 1
REPS = 2


def _med_time(fn, reps=REPS):
    fn()  # warmup (torch: caches; jax: compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_torch():
    import torch

    torch.set_grad_enabled(False)
    from transformers import (
        CLIPVisionConfig,
        CLIPVisionModel,
        ConvNextConfig,
        ConvNextModel,
        Dinov2Config,
        Dinov2Model,
        SiglipVisionConfig,
        SiglipVisionModel,
    )

    towers = {
        "siglip": (SiglipVisionModel(SiglipVisionConfig(
            hidden_size=1152, num_hidden_layers=27, num_attention_heads=16,
            intermediate_size=4304, image_size=384, patch_size=14)), 384),
        "clip": (CLIPVisionModel(CLIPVisionConfig(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, image_size=336, patch_size=14)), 336),
        "dinov2": (Dinov2Model(Dinov2Config(
            hidden_size=1536, num_hidden_layers=40, num_attention_heads=24,
            image_size=378, patch_size=14, use_swiglu_ffn=True)), 378),
        "convnext": (ConvNextModel(ConvNextConfig(
            depths=[3, 4, 30, 3], hidden_sizes=[384, 768, 1536, 3072])), 1024),
    }
    times = {}
    for name, (model, res) in towers.items():
        model.eval()
        px = torch.randn(BATCH, 3, res, res)
        if name == "convnext":
            fn = lambda m=model, p=px: m(p, output_hidden_states=True)
        else:
            fn = lambda m=model, p=px: m(p, output_hidden_states=True)
        times[name] = _med_time(fn)
        del model
    # --- the reference's own SVA, driven the reference's way -------------
    spec = importlib.util.spec_from_file_location(
        "ref_vision_sampler", "/root/reference/cambrian/model/vision_sampler.py")
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_vision_sampler"] = ref
    spec.loader.exec_module(ref)

    q_dim, ctx_dim, hidden = 4096, 1024, 1024
    # the sampler sees post-aux-projector features: every tower is already
    # hidden_dim-dimensional (cambrian_arch projects before sampling; the
    # projection GEMMs are counted on the JAX side, favoring torch here)
    kv_dims = [1024, 1024, 1024, 1024]
    kv_sizes = [1, 1, 1, 4]          # aux lens [576,576,576,9216] -> windows
    sampler = ref.VisionTokenSampler(q_dim, ctx_dim, kv_dims, kv_sizes,
                                     hidden, num_of_layers=3).eval()
    bq = BATCH * 576                 # batch-flattened, q_len=1
    queries = torch.randn(bq, 1, q_dim)
    context = torch.randn(bq, 1, ctx_dim)
    kvs = [torch.randn(bq, s * s, d) for d, s in zip(kv_dims, kv_sizes)]
    masks = [torch.ones(bq, s * s, dtype=torch.bool) for s in kv_sizes]
    times["sva"] = _med_time(lambda: sampler(queries, context, *kvs, *masks))
    times["total"] = sum(times.values())
    return times


def measure_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import cambrian_8b
    from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list

    cfg = cambrian_8b()
    dtype = jnp.float32
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list,
        dtype=dtype)
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers), dtype=dtype)

    def random_like(tree, seed):
        leaves, treedef = jax.tree.flatten(jax.eval_shape(lambda: tree))
        key = jax.random.PRNGKey(seed)
        return jax.tree.unflatten(
            treedef, [0.02 * jax.random.normal(jax.random.fold_in(key, i),
                                               s.shape, dtype)
                      for i, s in enumerate(leaves)])

    tower_params = []
    for i, t in enumerate(towers):
        dummy = jnp.zeros((1, 3, t.image_size, t.image_size), dtype)
        shapes = jax.eval_shape(t.module.init, jax.random.PRNGKey(0),
                                dummy)["params"]
        tower_params.append(random_like(shapes, 100 + i))
    feat_shapes = [jax.ShapeDtypeStruct((BATCH, t.interp_size, t.hidden_size),
                                        dtype) for t in towers]
    mask_shapes = [jax.ShapeDtypeStruct((BATCH, cfg.image_token_len, w * w),
                                        jnp.bool_)
                   for w in cfg.cross_att_window_sizes()]
    vision_params = {"params": random_like(jax.eval_shape(
        lambda f, m: model.init(jax.random.PRNGKey(0), f, m,
                                method=CambrianLM.prepare_vision),
        feat_shapes, mask_shapes)["params"], 999)}
    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.standard_normal(
        (BATCH, 3, t.image_size, t.image_size)).astype(np.float32))
        for t in towers]
    masks = [jnp.ones((BATCH, cfg.image_token_len, w * w), dtype=bool)
             for w in cfg.cross_att_window_sizes()]

    @jax.jit
    def encode(vision_params, tower_params, images, masks):
        feats = [t.apply(tp, px)
                 for t, tp, px in zip(towers, tower_params, images)]
        out, _, _, _ = model.apply(vision_params, feats, masks,
                                   method=CambrianLM.prepare_vision)
        return out

    def run():
        encode(vision_params, tower_params, images, masks).block_until_ready()

    return {"total": _med_time(run)}


def main():
    torch_times = measure_torch()
    jax_times = measure_jax()
    ratio = torch_times["total"] / jax_times["total"]
    print(json.dumps({
        "metric": "CPU anchor experiment: reference torch eager vs our JAX, "
                  f"bs={BATCH} fp32, identical shapes",
        "torch_seconds_per_image": {k: round(v, 2)
                                    for k, v in torch_times.items()},
        "jax_seconds_per_image": round(jax_times["total"], 2),
        "torch_over_jax_ratio": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
