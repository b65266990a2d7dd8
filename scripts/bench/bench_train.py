"""Training-step benchmark on one v5e chip: full multimodal pipeline
(4 production towers frozen-bf16 -> SVA -> decoder fwd/bwd with remat +
Pallas flash fwd/bwd -> 3-group AdamW) at a 1B-class decoder.

8B training needs the (data, fsdp, model) mesh (16 GB HBM holds neither the
fp32 optimizer state nor the activations at 8B on one chip); this measures
the single-chip building block the pod run is made of: achieved step time,
samples/sec, and model-FLOPs utilization from the compiled graph's cost
analysis.

Flags:
  --stage2    stage-2-faithful slice (VERDICT r4 item 2): the REAL llama-3
              128256 vocab (so the chunked CE scan's cost is in the number),
              bf16 Adam mu (the shipped v5e-8 launch geometry), the 3-LR
              freeze/group policy, at the largest decoder that fits one chip
              with fp32 Adam v.
  --pipeline  feed batches through the REAL host input pipeline (native C++
              image preprocess for all towers + packing + the trainer's
              _Prefetcher) instead of a resident constant batch, and report
              the host-stall fraction (VERDICT r4 item 9). nproc=1 here, so
              this measures the worst case; real hosts scale the decode pool.
  --trace     write an xplane trace for scripts/perf/parse_xplane.py.

Prints one JSON line. Not wired into the driver's bench.py.
"""

import json
import sys
import time

import numpy as np

BATCH = 2
SEQ = 2048
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from cambrian_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from cambrian_tpu.data.packing import prepare_multimodal_data
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import CAMBRIAN_SVA, CambrianConfig
    from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list
    from cambrian_tpu.train.optimizer import TrainConfig
    from cambrian_tpu.train.train_step import init_train_state, make_train_step

    dtype = jnp.bfloat16
    stage2 = "--stage2" in sys.argv
    if stage2:
        # stage-2-faithful slice: REAL llama-3 vocab (chunked CE active at
        # its production shape), bf16 Adam mu like the launch script; the
        # decoder is the largest that fits fp32 master + fp32 v on one chip.
        # At 128256 vocab the embed+head pair alone is 10 B/param of state:
        # hidden 2048 OOM'd by 3.8 GiB (19.54/15.75, log r5); 1536 with
        # head_dim 128 (12 heads) is the fitting width.
        cfg = CambrianConfig(**{**CAMBRIAN_SVA, **dict(
            model_type="llama", vocab_size=128256, hidden_size=1536,
            intermediate_size=4096, num_hidden_layers=8,
            num_attention_heads=12, num_key_value_heads=6, rms_norm_eps=1e-5,
            rope_theta=500000.0, tokenizer_model_max_length=SEQ,
            image_position=35, scan_layers=True, remat=True,
        )})
    else:
        cfg = CambrianConfig(**{**CAMBRIAN_SVA, **dict(
            model_type="llama", vocab_size=32000, hidden_size=1792,
            intermediate_size=4864, num_hidden_layers=10,
            num_attention_heads=16, num_key_value_heads=8, rms_norm_eps=1e-5,
            rope_theta=500000.0, tokenizer_model_max_length=SEQ,
            image_position=35, scan_layers=True, remat=True,
        )})
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list,
        dtype=dtype)
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers), dtype=dtype)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, cfg.vocab_size, (BATCH, 256)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :64] = IGNORE_INDEX
    mask = np.ones((BATCH, 256), dtype=bool)
    pids, plabels, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, labels, mask, [(640, 480)] * BATCH, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, SEQ)
    images = [jnp.asarray(
        rng.standard_normal((BATCH, 3, t.image_size, t.image_size)
                            ).astype(np.float32), dtype) for t in towers]
    batch = {
        "input_ids": jnp.asarray(pids), "labels": jnp.asarray(plabels),
        "attention_mask": jnp.asarray(pmask),
        "position_ids": jnp.asarray(ppos), "images": images,
        "aux_masks": [jnp.asarray(m) for m in aux_masks],
    }

    def bf16_like(tree, seed):
        leaves, treedef = jax.tree.flatten(jax.eval_shape(lambda: tree))
        key = jax.random.PRNGKey(seed)
        return jax.tree.unflatten(treedef, [
            0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape, dtype)
            for i, s in enumerate(leaves)])

    tower_params = []
    for i, t in enumerate(towers):
        dummy = jnp.zeros((1, 3, t.image_size, t.image_size), dtype)
        tower_params.append(bf16_like(
            jax.eval_shape(t.module.init, jax.random.PRNGKey(0), dummy)["params"],
            100 + i))
    feat_shapes = [jax.ShapeDtypeStruct((BATCH, t.interp_size, t.hidden_size),
                                        dtype) for t in towers]
    pshapes = jax.eval_shape(
        lambda f: model.init(jax.random.PRNGKey(0), batch["input_ids"],
                             batch["attention_mask"], batch["position_ids"],
                             f, batch["aux_masks"]), feat_shapes)
    n_params = sum(np.prod(s.shape) for s in jax.tree.leaves(pshapes))

    def f32_like(tree, seed):
        leaves, treedef = jax.tree.flatten(jax.eval_shape(lambda: tree))
        key = jax.random.PRNGKey(seed)
        return jax.tree.unflatten(treedef, [
            0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape,
                                     jnp.float32)
            for i, s in enumerate(leaves)])

    params = f32_like(pshapes, 7)
    tconf = TrainConfig(learning_rate=4e-5, total_steps=100, warmup_ratio=0.0,
                        lr_scheduler_type="constant",
                        mm_projector_lr=8e-5, mm_vision_sampler_lr=8e-5,
                        adam_mu_dtype="bfloat16" if stage2 else None)
    state = init_train_state(params, tconf)
    del params
    step_fn = jax.jit(make_train_step(model, towers,
                                      freeze=tconf if stage2 else None),
                      donate_argnums=(0,))
    flops = step_fn.lower(state, tower_params, batch).compile(
        ).cost_analysis().get("flops", 0.0)

    state, metrics = step_fn(state, tower_params, batch)
    np.asarray(metrics["loss"])               # flush first execution
    state, metrics = step_fn(state, tower_params, batch)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step_fn(state, tower_params, batch)
    jax.block_until_ready(metrics)
    step_s = (time.perf_counter() - t0) / ITERS

    label = ("stage2-faithful multimodal TRAIN step (4 frozen towers + SVA "
             "+ injection + chunked CE @128256 vocab + 3-LR-group AdamW "
             "bf16-mu" if stage2 else
             "1B-class multimodal TRAIN step (4 frozen towers + SVA + "
             "decoder bwd")
    result = {
        "metric": f"{label}, bs={BATCH}, seq={SEQ}, remat+scan, v5e-1)",
        "decoder_params_b": round(float(n_params) / 1e9, 3),
        "step_ms": round(step_s * 1000, 1),
        "samples_per_sec": round(BATCH / step_s, 2),
        "achieved_tflops": round(flops / step_s / 1e12, 1),
        "mfu_pct": round(flops / step_s / 197e12 * 100, 1),
        "loss": round(float(np.asarray(metrics["loss"])), 4),
    }

    if "--pipeline" in sys.argv:
        # VERDICT r4 item 9: steps fed by the REAL host input pipeline
        # (native C++ per-tower preprocess + packing + trainer _Prefetcher)
        # instead of a resident batch; stall = host time not hidden by the
        # device step. nproc=1 in this container (worst case; the thread
        # pool scales on real hosts — docs/PERF_NOTES.md).
        from cambrian_tpu.data import native_image
        from cambrian_tpu.train.trainer import _Prefetcher

        raw = (rng.integers(0, 255, (BATCH, 768, 1024, 3))
               .astype(np.uint8))
        sizes = [(t.image_size, t.image_size) for t in towers]

        def make_batch():
            imgs = []
            for side, _ in sizes:
                arr = native_image.preprocess_batch(
                    [raw[i] for i in range(BATCH)], side,
                    (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
                imgs.append(jnp.asarray(arr, dtype))
            pids2, plabels2, pmask2, ppos2, aux2 = prepare_multimodal_data(
                ids, labels, mask, [(1024, 768)] * BATCH,
                cfg.image_token_len,
                cfg.mm_vision_tower_aux_token_len_list, SEQ)
            return {
                "input_ids": jnp.asarray(pids2),
                "labels": jnp.asarray(plabels2),
                "attention_mask": jnp.asarray(pmask2),
                "position_ids": jnp.asarray(ppos2), "images": imgs,
                "aux_masks": [jnp.asarray(m) for m in aux2],
            }

        pf = _Prefetcher(make_batch)
        state, metrics = step_fn(state, tower_params, next(pf))
        jax.block_until_ready(metrics)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step_fn(state, tower_params, next(pf))
        jax.block_until_ready(metrics)
        piped_s = (time.perf_counter() - t0) / ITERS
        pf.stop()
        result["pipeline_step_ms"] = round(piped_s * 1000, 1)
        result["host_stall_pct"] = round(
            max(0.0, piped_s - step_s) / piped_s * 100, 1)

    print(json.dumps(result))

    if "--trace" in sys.argv:
        # xplane trace for scripts/perf/parse_xplane.py (backward profiling)
        from cambrian_tpu.profiling import trace

        with trace("/tmp/train_trace"):
            for _ in range(2):
                state, metrics = step_fn(state, tower_params, batch)
            jax.block_until_ready(metrics)
        print("trace written to /tmp/train_trace")


if __name__ == "__main__":
    main()
