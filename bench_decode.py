"""Decode benchmark: TTFT + tokens/sec for a multimodal prompt
(BASELINE.json's second headline: "p50 TTFT + tokens/sec at 8B decode").

The single v5e chip here has 16 GB HBM; LLaMA-3-8B bf16 params (16 GB) don't
leave room for cache + activations on one chip, so the on-chip decode config
is Phi-3-mini (3.8B, BASELINE config #1) with the production 576+24 image
block in the prompt. Multi-chip 8B/34B decode runs under the same engine via
the (data, fsdp, model) mesh.

Prints one JSON line per batch size. Not wired into the driver's bench.py
(which reports the encode headline).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
    from cambrian_tpu.data.packing import prepare_multimodal_data
    from cambrian_tpu.infer.engine import GenerationConfig, GenerationEngine
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import CAMBRIAN_SVA, CambrianConfig, PHI3_MINI

    dtype = jnp.bfloat16
    cfg = CambrianConfig(**{**PHI3_MINI, **CAMBRIAN_SVA, "image_position": 35,
                            "tokenizer_model_max_length": 2048})
    hidden_sizes = (1152, 1024, 1536, 5760)
    model = CambrianLM(cfg, hidden_sizes, dtype=dtype)

    rng = np.random.default_rng(0)

    def random_like(shapes, seed):
        leaves, treedef = jax.tree.flatten(shapes)
        key = jax.random.PRNGKey(seed)
        return jax.tree.unflatten(treedef, [
            0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape, dtype)
            for i, s in enumerate(leaves)
        ])

    MAX_NEW = 128
    for batch in (1, 4):
        # packed multimodal prompt: ~60 text tokens + 600 image slots
        seq = 700
        ids = rng.integers(5, cfg.vocab_size, (batch, 64)).astype(np.int64)
        ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
        mask = np.ones((batch, 64), dtype=bool)
        pids, _, pmask, ppos, aux_masks = prepare_multimodal_data(
            ids, ids.copy(), mask, [(512, 512)] * batch, cfg.image_token_len,
            cfg.mm_vision_tower_aux_token_len_list, seq,
        )
        feats = [
            jnp.asarray(rng.standard_normal((batch, t, h)).astype(np.float32),
                        dtype)
            for t, h in zip(cfg.mm_vision_tower_aux_token_len_list, hidden_sizes)
        ]
        aux = [jnp.asarray(m) for m in aux_masks]

        if batch == 1:
            param_shapes = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(pids),
                                   jnp.asarray(pmask), jnp.asarray(ppos),
                                   feats, aux))
            params = random_like(param_shapes, 7)

        engine = GenerationEngine(model, params, max_len=seq + MAX_NEW + 8,
                                  cache_dtype=dtype)
        gcfg = GenerationConfig(max_new_tokens=MAX_NEW, temperature=0.0,
                                eos_token_id=None)

        # TTFT: prefill + first token (host path, one step)
        import gc

        from cambrian_tpu.models.language.llama import init_kv_cache

        def prefill_once():
            cache = init_kv_cache(cfg, batch, seq + MAX_NEW + 8, dtype)
            logits, cache = engine._prefill(params, jnp.asarray(pids),
                                            jnp.asarray(pmask),
                                            jnp.asarray(ppos), cache, feats, aux)
            logits.block_until_ready()
            del cache
            return logits

        np.asarray(prefill_once()[:, -1])  # warm + flush
        ts = []
        for _ in range(3):
            gc.collect()
            t0 = time.perf_counter()
            prefill_once()
            ts.append(time.perf_counter() - t0)
        ttft_ms = float(np.median(ts)) * 1000

        # steady-state decode: on-device loop, whole generation
        out = engine.generate(pids, pmask, ppos, feats, aux, gcfg)
        np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = engine.generate(pids, pmask, ppos, feats, aux, gcfg)
            ts.append(time.perf_counter() - t0)
        total = float(np.median(ts))
        decode_tps = batch * MAX_NEW / max(total - ttft_ms / 1000, 1e-9)

        print(json.dumps({
            "metric": f"phi3-3.8B multimodal decode (bs={batch}, 664-tok prompt)",
            "ttft_ms": round(ttft_ms, 1),
            "tokens_per_sec": round(decode_tps, 1),
            "total_s_for_128_new": round(total, 3),
        }))
        del engine, out, feats, aux
        import gc
        gc.collect()

    # free the phi-3 params and every cached executable/constant before the
    # 8B section: 7.6 GB of live phi-3 weights + ~9 GB of int8 8B weights
    # exceed the chip's 16 GB HBM (measured OOM)
    del params, model
    jax.clear_caches()
    import gc
    gc.collect()


def _main_and_serving():
    main()
    serving_8b_int8()
    _clear_device()
    serving_8b_int8(lm_head_bf16=True)
    _clear_device()
    serving_8b_int8_end_to_end()
    _clear_device()
    serving_13b_int4()
    _clear_device()
    serving_34b_int4_standin()


def _clear_device():
    """Free params + caches between sections: two model families' weights
    alive together OOM the 16 GB HBM (docs/PERF_NOTES.md)."""
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


def serving_8b_int8_end_to_end():
    """THE BASELINE.md metric as written (VERDICT r2 item 2 / missing 2):
    image bytes in -> tokens out through the real worker path, one
    measurement. JPEG decode + per-tower host preprocess (process_images) ->
    4 production tower forwards -> SVA prefill -> chunked generate_stream on
    the 8B-int8 single-chip config. Reports p50 TTFT *including* encode, and
    sustained tokens/sec.
    """
    import gc
    from io import BytesIO

    import jax
    import jax.numpy as jnp

    from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
    from cambrian_tpu.data.packing import prepare_multimodal_data
    from cambrian_tpu.infer.engine import GenerationConfig, GenerationEngine
    from cambrian_tpu.mm_utils import process_images
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import CAMBRIAN_SVA, CambrianConfig, LLAMA3_8B
    from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list

    dtype = jnp.bfloat16
    cfg = CambrianConfig(**{**LLAMA3_8B, **CAMBRIAN_SVA, "image_position": 35,
                            "tokenizer_model_max_length": 2048,
                            "quantize": "int8"})
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list,
        dtype=dtype)
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers), dtype=dtype)
    rng = np.random.default_rng(0)
    MAX_NEW = 128

    # a JPEG on the wire, like the worker receives (b64-decoded)
    from PIL import Image
    img_arr = rng.integers(0, 255, (512, 640, 3), dtype=np.uint8)
    buf = BytesIO()
    Image.fromarray(img_arr).save(buf, format="JPEG", quality=90)
    jpeg_bytes = buf.getvalue()

    batch = 1
    ids = rng.integers(5, cfg.vocab_size, (batch, 64)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    mask = np.ones((batch, 64), dtype=bool)
    pids, _, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, ids.copy(), mask, [(640, 512)] * batch, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, 700,
    )
    aux = [jnp.asarray(m) for m in aux_masks]

    tower_params = []
    for i, t in enumerate(towers):
        shapes = jax.eval_shape(t.init, jax.random.PRNGKey(i))
        leaves, treedef = jax.tree.flatten(shapes)
        key = jax.random.PRNGKey(100 + i)
        tower_params.append(jax.tree.unflatten(treedef, [
            (0.02 * jax.random.normal(jax.random.fold_in(key, j), s.shape,
                                      s.dtype)).astype(s.dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else jnp.zeros(s.shape, s.dtype)
            for j, s in enumerate(leaves)
        ]))

    # decoder params directly in the int8 layout (no bf16 peak)
    feat_shapes = [
        jax.ShapeDtypeStruct((batch, tok, t.hidden_size), dtype)
        for tok, t in zip(cfg.mm_vision_tower_aux_token_len_list, towers)
    ]
    shapes = jax.eval_shape(
        lambda feats: model.init(jax.random.PRNGKey(0), jnp.asarray(pids),
                                 jnp.asarray(pmask), jnp.asarray(ppos),
                                 feats, aux),
        feat_shapes)

    def rand_leaf(i, s):
        key = jax.random.fold_in(jax.random.PRNGKey(11), i)
        if s.dtype == jnp.int8:
            return jax.random.randint(key, s.shape, -127, 128, jnp.int32
                                      ).astype(jnp.int8)
        return 0.02 * jax.random.normal(key, s.shape, s.dtype)

    leaves, treedef = jax.tree.flatten(shapes)
    params = jax.tree.unflatten(
        treedef, [rand_leaf(i, s) for i, s in enumerate(leaves)])

    engine = GenerationEngine(model, params, towers=towers,
                              max_len=700 + MAX_NEW + 16, cache_dtype=dtype)
    gcfg = GenerationConfig(max_new_tokens=MAX_NEW, temperature=0.0,
                            eos_token_id=None, stream_chunk=16)
    image_processors = [t.image_processor for t in towers]

    def serve_once():
        t0 = time.perf_counter()
        # host: JPEG decode + per-tower pad-square/resize/normalize
        pil = Image.open(BytesIO(jpeg_bytes))
        per_tower = process_images([pil], image_processors, cfg)
        images = [jnp.asarray(px, dtype) for px in per_tower]
        feats = engine.encode_images(tower_params, images)
        first = None
        out = None
        for out in engine.generate_stream(pids, pmask, ppos, feats, aux, gcfg):
            if first is None:
                first = time.perf_counter() - t0
        return first, time.perf_counter() - t0, out

    serve_once()  # warm/compile
    firsts, totals = [], []
    for _ in range(5):
        gc.collect()
        f, tot, out = serve_once()
        firsts.append(f)
        totals.append(tot)
    first = float(np.median(firsts))
    total = float(np.median(totals))
    # sustained rate excludes the first chunk (TTFT covers it)
    tps = batch * (MAX_NEW - gcfg.stream_chunk) / max(total - first, 1e-9)
    print(json.dumps({
        "metric": "llama3-8B int8 END-TO-END serving: JPEG bytes -> "
                  "preprocess -> 4-tower encode+SVA -> prefill -> chunked "
                  "decode (bs=1, 664-tok prompt, 128 new, v5e-1)",
        "ttft_ms": round(first * 1000, 1),
        "tokens_per_sec": round(tps, 1),
        "total_s": round(total, 3),
    }))


def serving_8b_int8(lm_head_bf16=False):
    """Serving-path decode at 8B class on ONE v5e chip: LLaMA-3-8B decoder
    with int8 weight-only GEMMs (load_8bit path; bf16 8B weights alone are
    16 GB and do not fit), streamed through generate_stream with the chunked
    on-device loop (stream_chunk=16) — the worker's actual code path.

    ``lm_head_bf16``: measure the bf16-stored vocab head (fp32 accumulation,
    greedy-parity-gated in tests/test_inference.py) — the fp32 128k-vocab
    head is 2.1 GB of the ~8.6 GB read per decode step (VERDICT r3 item 6).
    """
    import gc

    import jax
    import jax.numpy as jnp

    from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
    from cambrian_tpu.data.packing import prepare_multimodal_data
    from cambrian_tpu.infer.engine import GenerationConfig, GenerationEngine
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import CAMBRIAN_SVA, CambrianConfig, LLAMA3_8B

    dtype = jnp.bfloat16
    cfg = CambrianConfig(**{**LLAMA3_8B, **CAMBRIAN_SVA, "image_position": 35,
                            "tokenizer_model_max_length": 2048,
                            "quantize": "int8",
                            **({"lm_head_dtype": "bf16"} if lm_head_bf16
                               else {})})
    hidden_sizes = (1152, 1024, 1536, 5760)
    model = CambrianLM(cfg, hidden_sizes, dtype=dtype)
    rng = np.random.default_rng(0)
    MAX_NEW = 128

    batch = 1
    ids = rng.integers(5, cfg.vocab_size, (batch, 64)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    mask = np.ones((batch, 64), dtype=bool)
    pids, _, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, ids.copy(), mask, [(512, 512)] * batch, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, 700,
    )
    feats = [jnp.asarray(rng.standard_normal((batch, t, h)).astype(np.float32),
                         dtype)
             for t, h in zip(cfg.mm_vision_tower_aux_token_len_list, hidden_sizes)]
    aux = [jnp.asarray(m) for m in aux_masks]

    # random params straight in the quantized layout (no 16 GB bf16 peak):
    # int8 kernels + small scales; other leaves bf16/f32 per their shapes
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(pids),
                           jnp.asarray(pmask), jnp.asarray(ppos), feats, aux))

    def rand_leaf(i, s):
        key = jax.random.fold_in(jax.random.PRNGKey(11), i)
        if s.dtype == jnp.int8:
            return jax.random.randint(key, s.shape, -127, 128, jnp.int32
                                      ).astype(jnp.int8)
        return 0.02 * jax.random.normal(key, s.shape, s.dtype)

    leaves, treedef = jax.tree.flatten(shapes)
    params = jax.tree.unflatten(
        treedef, [rand_leaf(i, s) for i, s in enumerate(leaves)])

    engine = GenerationEngine(model, params, max_len=700 + MAX_NEW + 16,
                              cache_dtype=dtype)
    gcfg = GenerationConfig(max_new_tokens=MAX_NEW, temperature=0.0,
                            eos_token_id=None, stream_chunk=16)

    def serve_once():
        first = None
        t0 = time.perf_counter()
        out = None
        for out in engine.generate_stream(pids, pmask, ppos, feats, aux, gcfg):
            if first is None:
                first = time.perf_counter() - t0
        return first, time.perf_counter() - t0, out

    serve_once()  # warm/compile
    firsts, totals = [], []
    for _ in range(3):
        gc.collect()
        first, total, out = serve_once()
        firsts.append(first)
        totals.append(total)
    first = float(np.median(firsts))
    total = float(np.median(totals))
    tps = batch * (MAX_NEW - 16) / max(total - first, 1e-9)
    print(json.dumps({
        "metric": "llama3-8B int8 multimodal SERVING decode "
                  "(bs=1, 664-tok prompt, stream_chunk=16, v5e-1"
                  + (", bf16 lm_head" if lm_head_bf16 else "") + ")",
        "first_chunk_ms": round(first * 1000, 1),
        "tokens_per_sec": round(tps, 1),
        "total_s_for_128_new": round(total, 3),
    }))


def _quant_serving_decode(cfg, label, weight_gib_note="", max_new=128):
    """Shared harness for the quantized serving-decode sections: random
    params in the quantized layout (no bf16 materialization peak), chunked
    generate_stream (the worker's real path), first-chunk + sustained tok/s.
    """
    import gc

    import jax
    import jax.numpy as jnp

    from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
    from cambrian_tpu.data.packing import prepare_multimodal_data
    from cambrian_tpu.infer.engine import GenerationConfig, GenerationEngine
    from cambrian_tpu.models.cambrian import CambrianLM

    dtype = jnp.bfloat16
    hidden_sizes = (1152, 1024, 1536, 5760)
    model = CambrianLM(cfg, hidden_sizes, dtype=dtype)
    rng = np.random.default_rng(0)

    batch = 1
    ids = rng.integers(5, cfg.vocab_size, (batch, 64)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    mask = np.ones((batch, 64), dtype=bool)
    pids, _, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, ids.copy(), mask, [(512, 512)] * batch, cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, 700,
    )
    feats = [jnp.asarray(rng.standard_normal((batch, t, h)).astype(np.float32),
                         dtype)
             for t, h in zip(cfg.mm_vision_tower_aux_token_len_list, hidden_sizes)]
    aux = [jnp.asarray(m) for m in aux_masks]

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(pids),
                           jnp.asarray(pmask), jnp.asarray(ppos), feats, aux))

    def rand_leaf(i, s):
        key = jax.random.fold_in(jax.random.PRNGKey(11), i)
        if s.dtype == jnp.int8:
            return jax.random.randint(key, s.shape, -127, 128, jnp.int32
                                      ).astype(jnp.int8)
        return 0.02 * jax.random.normal(key, s.shape, s.dtype)

    leaves, treedef = jax.tree.flatten(shapes)
    weight_bytes = sum(
        int(np.prod(s.shape)) * s.dtype.itemsize for s in leaves)
    params = jax.tree.unflatten(
        treedef, [rand_leaf(i, s) for i, s in enumerate(leaves)])

    engine = GenerationEngine(model, params, max_len=700 + max_new + 16,
                              cache_dtype=dtype)
    gcfg = GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                            eos_token_id=None, stream_chunk=16)

    def serve_once():
        first = None
        t0 = time.perf_counter()
        out = None
        for out in engine.generate_stream(pids, pmask, ppos, feats, aux, gcfg):
            if first is None:
                first = time.perf_counter() - t0
        return first, time.perf_counter() - t0, out

    serve_once()  # warm/compile
    firsts, totals = [], []
    for _ in range(3):
        gc.collect()
        first, total, out = serve_once()
        firsts.append(first)
        totals.append(total)
    first = float(np.median(firsts))
    total = float(np.median(totals))
    tps = batch * (max_new - 16) / max(total - first, 1e-9)
    rec = {
        "metric": label,
        "first_chunk_ms": round(first * 1000, 1),
        "tokens_per_sec": round(tps, 1),
        "total_s_for_%d_new" % max_new: round(total, 3),
        "param_bytes_gib": round(weight_bytes / 2**30, 2),
    }
    if weight_gib_note:
        rec["note"] = weight_gib_note
    print(json.dumps(rec))
    return tps


def serving_13b_int4():
    """13B-class serving on ONE v5e chip: Vicuna-13B decoder, int4
    weight-only (load_4bit; bitsandbytes-nf4 counterpart, reference
    model/builder.py:35-44). int4 body ~5.9 GiB + scales + bf16 embeddings
    fits 16 GB with room for cache — the missing BASELINE config #3 decode
    row (VERDICT r3 item 3/5)."""
    from cambrian_tpu.models.config import cambrian_13b

    # unrolled decode: the r4 trace showed scan+lax.switch param selection
    # copying each selected layer's weights every step (2560 conditionals ~
    # 0.34 ms each) — scan trades decode throughput for compile time and
    # bounded HBM; on one chip with int4 weights the unrolled program wins
    cfg = cambrian_13b().replace(quantize="int4",
                                 tokenizer_model_max_length=2048,
                                 scan_layers=False)
    _quant_serving_decode(
        cfg,
        "vicuna-13B int4 multimodal SERVING decode "
        "(bs=1, 664-tok prompt, stream_chunk=16, v5e-1)",
    )


def serving_34b_int4_standin():
    """34B-geometry serving probe on ONE v5e chip. Full Yi-34B int4 is
    15.6 GiB body + 1.0 GiB scales + 1.7 GiB bf16 embeddings = 18.3 GiB —
    it does NOT fit one 16 GB chip at any supported quantization; the real
    deployment is the (1,2,4) serve mesh (~9.2 GiB/device, AOT-validated in
    tests/test_production_compile.py). What CAN be measured on this chip is
    the full-WIDTH geometry at half depth: 30 of 60 layers at hidden 7168 /
    inter 20480 / 56 heads, int4 (~9.5 GiB). Decode is weight-HBM-bound and
    layer-homogeneous, so full-34B per-token latency ~= 2x the measured
    stand-in (+ the unchanged embedding/logits tax); tokens/sec ~= half.
    The printed extrapolation states exactly that."""
    from cambrian_tpu.models.config import cambrian_34b

    cfg = cambrian_34b().replace(
        quantize="int4", tokenizer_model_max_length=2048, scan_layers=False,
        num_hidden_layers=30,
        # keep the in-decoder SVA cadence (stride 7) within 30 layers
        num_of_vision_sampler_layers=5,
        # the bench prompt is 64 text tokens; 34B's real image_position 87
        # doesn't fit it and has no bearing on decode cost
        image_position=35,
    )
    tps = _quant_serving_decode(
        cfg,
        "yi-34B-geometry int4 HALF-DEPTH (30/60 layer) multimodal SERVING "
        "decode (bs=1, 664-tok prompt, stream_chunk=16, v5e-1)",
        weight_gib_note="full 34B int4 = 18.3 GiB > 16 GB HBM (needs the "
        "(1,2,4) mesh); half-depth at full width measures the per-layer "
        "decode cost on real silicon",
    )
    print(json.dumps({
        "metric": "yi-34B int4 FULL-depth extrapolation (2x layer cost, "
                  "same embed/logits)",
        "tokens_per_sec_extrapolated": round(tps / 2, 1),
    }))


if __name__ == "__main__":
    _main_and_serving()
