"""Profile ONE chunked decode step at 13B-int4 serving shapes.

Both quantized serving decodes sit ~18 ms/token above the weight-HBM
roofline (8B-int8: ~19 ms/tok vs ~11 ideal; 13B-int4: 29.6 vs 11.5 —
docs/PERF_NOTES.md r4). This traces a warm decode chunk and buckets the
synchronous TensorCore ops so the excess is attributed, not guessed.

Usage:  timeout 1200 python scripts/perf/profile_decode_chunk.py [trace_dir]
Then:   python scripts/perf/parse_xplane.py <trace_dir> 30
"""

import sys
import time

import numpy as np


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode13b_trace"

    import jax
    import jax.numpy as jnp

    from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
    from cambrian_tpu.data.packing import prepare_multimodal_data
    from cambrian_tpu.infer.engine import GenerationConfig, GenerationEngine
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import cambrian_13b
    from cambrian_tpu.profiling import trace

    cfg = cambrian_13b().replace(
        quantize="int4", tokenizer_model_max_length=2048, scan_layers=False)
    dtype = jnp.bfloat16
    hidden_sizes = (1152, 1024, 1536, 5760)
    model = CambrianLM(cfg, hidden_sizes, dtype=dtype)
    rng = np.random.default_rng(0)

    ids = rng.integers(5, cfg.vocab_size, (1, 64)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    mask = np.ones((1, 64), dtype=bool)
    pids, _, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, ids.copy(), mask, [(512, 512)], cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, 700,
    )
    feats = [jnp.asarray(rng.standard_normal((1, t, h)).astype(np.float32),
                         dtype)
             for t, h in zip(cfg.mm_vision_tower_aux_token_len_list,
                             hidden_sizes)]
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
    params = jax.tree.unflatten(
        treedef, [rand_leaf(i, s) for i, s in enumerate(leaves)])

    engine = GenerationEngine(model, params, max_len=700 + 64 + 16,
                              cache_dtype=dtype)
    gcfg = GenerationConfig(max_new_tokens=48, temperature=0.0,
                            eos_token_id=None, stream_chunk=16)

    def run():
        out = None
        for out in engine.generate_stream(pids, pmask, ppos, feats, aux,
                                          gcfg):
            pass
        return out

    t0 = time.perf_counter()
    run()  # compile + warm
    print(f"warm run (compile incl.): {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    run()
    print(f"steady: {time.perf_counter() - t0:.2f}s for 48 tokens",
          flush=True)

    with trace(trace_dir):
        run()
    print("trace written to", trace_dir)


if __name__ == "__main__":
    main()
