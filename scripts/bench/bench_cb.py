"""Continuous-batching serving throughput on one chip: 4 concurrent
multimodal requests through the shared-KV engine, per-token stepping vs the
chunked lockstep decode (step_chunk). Phi-3-mini 3.8B bf16, 664-token
packed prompts, 64 new tokens each."""

import json
import time

import numpy as np

N_REQ = 4
MAX_NEW = 64


def main():
    import jax
    import jax.numpy as jnp

    from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
    from cambrian_tpu.data.packing import prepare_multimodal_data
    from cambrian_tpu.infer.continuous import ContinuousBatchingEngine
    from cambrian_tpu.infer.engine import GenerationConfig
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import CAMBRIAN_SVA, CambrianConfig, PHI3_MINI

    dtype = jnp.bfloat16
    cfg = CambrianConfig(**{**PHI3_MINI, **CAMBRIAN_SVA, "image_position": 35,
                            "tokenizer_model_max_length": 2048})
    hidden_sizes = (1152, 1024, 1536, 5760)
    model = CambrianLM(cfg, hidden_sizes, dtype=dtype)
    rng = np.random.default_rng(0)

    ids = rng.integers(5, cfg.vocab_size, (1, 64)).astype(np.int64)
    ids[:, cfg.image_position] = IMAGE_TOKEN_INDEX
    mask = np.ones((1, 64), dtype=bool)
    pids, _, pmask, ppos, aux_masks = prepare_multimodal_data(
        ids, ids.copy(), mask, [(512, 512)], cfg.image_token_len,
        cfg.mm_vision_tower_aux_token_len_list, 700)
    feats = [jnp.asarray(rng.standard_normal((1, t, h)).astype(np.float32),
                         dtype)
             for t, h in zip(cfg.mm_vision_tower_aux_token_len_list,
                             hidden_sizes)]
    aux = [jnp.asarray(m) for m in aux_masks]

    def rand_params(seed):
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(pids),
                               jnp.asarray(pmask), jnp.asarray(ppos), feats,
                               aux))
        leaves, treedef = jax.tree.flatten(shapes)
        key = jax.random.PRNGKey(seed)
        return jax.tree.unflatten(treedef, [
            0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape,
                                     dtype)
            for i, s in enumerate(leaves)])

    params = rand_params(7)
    gcfg = GenerationConfig(max_new_tokens=MAX_NEW, temperature=0.0,
                            eos_token_id=None)

    results = {}
    for chunk in (1, 8):
        engine = ContinuousBatchingEngine(model, params, num_slots=N_REQ,
                                          max_len=700 + MAX_NEW + 8,
                                          cache_dtype=dtype)
        # warm: run one request end-to-end to compile prefill + decode paths
        warm = engine.submit(pids[0], pmask[0], ppos[0], feats, aux, gcfg)
        engine.run_until_complete([warm], chunk=chunk)

        reqs = [engine.submit(pids[0], pmask[0], ppos[0], feats, aux, gcfg)
                for _ in range(N_REQ)]
        t0 = time.perf_counter()
        outs = engine.run_until_complete(reqs, chunk=chunk)
        dt = time.perf_counter() - t0
        total_tokens = sum(len(o) for o in outs)
        results[f"chunk_{chunk}"] = {
            "total_s": round(dt, 3),
            "tokens_per_sec": round(total_tokens / dt, 1),
        }
        del engine
        import gc

        gc.collect()

    results["speedup"] = round(
        results["chunk_8"]["tokens_per_sec"]
        / results["chunk_1"]["tokens_per_sec"], 2)
    print(json.dumps({
        "metric": f"phi3-3.8B continuous batching ({N_REQ} concurrent "
                  f"664-tok multimodal requests, {MAX_NEW} new each, v5e-1)",
        **results,
    }))


if __name__ == "__main__":
    main()
