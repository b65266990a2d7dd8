"""Peak-memory evidence for the scan_layers inference path (ADVICE r2: the
old per-call jnp.stack of layer params duplicated the run's weights in HBM;
the switch-select scan must not).

``memory_stats()`` is empty over the axon tunnel, so this uses TPU-backend
AOT compilation and reads ``compiled.memory_analysis()`` — the real buffer
assignment, nothing executes. Measured r3 (2.6B bf16, connector_only so ONE
scanned run spans all 30 layers — the worst case):

    scan=True  arg 5.4 GB  temp 1.053 GB   (switch-select: bounded per-
                                            iteration working set)
    scan=False arg 5.4 GB  temp 0.0 GB
    (old jnp.stack xs: temp >= the full 5.1 GB of stacked weights)

Usage:
    python scripts/bench/bench_scan_memory.py [mid|34b|all]
"""

import json
import sys

import numpy as np


def analyze(cfg, tag, batch=1, max_len=1024):
    import jax
    import jax.numpy as jnp

    from cambrian_tpu.models.cambrian import CambrianLM

    model = CambrianLM(cfg, (64,), dtype=jnp.bfloat16)
    ids = jax.ShapeDtypeStruct((batch, 64), jnp.int32)
    am = jax.ShapeDtypeStruct((batch, 64), jnp.bool_)
    pos = jax.ShapeDtypeStruct((batch, 64), jnp.int32)
    pshapes = jax.eval_shape(
        lambda a, b, c: model.init(jax.random.PRNGKey(0), a, b, c, None,
                                   None), ids, am, pos)
    pshapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        pshapes)
    kvh, hd = cfg.num_key_value_heads, cfg.head_dim
    cache = tuple(
        (jax.ShapeDtypeStruct((batch, max_len, kvh, hd), jnp.bfloat16),) * 2
        for _ in range(cfg.num_hidden_layers))

    def decode(params, tok, pos1, cache, cv, ci):
        return model.apply(params, tok, pos1, cache, cv, ci,
                           method=CambrianLM.decode_step)

    compiled = jax.jit(decode, donate_argnums=(3,)).lower(
        pshapes, jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        jax.ShapeDtypeStruct((batch, 1), jnp.int32), cache,
        jax.ShapeDtypeStruct((batch, max_len), jnp.bool_),
        jax.ShapeDtypeStruct((), jnp.int32)).compile()
    ma = compiled.memory_analysis()
    print(json.dumps({
        "tag": tag, "scan": cfg.scan_layers,
        "arg_gb": round(ma.argument_size_in_bytes / 1e9, 2),
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "alias_gb": round(ma.alias_size_in_bytes / 1e9, 2),
    }), flush=True)


def main(which: str):
    from cambrian_tpu.models.config import CambrianConfig, cambrian_34b

    base = CambrianConfig(
        model_type="llama", vocab_size=32000, hidden_size=2560,
        intermediate_size=6912, num_hidden_layers=30, num_attention_heads=20,
        num_key_value_heads=20, rope_theta=10000.0, bos_token_id=1,
        eos_token_id=2, mm_projector_type="linear", mm_hidden_size=64,
        remat=False, connector_only=True)
    if which in ("all", "mid"):
        analyze(base.replace(scan_layers=True), "2.6B")
        analyze(base.replace(scan_layers=False), "2.6B")
    if which in ("all", "34b"):
        analyze(cambrian_34b().replace(scan_layers=True, remat=False),
                "34B-1chip")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
