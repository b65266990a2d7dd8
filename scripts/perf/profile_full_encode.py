"""Trace the full bench.py encode (4 towers + SVA, bs=8 bf16) and leave the
xplane under /tmp/enc_trace for scripts/perf/parse_xplane.py."""

import numpy as np

import jax
import jax.numpy as jnp

from cambrian_tpu.models.cambrian import CambrianLM
from cambrian_tpu.models.config import cambrian_8b
from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list

BATCH = 8


def main():
    cfg = cambrian_8b()
    dtype = jnp.bfloat16
    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list,
        dtype=dtype)
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers), dtype=dtype)

    def random_like(tree, seed):
        leaves, treedef = jax.tree.flatten(jax.eval_shape(lambda: tree))
        key = jax.random.PRNGKey(seed)
        return jax.tree.unflatten(treedef, [
            0.02 * jax.random.normal(jax.random.fold_in(key, i), s.shape, dtype)
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
    vshapes = jax.eval_shape(
        lambda f, m: model.init(jax.random.PRNGKey(0), f, m,
                                method=CambrianLM.prepare_vision),
        feat_shapes, mask_shapes)["params"]
    vision_params = {"params": random_like(vshapes, 999)}

    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.standard_normal(
        (BATCH, 3, t.image_size, t.image_size), dtype=np.float32), dtype)
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

    out = encode(vision_params, tower_params, images, masks)
    np.asarray(out)  # warm + flush through the tunnel
    out = encode(vision_params, tower_params, images, masks)
    jax.block_until_ready(out)

    from cambrian_tpu.profiling import trace
    with trace("/tmp/enc_trace"):
        for _ in range(3):
            out = encode(vision_params, tower_params, images, masks)
        jax.block_until_ready(out)
    print("trace written to /tmp/enc_trace")


if __name__ == "__main__":
    main()
