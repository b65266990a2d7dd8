"""Input-pipeline end-to-end proof (VERDICT r2 item 4, SURVEY §7 hard-part
5): drive the production 4-tower encode from RAW JPEG BYTES through the
native C++ preprocessing pool + a prefetch thread (the trainer's overlap
pattern), and compare against the pre-staged-arrays rate of bench.py.

What this measures on THIS machine (nproc=1 — see CLAUDE.md):
- staged img/s: device-bound ceiling (bench.py protocol).
- host-only img/s: JPEG decode + 4-tower native preprocess, single core.
- overlapped img/s: prefetch thread + async dispatch; should track
  min(staged, host) — that equality IS the overlap-correctness proof.
- threads_needed: ceil(host_ms_per_batch / chip_ms_per_batch) — the number
  of preprocessing cores at which a real host keeps the chip saturated
  (the reference used 4 PIL dataloader workers, pretrain_cambrian_8b.sh:52).

Prints one JSON line.
"""

import io
import json
import queue
import threading
import time

import numpy as np

BATCH = 8
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from cambrian_tpu.data import native_image
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.config import cambrian_8b
    from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list

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
    masks = [jnp.ones((BATCH, cfg.image_token_len, w * w), dtype=bool)
             for w in cfg.cross_att_window_sizes()]

    @jax.jit
    def encode(vision_params, tower_params, images, masks):
        feats = [t.apply(tp, px)
                 for t, tp, px in zip(towers, tower_params, images)]
        out, _, _, _ = model.apply(vision_params, feats, masks,
                                   method=CambrianLM.prepare_vision)
        return out

    # ---- the wire format: distinct JPEGs ---------------------------------
    rng = np.random.default_rng(0)
    jpegs = []
    for i in range(BATCH * 2):
        arr = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        jpegs.append(buf.getvalue())

    specs = [  # (target, mean, std) per production tower
        (t.image_size, t.image_processor.image_mean, t.image_processor.image_std)
        for t in towers
    ]

    use_native = native_image.available()

    def preprocess_host(batch_jpegs):
        """JPEG decode + per-tower expand2square/resize/normalize (native
        C++ pool when available, PIL otherwise) -> 4 NCHW float32 arrays."""
        decoded = [np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
                   for b in batch_jpegs]
        out = []
        for target, mean, std in specs:
            if use_native:
                out.append(native_image.preprocess_batch(
                    decoded, target, mean, std,
                    resample=native_image.RESAMPLE_BICUBIC))
            else:
                from cambrian_tpu.mm_utils import ImageProcessor, expand2square

                proc = ImageProcessor(size=target, image_mean=tuple(mean),
                                      image_std=tuple(std))
                arrs = [proc.preprocess(
                    expand2square(Image.fromarray(d),
                                  tuple(int(m * 255) for m in mean))
                    .resize((target, target)))["pixel_values"][0]
                    for d in decoded]
                out.append(np.stack(arrs))
        return out

    # ---- staged ceiling (bench.py protocol) ------------------------------
    staged = [jnp.asarray(px, dtype) for px in preprocess_host(jpegs[:BATCH])]
    out = encode(vision_params, tower_params, staged, masks)
    np.asarray(out)  # warm + flush (axon tunnel)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = encode(vision_params, tower_params, staged, masks)
    out.block_until_ready()
    chip_s = (time.perf_counter() - t0) / ITERS
    staged_rate = BATCH / chip_s

    # ---- host-only preprocess rate ---------------------------------------
    t0 = time.perf_counter()
    for i in range(3):
        preprocess_host(jpegs[i * BATCH // 2: i * BATCH // 2 + BATCH])
    host_s = (time.perf_counter() - t0) / 3
    host_rate = BATCH / host_s

    # ---- overlapped: prefetch thread feeding the device loop -------------
    q: "queue.Queue" = queue.Queue(maxsize=2)
    n_batches = ITERS
    stop = object()

    def producer():
        for i in range(n_batches):
            sel = [jpegs[(i + j) % len(jpegs)] for j in range(BATCH)]
            q.put(preprocess_host(sel))
        q.put(stop)

    th = threading.Thread(target=producer, daemon=True)
    t0 = time.perf_counter()
    th.start()
    out = None
    while True:
        item = q.get()
        if item is stop:
            break
        images = [jnp.asarray(px, dtype) for px in item]
        out = encode(vision_params, tower_params, images, masks)
    out.block_until_ready()
    overlapped_s = (time.perf_counter() - t0) / n_batches
    overlapped_rate = BATCH / overlapped_s

    bound = min(staged_rate, host_rate)
    print(json.dumps({
        "metric": "4-tower encode from raw JPEG bytes (bs=8, prefetch "
                  "overlap, native=" + str(use_native) + ")",
        "staged_img_s": round(staged_rate, 2),
        "host_only_img_s": round(host_rate, 2),
        "overlapped_img_s": round(overlapped_rate, 2),
        "overlap_efficiency_vs_bound": round(overlapped_rate / bound, 3),
        "host_ms_per_batch": round(host_s * 1000, 1),
        "chip_ms_per_batch": round(chip_s * 1000, 1),
        "threads_needed_to_saturate_chip": int(np.ceil(host_s / chip_s)),
    }))


if __name__ == "__main__":
    main()
