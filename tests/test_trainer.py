"""End-to-end trainer test on the 8-device CPU mesh: full train() entry with
a tiny checkpoint + JSONL dataset, Orbax checkpointing, resume, HF export."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from util import make_tiny_checkpoint  # noqa: E402

from cambrian_tpu.train.train import DataArguments, ModelArguments, train  # noqa: E402
from cambrian_tpu.train.trainer import TrainingArguments  # noqa: E402


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("trainrun")
    ckpt = d / "base_ckpt"
    make_tiny_checkpoint(str(ckpt))

    img_dir = d / "images"
    img_dir.mkdir()
    Image.new("RGB", (64, 40), (200, 30, 40)).save(img_dir / "img0.jpg")
    records = [
        {"id": str(i), "image": "img0.jpg", "conversations": [
            {"from": "human", "value": "<image>\nWhat is in this image?"},
            {"from": "gpt", "value": "A cat sitting on a mat."},
        ]} if i % 2 == 0 else
        {"id": str(i), "conversations": [
            {"from": "human", "value": "What is a cat?"},
            {"from": "gpt", "value": "A cat is a small animal."},
        ]}
        for i in range(8)
    ]
    data_path = d / "train.jsonl"
    with open(data_path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return d, str(ckpt), str(data_path), str(img_dir)


def _args(d, ckpt, data_path, img_dir, out):
    model_args = ModelArguments(
        model_name_or_path=ckpt,
        version="llama_3",
        vision_tower_aux_list=json.dumps(["debug-tower-0", "debug-tower-1"]),
        vision_tower_aux_token_len_list=json.dumps([16, 64]),
        image_token_len=16,
        query_num_list=json.dumps([16]),
        connector_depth=2,
        num_of_vision_sampler_layers=2,
        stride_of_vision_sampler_layers=2,
        vision_hidden_size=64,
    )
    data_args = DataArguments(
        data_path=data_path, image_folder=img_dir,
        image_position=5, model_max_length=96,
    )
    training_args = TrainingArguments(
        output_dir=out,
        num_train_epochs=3,
        per_device_train_batch_size=1,
        logging_steps=1,
        save_steps=2,
        learning_rate=1e-3,
        warmup_ratio=0.0,
        lr_scheduler_type="constant",
        bf16=False,
        mesh_data=1, mesh_fsdp=-1, mesh_model=1,
        group_by_modality_length=True,
    )
    return model_args, data_args, training_args


def test_train_entry_end_to_end(workdir):
    d, ckpt, data_path, img_dir = workdir
    out = str(d / "out")
    model_args, data_args, training_args = _args(d, ckpt, data_path, img_dir, out)

    history = train(model_args, data_args, training_args)
    assert len(history) >= 2
    assert all(np.isfinite(h["loss"]) for h in history)
    # orbax checkpoints written
    assert os.path.isdir(os.path.join(out, "orbax"))
    # HF export written and loadable
    assert os.path.exists(os.path.join(out, "config.json"))
    assert any(f.endswith(".safetensors") for f in os.listdir(out))

    from cambrian_tpu.models.builder import load_config

    cfg = load_config(out)
    assert cfg.image_token_len == 16


def test_adam_mu_dtype_bf16_storage():
    """adam_mu_dtype='bfloat16' stores the first moment bf16 (second moment
    and updates stay fp32) — the stage-2 launch scripts' per-device HBM lever
    (docs/PERF_NOTES.md r4)."""
    import jax
    import jax.numpy as jnp

    from cambrian_tpu.train.optimizer import TrainConfig, build_optimizer

    params = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    tx, _ = build_optimizer(
        params, TrainConfig(adam_mu_dtype="bfloat16", total_steps=4))
    state = tx.init(params)
    dtypes = [l.dtype for l in jax.tree.leaves(state)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    assert jnp.bfloat16 in dtypes and jnp.float32 in dtypes
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert all(u.dtype == jnp.float32 for u in jax.tree.leaves(updates))


def test_schedule_advances_per_optimizer_step_under_multisteps():
    """Regression (ADVICE r4 high): optax.MultiSteps advances the inner adamw
    count (and its warmup-cosine schedule) once per k micro-batches, so the
    schedule horizon must be sized in OPTIMIZER steps. After consuming all
    total_steps*k micro-batches the inner count must equal total_steps and
    the cosine must have reached its end value."""
    import jax
    import jax.numpy as jnp
    import optax

    from cambrian_tpu.train.optimizer import (
        TrainConfig, _schedule, build_optimizer,
    )

    k, opt_steps = 4, 8
    cfg = TrainConfig(learning_rate=1e-2, lr_scheduler_type="cosine",
                      warmup_ratio=0.25, total_steps=opt_steps)
    params = {"w": jnp.ones((4, 4))}
    tx, _ = build_optimizer(params, cfg)
    mtx = optax.MultiSteps(tx, k)
    state = mtx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1)}
    for _ in range(opt_steps * k):  # one epoch of micro-batches
        updates, state = mtx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    counts = [int(l) for l in jax.tree.leaves(state)
              if hasattr(l, "dtype") and l.dtype == jnp.int32 and l.ndim == 0]
    # MultiSteps' gradient_step and the inner adamw count both sit at
    # opt_steps; nothing should have advanced past it (micro-step counting
    # would leave the inner count at opt_steps while the schedule was sized
    # for opt_steps*k and never finish the cosine)
    assert max(counts) == opt_steps, counts
    assert float(_schedule(cfg.learning_rate, cfg)(opt_steps)) <= 1e-9
    # mid-horizon sanity: the schedule peaked at warmup end
    warmup = int(cfg.warmup_ratio * opt_steps)
    assert float(_schedule(cfg.learning_rate, cfg)(warmup)) == pytest.approx(
        1e-2, rel=1e-6)


def test_trainer_sizes_schedule_in_optimizer_steps(workdir, tmp_path):
    """End-to-end: with gradient_accumulation_steps=2 the trainer must size
    total_steps (and hence the logged LR trajectory) in optimizer steps —
    the final logged LR reaches the cosine tail, not 1/k of the horizon."""
    d, ckpt, data_path, img_dir = workdir

    # 16 records -> 2 micro-batches/epoch at global batch 8; accum 2 ->
    # 1 optimizer step/epoch; 2 epochs = 2 optimizer steps, all data consumed
    records = [json.loads(l) for l in open(data_path)]
    big = tmp_path / "train16.jsonl"
    with open(big, "w") as f:
        for i in range(16):
            r = dict(records[i % len(records)], id=str(i))
            f.write(json.dumps(r) + "\n")

    out = str(tmp_path / "out_accum")
    model_args, data_args, training_args = _args(
        d, ckpt, str(big), img_dir, out)
    training_args.gradient_accumulation_steps = 2
    training_args.num_train_epochs = 2
    training_args.lr_scheduler_type = "cosine"
    training_args.warmup_ratio = 0.0
    training_args.save_steps = 100

    history = train(model_args, data_args, training_args)
    # the horizon IS the discriminator: micro-step sizing set total_steps to
    # 4 (loop) / 8 (schedule) here and exhausted the data halfway through
    assert training_args.total_steps == 2
    assert [h["step"] for h in history] == [1, 2]
    assert all(np.isfinite(h["loss"]) for h in history)
    # warmup 0 -> lr(0) = peak; cosine over 2 steps -> lr(1) = peak/2
    peak = training_args.learning_rate
    assert history[0]["lr"] == pytest.approx(peak, rel=1e-6)
    assert history[1]["lr"] == pytest.approx(peak / 2, rel=1e-6)


def test_train_resume(workdir):
    d, ckpt, data_path, img_dir = workdir
    out = str(d / "out")  # same output dir as the previous test
    model_args, data_args, training_args = _args(d, ckpt, data_path, img_dir, out)
    training_args.train_continue = True

    # resumes at the final step; loop is a no-op but restore must succeed
    history = train(model_args, data_args, training_args)
    assert isinstance(history, list)


def test_train_lora(workdir):
    d, ckpt, data_path, img_dir = workdir
    out = str(d / "out_lora")
    model_args, data_args, training_args = _args(d, ckpt, data_path, img_dir, out)
    training_args.lora_enable = True
    training_args.lora_r = 4
    training_args.lora_alpha = 8
    training_args.num_train_epochs = 2

    history = train(model_args, data_args, training_args)
    assert all(np.isfinite(h["loss"]) for h in history)
    assert os.path.exists(os.path.join(out, "lora_adapters.safetensors"))
    # merged HF export written and loadable
    assert os.path.exists(os.path.join(out, "config.json"))
    from cambrian_tpu.models.builder import load_config

    assert load_config(out).image_token_len == 16


def test_consolidate_training_output(workdir):
    """Orbax training checkpoint -> HF export -> loadable model (the
    reference's consolidate + convert_hf_model pipeline, SURVEY §3.5)."""
    d, ckpt, data_path, img_dir = workdir
    out = str(d / "out")
    if not os.path.isdir(os.path.join(out, "orbax")):
        # order-independent: produce the training output if absent
        train(*_args(d, ckpt, data_path, img_dir, out))
    from cambrian_tpu.checkpoint.consolidate import consolidate
    from cambrian_tpu.models.builder import load_pretrained_model

    hf_dir = str(d / "consolidated")
    consolidate(out, hf_dir)
    import shutil

    for f in os.listdir(ckpt):
        if f.startswith("tokenizer"):
            shutil.copy(os.path.join(ckpt, f), hf_dir)
    tokenizer, model, processors, _ = load_pretrained_model(hf_dir)
    ids = np.asarray(tokenizer("a cat sat").input_ids, dtype=np.int32)
    out_ids = model.generate(ids, max_new_tokens=2)
    assert out_ids.shape[0] == 1
