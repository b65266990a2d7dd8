"""Training loop: the thin custom trainer replacing HF Trainer + torch_xla
FSDP (SURVEY.md §7 deliberate non-ports).

Feature parity with the reference's training runtime (cambrian_trainer.py):
- modality/length-grouped batch sampling (:92-162)
- 3-group learning rates + freeze policies (:242-381 via train/optimizer.py)
- periodic sharded checkpoints with optimizer/RNG state and resume
  (:389-573) — Orbax/tensorstore instead of gcsfs+xm.save
- NaN/Inf failure detection that halts the run
  (wandb_nan_alert_callback.py:10-35)
- step-decoupled async host->device prefetch (the reference used 4 PIL
  dataloader workers + MpDeviceLoader; ours is a thread pumping the collator
  while the device steps)
"""

import concurrent.futures
import json
import logging
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dataset import LengthGroupedSampler
from ..parallel.distributed import is_main_process, put_global_batch
from ..parallel.mesh import MeshConfig, create_mesh
from ..parallel.sharding import infer_param_shardings
from .optimizer import TrainConfig
from .train_step import (
    TrainState,
    batch_shardings,
    init_train_state,
    make_train_step,
    state_shardings,
)

logger = logging.getLogger(__name__)


@dataclass
class TrainingArguments(TrainConfig):
    """Flag surface mirroring the reference's TrainingArguments
    (train_fsdp.py:121-173) plus mesh controls."""

    output_dir: str = "./checkpoints"
    num_train_epochs: float = 1.0
    max_steps: int = -1
    per_device_train_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    logging_steps: int = 10
    save_steps: int = 500
    save_total_limit: int = 2
    seed: int = 42
    group_by_modality_length: bool = True
    bf16: bool = True
    # parallel per-sample fetch inside the prefetch thread (reference flag
    # dataloader_num_workers=4, e.g. pretrain_cambrian_8b.sh; PIL decode and
    # the native C++ image ops release the GIL, so threads scale on real
    # multi-core hosts — nproc=1 dev containers see no change)
    dataloader_num_workers: int = 4
    # mesh
    mesh_data: int = 1
    mesh_fsdp: int = -1
    mesh_model: int = 1
    # multi-host (one process per TPU-VM worker; see parallel/distributed.py;
    # all three optional — TPU pod slices auto-detect with no flags)
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # resume
    train_continue: bool = False
    resume_from_checkpoint: Optional[str] = None
    # logging backends ("none" or "wandb"; wandb is optional in this image)
    report_to: str = "none"
    run_name: Optional[str] = None
    # LoRA (reference train_fsdp.py lora_* flags)
    lora_enable: bool = False
    lora_r: int = 16
    lora_alpha: int = 32
    lora_dropout: float = 0.0      # accepted for CLI parity; adapters are
    lora_bias: str = "none"        # bias-free and dropout-free functionally
    lora_weight_path: Optional[str] = None
    # gcs sync (reference GCloudRsyncCallback)
    gcs_output_dir: Optional[str] = None


class NanInfAlert(RuntimeError):
    """Raised to halt training on non-finite loss (the reference raises from
    its wandb alert callback, wandb_nan_alert_callback.py:31-35)."""


class _Prefetcher:
    """Background thread building (collated, device_put) batches."""

    def __init__(self, make_batch: Callable[[], Any], depth: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._make = make_batch
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while not self._stop.is_set():
            try:
                item = self._make()
            except StopIteration:
                self._queue.put(None)
                return
            self._queue.put(item)

    def __next__(self):
        item = self._queue.get()
        if item is None:
            raise StopIteration
        return item

    def stop(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


class CambrianTrainer:
    def __init__(self, model, towers, args: TrainingArguments,
                 train_dataset, data_collator, tower_params,
                 init_params=None):
        self.model = model
        self.towers = towers
        self.args = args
        self.train_dataset = train_dataset
        self.data_collator = data_collator
        self.tower_params = tower_params
        self.init_params = init_params

        self.mesh = create_mesh(MeshConfig(args.mesh_data, args.mesh_fsdp,
                                           args.mesh_model))
        self.dp_size = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
        self.global_batch_size = args.per_device_train_batch_size * self.dp_size

        self._ckpt_mgr = None

    # -- checkpointing ------------------------------------------------------

    @property
    def checkpoint_manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            path = os.path.abspath(os.path.join(self.args.output_dir, "orbax"))
            os.makedirs(path, exist_ok=True)
            self._ckpt_mgr = ocp.CheckpointManager(
                path,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.args.save_total_limit, create=True
                ),
            )
        return self._ckpt_mgr

    def _save_checkpoint(self, state: TrainState, rng_key, step: int):
        import orbax.checkpoint as ocp

        self.checkpoint_manager.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(state.params),
                opt_state=ocp.args.StandardSave(state.opt_state),
                rng=ocp.args.ArraySave(rng_key),
                meta=ocp.args.JsonSave({"step": step}),
            ),
        )
        self.checkpoint_manager.wait_until_finished()
        self._gcs_sync()

    def _restore_checkpoint(self, state: TrainState, rng_key):
        import orbax.checkpoint as ocp

        step = self.checkpoint_manager.latest_step()
        if step is None:
            return state, rng_key, 0
        restored = self.checkpoint_manager.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(state.params),
                opt_state=ocp.args.StandardRestore(state.opt_state),
                rng=ocp.args.ArrayRestore(rng_key),
            ),
        )
        state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=jnp.asarray(step, jnp.int32))
        logger.info("resumed from checkpoint step %d", step)
        return state, restored["rng"], step

    def _wandb_log(self, entry):
        """Optional wandb metrics (the reference logs via HF Trainer +
        wandb, cambrian_trainer.py:641-666); gated on the import."""
        if self.args.report_to != "wandb" or not is_main_process():
            return
        try:
            import wandb

            if wandb.run is None:
                wandb.init(project="cambrian-tpu", name=self.args.run_name,
                           resume="allow")
            wandb.log(dict(entry), step=entry["step"])
        except ImportError:
            logger.warning("report_to=wandb but wandb is not installed")
            self.args.report_to = "none"
        except Exception as e:
            logger.warning("wandb logging failed: %s", e)

    def _gcs_sync(self):
        """Best-effort output-dir sync to GCS (GCloudRsyncCallback parity)."""
        if not self.args.gcs_output_dir or not is_main_process():
            return
        try:
            import gcsfs

            fs = gcsfs.GCSFileSystem()
            fs.put(self.args.output_dir, self.args.gcs_output_dir, recursive=True)
        except Exception as e:
            logger.warning("gcs sync failed: %s", e)

    def save_model(self, output_dir: Optional[str] = None, state=None):
        """Final HF-format export (the reference's safe_save path)."""
        from ..checkpoint.save import save_pretrained

        output_dir = output_dir or self.args.output_dir
        params = state.params if state is not None else self.init_params
        if isinstance(params, dict) and "vision_towers" in params:
            params = params["model"]
        params = jax.device_get(params)
        save_pretrained(params, self.model.cfg, output_dir)

    # -- batching -----------------------------------------------------------

    def _index_stream(self, epochs: int):
        rng = np.random.default_rng(self.args.seed)
        for _ in range(max(1, epochs)):
            if self.args.group_by_modality_length:
                sampler = LengthGroupedSampler(
                    self.args.per_device_train_batch_size, self.dp_size,
                    self.train_dataset.modality_lengths,
                    generator=rng, group_by_modality=True,
                )
                order = list(iter(sampler))
            else:
                order = rng.permutation(len(self.train_dataset)).tolist()
            for i in range(0, len(order) - self.global_batch_size + 1,
                           self.global_batch_size):
                yield order[i:i + self.global_batch_size]

    # -- the loop -----------------------------------------------------------

    def train(self, resume_from_checkpoint: Optional[bool] = None):
        args = self.args
        # total_steps counts OPTIMIZER steps: optax.MultiSteps advances the
        # inner adamw (and its warmup-cosine count) once per k micro-batches,
        # so the schedule horizon must equal real optimizer steps — and one
        # epoch of data supports (dataset // global_batch) micro-batches =
        # that // k optimizer steps. (Sizing either in micro-steps stretched
        # warmup k× and ended the run at 1/k² of the cosine.)
        accum = max(1, args.gradient_accumulation_steps)
        steps_per_epoch = max(
            1, len(self.train_dataset) // (self.global_batch_size * accum))
        total_steps = (args.max_steps if args.max_steps > 0
                       else int(steps_per_epoch * args.num_train_epochs))
        args.total_steps = total_steps

        init_params = self.init_params
        tower_arg = self.tower_params
        lora_base = None
        if args.lora_enable:
            from .lora import init_lora_params, lora_from_state_dict

            lora_base = self.init_params
            if args.lora_weight_path:
                from safetensors.numpy import load_file

                adapters = lora_from_state_dict(load_file(args.lora_weight_path))
            else:
                adapters = init_lora_params(
                    lora_base, args.lora_r, jax.random.PRNGKey(args.seed))
            init_params = adapters
        elif args.unfreeze_mm_vision_tower:
            # towers join the trainable tree (vision_tower LR group); the
            # per-step tower argument becomes vestigial
            init_params = {"model": self.init_params,
                           "vision_towers": self.tower_params}
            tower_arg = []
        if args.bf16 and not args.lora_enable:
            from .optimizer import cast_frozen_params

            # frozen groups never update: store them bf16 (halves 34B stage-1
            # per-device HBM, tests/test_production_compile.py)
            init_params = cast_frozen_params(init_params, args)
        state = init_train_state(init_params, args)
        if args.gradient_accumulation_steps > 1:
            import optax

            tx = optax.MultiSteps(state.tx, args.gradient_accumulation_steps)
            state = TrainState(step=state.step, params=state.params,
                               opt_state=tx.init(state.params), tx=tx)

        if args.lora_enable:
            from .train_step import make_lora_train_step

            step_fn = make_lora_train_step(self.model, self.towers, lora_base,
                                           args.lora_alpha, args.lora_r)
        else:
            step_fn = make_train_step(self.model, self.towers,
                                      train_towers=args.unfreeze_mm_vision_tower,
                                      freeze=args)
        state_sh = state_shardings(state, self.mesh)
        tower_sh = [infer_param_shardings(tp, self.mesh) for tp in tower_arg]
        batch_sh = batch_shardings(self.mesh, num_towers=len(self.towers))

        rng_key = jax.random.PRNGKey(args.seed)
        start_step = 0
        if resume_from_checkpoint or args.train_continue:
            state, rng_key, start_step = self._restore_checkpoint(state, rng_key)

        with jax.set_mesh(self.mesh):
            jstep = jax.jit(step_fn, in_shardings=(state_sh, tower_sh, batch_sh),
                            out_shardings=(state_sh, None), donate_argnums=(0,))
            state = jax.device_put(state, state_sh)
            tower_params = [jax.device_put(tp, sh)
                            for tp, sh in zip(tower_arg, tower_sh)]

            index_iter = self._index_stream(int(np.ceil(args.num_train_epochs)))

            zero_supervision_batches = 0

            n_workers = max(1, args.dataloader_num_workers)
            fetch_pool = (concurrent.futures.ThreadPoolExecutor(n_workers)
                          if n_workers > 1 else None)
            pending: "queue.Queue" = queue.Queue()

            def submit_next():
                """Dispatch the next batch's per-sample fetches so they decode
                while the previous batch is being collated/stepped."""
                try:
                    idx = next(index_iter)
                except StopIteration:
                    pending.put(None)
                    return
                pending.put([fetch_pool.submit(self.train_dataset.__getitem__, i)
                             for i in idx])

            if fetch_pool is not None:
                submit_next()

            def make_batch():
                nonlocal zero_supervision_batches
                if fetch_pool is not None:
                    futures = pending.get()
                    if futures is None:
                        raise StopIteration
                    submit_next()
                    instances = [f.result() for f in futures]
                else:
                    idx = next(index_iter)
                    instances = [self.train_dataset[i] for i in idx]
                batch = self.data_collator(instances)
                # a batch whose labels are fully IGNORE_INDEX trains on
                # nothing but still reports loss 0.0 — the silent failure
                # mode of truncated prompts or tokenizer mismatches
                if (batch["labels"] != -100).sum() == 0:
                    zero_supervision_batches += 1
                    if zero_supervision_batches <= 3 or \
                            zero_supervision_batches % 100 == 0:
                        logger.warning(
                            "batch has ZERO supervised tokens (%d so far): "
                            "check model_max_length vs prompt length and the "
                            "tokenizer's template special tokens",
                            zero_supervision_batches)
                batch = {
                    k: ([jnp.asarray(x) for x in v] if isinstance(v, list)
                        else jnp.asarray(v))
                    for k, v in batch.items() if k != "labels" or True
                }
                return put_global_batch(batch, batch_sh)

            prefetcher = _Prefetcher(make_batch)
            history = []
            t0 = time.time()
            try:
                for step in range(start_step, total_steps):
                    for _ in range(args.gradient_accumulation_steps):
                        try:
                            batch = next(prefetcher)
                        except StopIteration:
                            logger.info("data exhausted at step %d", step)
                            self._save_checkpoint(state, rng_key, step)
                            return history
                        state, metrics = jstep(state, tower_params, batch)

                    if (step + 1) % args.logging_steps == 0 or step == start_step:
                        loss = float(metrics["loss"])
                        if not np.isfinite(loss):
                            self._save_checkpoint(state, rng_key, step)
                            raise NanInfAlert(
                                f"non-finite loss {loss} at step {step}"
                            )
                        dt = time.time() - t0
                        sps = (step + 1 - start_step) / max(dt, 1e-9)
                        from .optimizer import _schedule

                        entry = {"step": step + 1, "loss": loss,
                                 "grad_norm": float(metrics["grad_norm"]),
                                 # base-group LR at this OPTIMIZER step (the
                                 # count MultiSteps advances once per k
                                 # micro-batches)
                                 "lr": float(_schedule(
                                     args.learning_rate, args)(step)),
                                 "steps_per_sec": round(sps, 4),
                                 "samples_per_sec": round(sps * self.global_batch_size, 2)}
                        history.append(entry)
                        logger.info("train %s", json.dumps(entry))
                        self._wandb_log(entry)

                    if (step + 1) % args.save_steps == 0:
                        self._save_checkpoint(state, rng_key, step + 1)
            finally:
                prefetcher.stop()
                if fetch_pool is not None:
                    fetch_pool.shutdown(wait=False, cancel_futures=True)

            self._save_checkpoint(state, rng_key, total_steps)
            if args.lora_enable:
                # persist adapters + stash the merged params for save_model
                from safetensors.numpy import save_file

                from .lora import lora_state_dict, merge_lora

                adapters = jax.device_get(state.params)
                os.makedirs(args.output_dir, exist_ok=True)
                save_file(lora_state_dict(adapters),
                          os.path.join(args.output_dir, "lora_adapters.safetensors"))
                state = state.replace(params=merge_lora(
                    lora_base, state.params, args.lora_alpha, args.lora_r))
            self._final_state = state
        return history
