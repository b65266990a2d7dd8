"""Multi-host (multi-process) runtime initialization.

The reference runs one torch_xla process per TPU-VM worker, fanned out over
ssh (/root/reference/docs/TPUs_Torch_XLA.md:153-163, train_tpu.py:12). The
JAX equivalent is ``jax.distributed.initialize``: every host process joins a
coordinator, ``jax.devices()`` becomes the GLOBAL device list, and GSPMD
shardings span hosts with zero further code changes.

Three launch modes:
- TPU pod slice (``gcloud ... ssh --worker=all 'python -m
  cambrian_tpu.train.train ...'``): call with no arguments — JAX
  auto-detects coordinator/process count from the TPU metadata env.
- Explicit: ``--coordinator_address host:port --num_processes N
  --process_id I`` flags (any backend, incl. the CPU simulation used by
  tests/test_multiprocess.py).
- Single process: no flags, not on a pod -> no-op.

Must run before any JAX backend touch (jax.devices(), device_put, ...).
"""

import logging
import os
from typing import Optional, Sequence

logger = logging.getLogger(__name__)

_INITIALIZED = False


def _tpu_pod_env() -> bool:
    """True when running inside a multi-worker TPU pod slice (metadata env
    set by the TPU VM runtime)."""
    env = os.environ
    if "MEGASCALE_COORDINATOR_ADDRESS" in env:
        return True
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hostnames  # >1 worker


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Idempotently join the multi-process runtime. Returns True if a
    multi-process runtime was initialized."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    explicit = coordinator_address is not None or (
        num_processes is not None and num_processes > 1)
    if not explicit and not _tpu_pod_env():
        return False

    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    logger.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def put_global_batch(batch, shardings):
    """Build global device arrays for a host batch under any sharding, in
    both single- and multi-process runtimes.

    Every process constructs the same global host batch (the index stream is
    seed-deterministic, so this needs no cross-host communication); each
    process then materializes only the shards its addressable devices own via
    ``jax.make_array_from_callback``.
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(batch, shardings)

    def put_one(x, sh):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    return jax.tree.map(put_one, batch, shardings)
