"""Device mesh construction.

The reference scales exclusively via torch_xla FSDP (one process per chip,
hand-rolled shard patch — train_fsdp.py:1277-1398). Here the whole strategy
is a named mesh + GSPMD: axes

    data  — pure data parallelism (outermost; rides DCN across slices)
    fsdp  — parameter/optimizer sharding (ZeRO-3 equivalent; rides ICI)
    model — tensor parallelism for 34B-class decoders (innermost on ICI)

Collectives are inserted by XLA from NamedSharding annotations; nothing in
the model code mentions devices.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "model")


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = -1     # -1: absorb remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int, int]:
        known = [x for x in (self.data, self.fsdp, self.model) if x != -1]
        prod = int(np.prod(known)) if known else 1
        free = n_devices // prod
        dims = tuple(free if x == -1 else x for x in (self.data, self.fsdp, self.model))
        if int(np.prod(dims)) != n_devices:
            raise ValueError(
                f"mesh {dims} does not cover {n_devices} devices"
            )
        return dims


def create_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a (data, fsdp, model) mesh over the available devices.

    Axis order puts `model` innermost so tensor-parallel collectives ride the
    fastest ICI links, then fsdp, then data (SURVEY.md §2.9 plan).
    """
    devices = jax.devices() if devices is None else devices
    config = config or MeshConfig()
    dims = config.resolve(len(devices))
    mesh_devices = np.asarray(devices).reshape(dims)
    return Mesh(mesh_devices, AXES)
