"""Device-mesh utilities: the TPU-native replacement for the reference's
single-GPU device selection (``var_sep/main.py:54-61``).

The framework trains data-parallel over a 1-D ``("data",)`` mesh: the batch
is sharded over the mesh's data axis, parameters and optimizer state are
replicated, and XLA inserts the gradient ``psum`` over ICI when the train
step is jitted with these shardings.  Multi-host extension: call
``jax.distributed.initialize()`` before :func:`make_mesh` and the same code
paths span hosts over DCN.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: Optional[int] = None, devices=None,
              model_parallel: int = 1) -> Mesh:
    """Device mesh over the first ``num_devices`` devices.

    ``model_parallel == 1`` (default): the 1-D ``("data",)`` mesh.
    ``model_parallel > 1``: a 2-D ``("data", "model")`` mesh of shape
    ``(num_devices // model_parallel, model_parallel)`` — the model axis is
    the *minor* (fastest-varying) dimension so tensor-parallel collectives
    ride adjacent-chip ICI links on a real slice.  Parameter sharding rules
    for the model axis live in :mod:`..parallel.tensor`.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    if model_parallel > 1:
        if len(devices) % model_parallel:
            raise ValueError(
                f"model_parallel={model_parallel} does not divide "
                f"{len(devices)} devices")
        grid = np.array(devices).reshape(-1, model_parallel)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
