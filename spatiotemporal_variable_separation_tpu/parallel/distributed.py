"""Multi-host initialization.

Single-host multi-chip needs nothing: :func:`make_mesh` sees all local
devices.  For TPU pods spanning hosts (DCN), call
:func:`initialize_multihost` once per process before any jax call; the
data-parallel mesh and the jit-sharded train step then work unchanged —
XLA routes the gradient all-reduce over ICI within a slice and DCN across
slices.  (The reference has no distributed story at all; SURVEY.md §5.8.)
"""

from __future__ import annotations

from typing import Optional


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Thin wrapper over ``jax.distributed.initialize``.

    On TPU pods all arguments are auto-detected from the environment; pass
    them explicitly only for exotic setups.  Exercised end to end by the
    2-process CPU job in ``tests/test_multihost.py``."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_to_global(mesh, host_batch, global_batch_size: Optional[int] = None):
    """Assemble a globally-sharded batch from this process's local shard.

    In a multi-host job each process loads only its slice of the global
    batch (``host_batch``, leading axis = local rows); this stitches the
    slices into one global jax.Array sharded over the mesh's data axis
    without any cross-host transfer of array data.  Works tree-wide.

    ``global_batch_size`` defaults to ``local rows x process_count``.
    """
    import jax

    from spatiotemporal_variable_separation_tpu.parallel.mesh import (
        batch_sharding,
    )

    sharding = batch_sharding(mesh)
    n_proc = jax.process_count()

    def put(x):
        global_shape = ((global_batch_size if global_batch_size is not None
                         else x.shape[0] * n_proc),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape=global_shape)

    return jax.tree_util.tree_map(put, host_batch)
