"""Tensor-parallel parameter sharding over a 2-D ``(data, model)`` mesh.

The reference trains strictly on one GPU (``var_sep/main.py:54-61``); this
module is a TPU-native capability extension: Megatron-style intra-layer
model parallelism expressed purely as GSPMD sharding annotations on the
parameter pytree — XLA inserts the all-reduce / all-gather collectives
over ICI, and the train step itself (``train/step.py``) is unchanged.

One shape-driven rule, no per-architecture tables: for every ``kernel``
leaf with >= 2 dims (dense ``(in, out)``, conv ``(kh, kw, cin, cout)``),
shard whichever of its last two dimensions is larger *and* divisible by
the model-axis size; on a tie, the output dim.  On the separable networks
this lands exactly on the classic column-parallel -> row-parallel split:

* integrator MLP blocks ``(code, hid) -> (hid, hid) -> (hid, code)`` with
  ``hid >> code`` become column / column / row parallel (activations stay
  hidden-sharded across the block, one reduce at the exit);
* encoder ``to_code`` kernels ``(flat, code)`` shard the large input dim
  (row parallel — the S/T codes themselves stay replicated);
* hidden conv stages shard the wider channel dim; the 1-channel
  ``to_frame`` output loses every comparison and stays replicated.

Biases, BatchNorm scale/shift, batch statistics, step counters and RNG
keys replicate; GSPMD re-shards them against channel-sharded activations
where needed.  Optimizer moments (Adam ``mu``/``nu``) mirror their
parameter's sharding because their leaf paths end in the same ``kernel``
key.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spatiotemporal_variable_separation_tpu.parallel.mesh import MODEL_AXIS


def model_axis_size(mesh: Mesh) -> int:
    """Size of the mesh's model axis (1 when the mesh has none)."""
    return dict(mesh.shape).get(MODEL_AXIS, 1)


def kernel_partition_spec(shape, n_model: int) -> P:
    """PartitionSpec for one kernel: shard the larger divisible of the last
    two dims on the model axis (tie -> the last/output dim); replicate when
    neither divides."""
    nd = len(shape)
    if n_model <= 1 or nd < 2:
        return P()
    a, b = nd - 2, nd - 1
    div_a = shape[a] % n_model == 0 and shape[a] >= n_model
    div_b = shape[b] % n_model == 0 and shape[b] >= n_model
    if div_b and (not div_a or shape[b] >= shape[a]):
        axis = b
    elif div_a:
        axis = a
    else:
        return P()
    spec = [None] * nd
    spec[axis] = MODEL_AXIS
    return P(*spec)


def _path_key(entry) -> object:
    """Normalize a tree_util KeyPath entry to its dict key / attr name."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return getattr(entry, attr)
    return None


def state_shardings(state, mesh: Mesh):
    """NamedSharding pytree for a :class:`~train.state.TrainState` (or any
    pytree): ``kernel`` leaves get :func:`kernel_partition_spec`, everything
    else replicates.  Works on concrete states and ``jax.eval_shape``
    abstractions alike."""
    n_model = model_axis_size(mesh)

    def leaf_sharding(path, leaf):
        if (n_model > 1 and path and _path_key(path[-1]) == "kernel"
                and getattr(leaf, "ndim", 0) >= 2):
            return NamedSharding(mesh, kernel_partition_spec(leaf.shape, n_model))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_state(state, mesh: Mesh):
    """Device-put a train state with tensor-parallel kernel sharding."""
    return jax.device_put(state, state_shardings(state, mesh))
