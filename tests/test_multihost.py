"""Exercise the multi-host path for real: two OS processes join through
``initialize_multihost`` (jax.distributed over a local coordinator), build
one global mesh spanning both processes' devices, and run the full
data-parallel train step with globally-sharded batches.

This is the CPU stand-in for a 2-host DCN job (the reference has no
distributed story at all, SURVEY.md §5.8); it validates the
initialize -> mesh -> sharded-step chain end to end, not just the
single-process virtual-device mesh the rest of the suite uses."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from spatiotemporal_variable_separation_tpu.parallel.distributed import (
    initialize_multihost,
)

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()      # 2 local x 2 processes
assert len(jax.local_devices()) == 2

import numpy as np
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import (
    build_separable_network,
)
from spatiotemporal_variable_separation_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated_sharding,
)
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import (
    make_optimizer, make_train_step,
)

cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                       code_size_s=8, code_size_t=8, enc_hidden_size=16,
                       dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                       nt_cond=3, nt_pred=3, offset=3, precision="f32",
                       batch_size=8, seed=0)
mesh = make_mesh()  # global: all 4 devices across both processes
assert mesh.devices.size == 4

model = build_separable_network(cfg)
tx = make_optimizer(cfg, steps_per_epoch=10)
state = jax.device_put(create_train_state(model, cfg, tx),
                       replicated_sharding(mesh))
step = make_train_step(model, cfg, tx, mesh)

# Each process contributes its local half of the global batch.
from spatiotemporal_variable_separation_tpu.parallel.distributed import (
    local_batch_to_global,
)

rng = np.random.default_rng(0)
seq = rng.random((cfg.batch_size, 6, 64, 64, 1)).astype(np.float32)
half = slice(pid * (cfg.batch_size // 2), (pid + 1) * (cfg.batch_size // 2))
cond, target = local_batch_to_global(mesh, (seq[half, :3], seq[half, 3:]))
assert cond.shape[0] == cfg.batch_size
state, metrics = step(state, cond, target)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
assert int(state.step) == 1
print(f"proc {pid}: multihost step ok, loss={loss:.5f}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=str(tmp_path))
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: multihost step ok" in out, out
    loss0 = outs[0].split("loss=")[1].split()[0]
    loss1 = outs[1].split("loss=")[1].split()[0]
    assert loss0 == loss1  # both processes saw the same global reduction
