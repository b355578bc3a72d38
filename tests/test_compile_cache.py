"""Persistent compilation cache: opt-in resolution, population, and reuse.

Remote compiles dominate startup on the tunneled TPU platform (CLAUDE.md:
~14 min for the flagship fused step on a degraded tunnel); every entry
point funnels through ``enable_compilation_cache`` so auto-restarted
training, repeated eval CLIs, and bench re-runs reuse serialized
executables. Here we verify the mechanism end to end on CPU."""

import os

import jax

from spatiotemporal_variable_separation_tpu.utils.compile_cache import (
    enable_compilation_cache,
)


def test_env_disable(monkeypatch, tmp_path):
    monkeypatch.setenv("VARSEP_COMPILE_CACHE", "off")
    assert enable_compilation_cache() is None


def test_cache_populates_and_hits(tmp_path):
    # subprocess: JAX initializes the persistent cache object once per
    # process, so a shared test process that already enabled it elsewhere
    # (Evaluator/Forecaster construction) would ignore the repointed dir.
    import subprocess
    import sys

    cache_dir = str(tmp_path / "cache")
    prog = f"""
import os
import jax
jax.config.update('jax_platforms', 'cpu')
from spatiotemporal_variable_separation_tpu.utils.compile_cache import (
    enable_compilation_cache,
)
# min_compile_secs=0: the toy program compiles in ~50 ms, far below the
# production threshold that skips caching trivial programs
assert enable_compilation_cache({cache_dir!r}, min_compile_secs=0.0) == {cache_dir!r}
import jax.numpy as jnp
f = jax.jit(lambda x: (x @ x.T).sum() * 3.0)
x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
f(x).block_until_ready()
entries = sorted(os.listdir({cache_dir!r}))
assert entries, 'no cache entry written'
# re-tracing the SAME program after clearing the in-memory cache must load
# from disk (entry set unchanged, compile succeeds with the dir active)
jax.clear_caches()
f(x).block_until_ready()
assert sorted(os.listdir({cache_dir!r})) == entries
print('CACHE_OK', len(entries))
"""
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CACHE_OK" in r.stdout


def test_explicit_dir_beats_env(monkeypatch, tmp_path):
    monkeypatch.setenv("VARSEP_COMPILE_CACHE", str(tmp_path / "envdir"))
    explicit = str(tmp_path / "explicit")
    try:
        assert enable_compilation_cache(explicit) == explicit
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
