"""Persistent XLA compilation cache shared by every entry point.

The reference has nothing comparable (eager PyTorch compiles nothing); on
this platform compilation is the dominant startup cost — the flagship
fused train step has been observed to take ~14 min of silent remote
compile on a degraded tunnel. Caching the serialized executable on disk
makes supervised auto-restarts (`cli/supervise.py`), repeated eval CLI
invocations, and bench re-runs near-instant for programs compiled before.

Enabled opportunistically: platforms whose executables cannot be
serialized simply leave the cache unpopulated (JAX logs a warning and
continues), so calling this is always safe.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".varsep_jax_cache")


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 1.0) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument, ``VARSEP_COMPILE_CACHE`` env var
    (set to ``0``/``off`` to disable), ``~/.varsep_jax_cache``. Returns the
    directory in use, or None if disabled/unavailable.
    """
    env = os.environ.get("VARSEP_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return None
    path = cache_dir or env or _DEFAULT_DIR
    try:
        import jax

        if cache_dir is None and env is None and jax.default_backend() == "cpu":
            # Default-on only for accelerator backends: the cache exists to
            # skip the multi-minute remote TPU compile, CPU compiles are
            # seconds — and enabling it for the training CLI on the CPU
            # platform has been observed to hang the first compile (JAX
            # 0.9, observed in round 2; toy programs are fine, the full
            # train-step flow is not). Explicit opt-in (argument or env
            # var) still enables it anywhere.
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast-compiling programs: over the tunnel, *every*
        # compile pays at least a round-trip worth of latency.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover — unknown option on old jaxlib
        return None
    return path
