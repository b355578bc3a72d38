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
    them explicitly only for exotic setups."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
