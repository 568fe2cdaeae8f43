"""Multi-host process-group initialization (DCN control plane).

The reference is single-process (``README.md:19``).  On a TPU pod slice,
JAX needs ``jax.distributed.initialize`` once per host process before any
device query; afterwards ``jax.devices()`` spans the whole slice and the
3D mesh of :mod:`.mesh` shards grids across hosts with ICI collectives
(SURVEY.md §5 "Distributed communication backend").

On Cloud TPU the coordinator/process-count/process-id are discovered from
the TPU metadata environment automatically; explicit arguments override.
"""

from __future__ import annotations

from typing import Optional

import jax

_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Idempotent ``jax.distributed.initialize``.

    Returns True if a multi-process group is (now) active, False when
    running single-process (no coordinator configured or discoverable) —
    in which case everything still works on the local devices.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except Exception:
        # single-process fallback (no TPU metadata / no coordinator)
        _initialized = True
        return False
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write outputs/checkpoint metadata."""
    return jax.process_index() == 0
