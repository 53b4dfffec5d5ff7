"""Multi-host (multi-process) runtime initialization.

The reference is strictly single-process (SURVEY §2.9: its
`distributed:` YAML block is dead). Here multi-host TPU training is a
first-class path: each host runs the same program, JAX is initialized
with `jax.distributed.initialize`, `jax.devices()` becomes the GLOBAL
device list (so `make_mesh` builds a pod-wide mesh), and the input
pipeline feeds each process its slice of every global batch
(`data/pipeline.py` `process_index/process_count` +
`make_array_from_process_local_data`).

On Cloud TPU pods `jax.distributed.initialize()` autodetects the
coordinator/process topology from the TPU metadata; elsewhere pass the
coordinator address + process counts explicitly (or set the standard
env vars JAX reads: COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("cadepth_tpu")

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process JAX runtime (idempotent).

    Must run before any other JAX usage in the process. Returns True if
    distributed mode was initialized, False if running single-process
    (no coordinator configured and not on a multi-host platform).
    """
    global _initialized
    if _initialized:
        return True

    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])

    try:
        # With no explicit args this autodetects TPU-pod topology; with
        # args it joins the given coordinator (CPU/GPU clusters too).
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as exc:  # noqa: BLE001 - single-host fallback is the point
        log.info("jax.distributed.initialize unavailable (%s); "
                 "running single-process", exc)
        return False
    _initialized = True
    log.info("distributed runtime: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True
