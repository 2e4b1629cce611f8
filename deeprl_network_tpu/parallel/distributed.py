"""Multi-host initialization (SURVEY.md section 7 step 6).

On a multi-host TPU pod slice every host runs the same program;
``jax.distributed.initialize`` wires the hosts into one global runtime and
``jax.devices()`` then spans the slice. The data-parallel mesh in
parallel/train.py shards env instances over ALL devices (DCN between
hosts, ICI within), parameters stay replicated, and the per-update
gradient pmean is the only cross-host collective.

Single-host runs need none of this; ``maybe_initialize`` is a no-op unless
cluster environment variables are present or explicit arguments are given.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger(__name__)


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    Returns True if distributed mode was initialized. Auto-detects cloud
    TPU pod environments (JAX's own auto-detection) when the standard env
    vars are set; explicit args override.
    """
    explicit = coordinator_address is not None
    auto = any(v in os.environ for v in
               ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not (explicit or auto):
        return False
    kwargs = {}
    if explicit:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    log.info("jax.distributed initialized: process %d/%d, %d local / %d "
             "global devices", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def is_primary() -> bool:
    """Only the primary process writes logs/checkpoints/metrics."""
    return jax.process_index() == 0
