"""Multi-host initialization (counterpart of reference ddp_setup/ddp_finalize,
src/base/bin/train.py:16-27).

torchrun's env-var rank discovery maps to jax.distributed.initialize, which
reads the coordinator address / process count from the TPU environment (or
explicit args). Single-process runs are a no-op, mirroring the reference's
graceful single-GPU fallback (train.py:31-39)."""

from __future__ import annotations

import os

import jax

from ..loggers.pylogger import log

_initialized = False


def setup_distributed(coordinator_address: str | None = None,
                      num_processes: int | None = None,
                      process_id: int | None = None) -> int:
    """Initialize multi-host JAX if a multi-process environment is detected.
    Returns the process index (rank)."""
    global _initialized
    want_multi = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if want_multi and not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        log.info(
            f"Initialized jax.distributed: process {jax.process_index()} / {jax.process_count()}"
        )
    return jax.process_index()


def finalize_distributed() -> None:
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False
