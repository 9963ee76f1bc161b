"""Misc utilities: seeding, timers, process-rank helpers.

Counterpart of reference src/utils/utils.py (get_rank/is_main_process,
elapsed_timer) and src/utils/model.py (seed_everything). In the TPU build the
"rank" is the JAX process index (multi-host), not a torchrun env var.
"""

from __future__ import annotations

import os
import random
import time
from contextlib import contextmanager
from typing import Iterator

import numpy as np


def get_rank() -> int:
    """Process index. 0 for single-process; jax.process_index() when under
    multi-host (jax.distributed). Falls back to env RANK for launcher compat."""
    try:
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover - jax always importable here
        return int(os.environ.get("RANK", 0))


def is_main_process() -> bool:
    return get_rank() == 0


def seed_everything(seed: int) -> None:
    """Seed python + numpy. JAX randomness is explicit via PRNG keys derived
    from the same seed (no global torch-style RNG to seed)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


@contextmanager
def elapsed_timer() -> Iterator:
    """Context manager yielding a callable that returns elapsed seconds;
    the value freezes once the block exits.

    Mirrors reference src/utils/utils.py:60-67 semantics (used for per-frame
    video latency overlays)."""
    start = time.perf_counter()
    end = [None]
    yield lambda: (end[0] if end[0] is not None else time.perf_counter()) - start
    end[0] = time.perf_counter()
