"""Device-side input prefetching for the host training loop.

The reference overlaps host augmentation with GPU compute via torch
DataLoader workers + ``non_blocking=True`` H2D copies (reference
src/keypoints/module.py:36-41). The JAX analog: host->device transfers are
async dispatches, so staging batch N+1 onto the device *while step N
executes* hides both the transfer and the host-side collate time. Without
this, ``batch_to_device`` runs only after the previous step's metrics were
fetched, serializing host and device work.

``DevicePrefetcher`` wraps any host batch iterable and keeps ``buffer``
batches in flight on the device. Each yielded batch is a *fresh* transfer
(never a reused device buffer), so the donating train steps
(train/steps.py) can safely consume them; the batch is marked as a
``DeviceBatch`` so ``BaseModule.batch_to_device`` skips its defensive
re-copy.
"""

from __future__ import annotations

from collections import deque


class DeviceBatch(dict):
    """A batch already transferred (and mesh-sharded) by DevicePrefetcher.

    ``BaseModule.batch_to_device`` returns these unchanged: every
    DeviceBatch is a fresh transfer consumed exactly once, so the
    donated-buffer aliasing guard (module.py) is unnecessary for them.
    """


class DevicePrefetcher:
    """Iterate ``loader``, keeping ``buffer`` device-resident batches in flight.

    ``transfer`` is typically ``module.batch_to_device`` — it handles both
    the single-device and the mesh-sharded path. JAX transfers are async,
    so ``transfer`` returns immediately and the copy overlaps the step that
    is currently executing on the device.
    """

    def __init__(self, loader, transfer, buffer: int = 1):
        if buffer < 1:
            raise ValueError(f"buffer must be >= 1, got {buffer}")
        self.loader = loader
        self.transfer = transfer
        self.buffer = buffer

    def __len__(self) -> int:
        return len(self.loader)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __iter__(self):
        pending: deque = deque()
        for batch in self.loader:
            pending.append(DeviceBatch(self.transfer(batch)))
            if len(pending) > self.buffer:
                yield pending.popleft()
        while pending:
            yield pending.popleft()
