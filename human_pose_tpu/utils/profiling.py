"""jax.profiler integration — TPU-native tracing (SURVEY.md §5.1).

The reference has no formal tracer (per-frame `elapsed_timer` + thop FLOPs
only, /root/reference/src/utils/utils.py:60-67); the TPU equivalent is an XLA
profiler capture: per-op device timelines, HLO cost attribution, HBM traffic
— viewable in TensorBoard ("Profile" tab) or Perfetto. ``Trainer`` captures
steps [profile_start, profile_start + profile_steps) of the first epoch when
``trainer.profile_dir`` is set; each step is wrapped in a
``StepTraceAnnotation`` so the trace viewer groups work per training step.

Standalone use:

    with step_trace("train", step_num=i):      # annotate (cheap no-op
        state, metrics = train_step(...)        # when no trace is active)

    with trace("/tmp/trace"):                   # capture a window
        ...
"""

from __future__ import annotations

import contextlib

import jax

# re-exports so call sites need no jax.profiler import
trace = jax.profiler.trace
step_trace = jax.profiler.StepTraceAnnotation


class StepWindowProfiler:
    """Capture a ``steps``-long window of training steps into ``trace_dir``,
    beginning ``start`` steps after the first step this run executes (skipping
    the compile-heavy step 0; resume-safe). Driven by ``on_step(global_step)``
    calls; inactive (and free) when ``trace_dir`` is falsy."""

    def __init__(self, trace_dir: str | None, start: int = 2, steps: int = 5):
        self.trace_dir = trace_dir
        self.start = start
        self.steps = steps
        self._exit: contextlib.ExitStack | None = None
        self._first: int | None = None
        self.done = trace_dir is None or not trace_dir

    def on_step(self, global_step: int) -> None:
        if self.done:
            return
        if self._first is None:
            # ``start`` is an offset from the first step THIS RUN executes
            # (resumed runs begin at an arbitrary global step), skipping the
            # compile-heavy first step(s)
            self._first = global_step
            self.start = global_step + self.start
        if self._exit is None and global_step >= self.start:
            self._exit = contextlib.ExitStack()
            self._exit.enter_context(trace(self.trace_dir))
        elif self._exit is not None and global_step >= self.start + self.steps:
            self.stop()

    def closing(self, global_step: int) -> bool:
        """True when the next ``on_step(global_step)`` will close the trace —
        callers with deferred device work (e.g. the trainer's one-step-lagged
        metric fetch) must sync on it first so the profiled steps' device
        timelines are complete when the window ends."""
        return self._exit is not None and global_step >= self.start + self.steps

    @contextlib.contextmanager
    def annotate(self, global_step: int):
        if self.done or not (self.start <= global_step < self.start + self.steps):
            yield
            return
        with step_trace("train", step_num=global_step):
            yield

    def stop(self) -> None:
        if self._exit is not None:
            self._exit.close()
            self._exit = None
        self.done = True
