"""Host-side training loop.

Counterpart of reference src/base/trainer.py (Trainer.fit / single_epoch /
evaluate / sanity_check / checkpoint orchestration). The device work is all in
the jitted steps; this loop owns epochs, meters, metric storage, callbacks,
checkpointing, limit_batches debug mode, and failure finalization. DDP
barriers/all-reduces are subsumed by SPMD dataflow (SURVEY.md §2.8).
"""

from __future__ import annotations

import random
import traceback
from pathlib import Path

import jax

from tqdm.auto import tqdm

from ..loggers.loggers import Loggers, Status
from ..loggers.pylogger import log
from ..parallel.mesh import barrier
from ..utils.utils import is_main_process
from .callbacks import Callbacks
from .checkpoint import load_checkpoint, load_params_partial, load_train_state, save_checkpoint
from .meters import Meters
from .module import BaseModule, metrics_to_host
from .storage import MetricsStorage


class DataModule:
    """Train/val loaders + resumable host RNG (reference src/base/datamodule.py)."""

    def __init__(self, train_dl=None, val_dl=None, train_ds=None, val_ds=None):
        self.train_dl = train_dl
        self.val_dl = val_dl
        self.train_ds = train_ds if train_ds is not None else getattr(train_dl, "dataset", None)
        self.val_ds = val_ds if val_ds is not None else getattr(val_dl, "dataset", None)

    def state_dict(self) -> dict:
        return self.train_dl.state_dict() if self.train_dl is not None else {}

    def load_state_dict(self, state: dict) -> None:
        if self.train_dl is not None and state:
            self.train_dl.load_state_dict(state)


class Trainer:
    def __init__(
        self,
        logger: Loggers,
        callbacks: list,
        max_epochs: int = 100,
        limit_batches: int = -1,
        log_every_n_steps: int = 50,
        run_sanity_check: bool = False,
        log_path: str | Path = "results/run",
        ckpt_backend: str = "flax",
        profile_dir: str | None = None,
        profile_steps: int = 5,
        device_prefetch: int = 1,
        async_ckpt: bool = True,
    ):
        self.logger = logger
        self.callbacks = Callbacks(callbacks)
        self.max_epochs = max_epochs
        self.limit_batches = limit_batches
        self.log_every_n_steps = log_every_n_steps
        self.run_sanity_check = run_sanity_check
        self.device_prefetch = device_prefetch
        self.async_ckpt = async_ckpt
        from .checkpoint import AsyncCheckpointWriter

        self._ckpt_writer = AsyncCheckpointWriter()
        self.log_path = Path(log_path)
        self.ckpt_backend = ckpt_backend
        # XLA profiler window (utils/profiling.py, SURVEY §5.1): captures a
        # few early steps into profile_dir when set; no-op otherwise
        from ..utils.profiling import StepWindowProfiler

        self.profiler = StepWindowProfiler(profile_dir, steps=profile_steps)
        self.ckpt_dir = self.log_path / "checkpoints"
        self.storage = MetricsStorage()
        self.meters = {"train": Meters(), "val": Meters()}
        self.current_epoch = 0
        self.current_step = 0
        self.epoch_metrics: dict[str, dict] = {}
        self.val_results: list = []
        self.module: BaseModule | None = None
        self.datamodule: DataModule | None = None

    # -- loops ---------------------------------------------------------------
    def _limit(self, loader):
        n = len(loader)
        if self.limit_batches > 0:
            n = min(n, self.limit_batches)
        for i, batch in enumerate(loader):
            if i >= n:
                break
            yield batch

    def single_epoch(self, train_dl) -> dict:
        meters = self.meters["train"]
        meters.reset()
        pbar = tqdm(
            self._limit(train_dl),
            total=min(len(train_dl), self.limit_batches) if self.limit_batches > 0 else len(train_dl),
            desc=f"epoch {self.current_epoch} [train]",
            disable=not is_main_process(),
        )

        # One-step deferred metric fetch: converting step N's metrics to host
        # floats blocks until step N finishes on device. Holding them as
        # device arrays for one iteration lets the host fetch/stage batch N+1
        # and dispatch step N+1 while step N is still executing — the JAX
        # async-dispatch analog of the reference's non_blocking H2D + CUDA
        # stream overlap. Meter/storage/log contents are identical; only the
        # moment of the host sync moves.
        def consume(dev_metrics, step_idx: int) -> None:
            metrics = metrics_to_host(dev_metrics)
            meters.update(metrics)
            self.storage.append(metrics, step_idx, self.current_epoch, "train")
            if (step_idx + 1) % self.log_every_n_steps == 0:
                pbar.set_postfix({k: f"{v:.4g}" for k, v in metrics.items()})
                self.logger.log_metrics(metrics, step_idx + 1, "step")

        # a callback that overrides on_step_end reads meters/storage at step
        # granularity — deferring the fetch would show it stale (step N-1)
        # state, so fall back to the serial per-step fetch in that case
        defer = not self.callbacks.overrides_step_end()
        pending = None
        for batch in pbar:
            if pending is not None and self.profiler.closing(self.current_step):
                # the profiler window ends at this step: block on the pending
                # metrics so every profiled step has finished on device before
                # the trace closes (otherwise the tail steps are truncated)
                consume(*pending)
                pending = None
            self.profiler.on_step(self.current_step)
            with self.profiler.annotate(self.current_step):
                dev_metrics = self.module.training_step(batch)
            if pending is not None:
                consume(*pending)
            pending = (dev_metrics, self.current_step)
            if not defer:
                consume(*pending)
                pending = None
            self.current_step += 1
            self.callbacks.on_step_end(self)
        if pending is not None:
            consume(*pending)
        return meters.to_dict()

    def evaluate(self, val_dl, split: str = "val") -> dict:
        meters = self.meters["val"]
        meters.reset()
        self.val_results = []
        self.callbacks.on_validation_start(self)
        n_batches = min(len(val_dl), self.limit_batches) if self.limit_batches > 0 else len(val_dl)
        # deterministic in epoch: full-run reproducibility incl. plot choice
        plot_batch = random.Random(self.current_epoch).randint(0, max(0, n_batches - 1))
        # same one-step deferred metric fetch as single_epoch: keep the
        # device busy while the host stages the next batch
        pending = None
        for i, batch in enumerate(
            tqdm(self._limit(val_dl), total=n_batches,
                 desc=f"epoch {self.current_epoch} [{split}]",
                 disable=not is_main_process())
        ):
            metrics, outputs = self.module.validation_step(batch)
            if pending is not None:
                meters.update(metrics_to_host(pending))
            pending = metrics
            if (
                i == plot_batch
                and hasattr(self.module, "make_results")
                and jax.process_count() == 1
                # multi-process: `batch` is this process's LOCAL samples but
                # `outputs` are global sharded arrays — indices don't line up
                # and non-addressable shards can't be fetched; plots are
                # cosmetic, skip them (reference plots on rank 0 from rank-0
                # data, callbacks.py:220-245)
            ):
                try:
                    self.val_results = self.module.make_results(batch, outputs)
                except Exception as e:
                    log.warning(f"make_results failed: {e}")
        if pending is not None:
            meters.update(metrics_to_host(pending))
        avg = meters.to_dict()
        self.storage.append(avg, self.current_step, self.current_epoch, split)
        self.callbacks.on_validation_end(self)
        return avg

    def sanity_check(self, val_dl, n_batches: int = 2) -> None:
        log.info("running sanity-check validation")
        for i, batch in enumerate(val_dl):
            if i >= n_batches:
                break
            self.module.validation_step(batch)

    # -- fit -----------------------------------------------------------------
    def fit(
        self,
        module: BaseModule,
        datamodule: DataModule,
        pretrained_ckpt_path: str | None = None,
        ckpt_path: str | None = None,
    ) -> None:
        self.module = module
        self.datamodule = datamodule

        if pretrained_ckpt_path:
            params = load_params_partial(module.state.params, pretrained_ckpt_path)
            module.state = module.state.replace(params=params)
            log.info(f"loaded pretrained weights from {pretrained_ckpt_path}")

        start_epoch = 0
        if ckpt_path:
            start_epoch = self.load_checkpoint(ckpt_path)

        self.callbacks.on_fit_start(self)
        if self.run_sanity_check and datamodule.val_dl is not None:
            self.sanity_check(datamodule.val_dl)

        # stage batches onto the device ahead of the running step (the JAX
        # analog of the reference's non_blocking H2D, keypoints/module.py:36-41)
        train_dl = datamodule.train_dl
        if self.device_prefetch > 0 and train_dl is not None:
            from .prefetch import DevicePrefetcher

            train_dl = DevicePrefetcher(
                train_dl, module.batch_to_device, buffer=self.device_prefetch
            )

        try:
            for epoch in range(start_epoch, self.max_epochs):
                self.current_epoch = epoch
                if hasattr(datamodule.train_dl, "set_epoch"):
                    datamodule.train_dl.set_epoch(epoch)
                self.callbacks.on_epoch_start(self)

                train_metrics = self.single_epoch(train_dl)
                val_metrics = (
                    self.evaluate(datamodule.val_dl, "val")
                    if datamodule.val_dl is not None
                    else {}
                )
                self.epoch_metrics = {"train": train_metrics, "val": val_metrics}
                self.epoch_metrics["lr"] = {"optim": module.lr}

                module.on_epoch_end(val_metrics)
                self.callbacks.on_epoch_end(self)
                log.info(
                    f"epoch {epoch}: "
                    + " ".join(
                        f"{s}/{k}={v:.5g}"
                        for s, m in self.epoch_metrics.items()
                        if isinstance(m, dict)
                        for k, v in m.items()
                    )
                )
            # join the last background checkpoint write BEFORE declaring the
            # run finished — a failed last.pt write must mark the run FAILED,
            # not surface after a FINISHED finalize
            self._ckpt_writer.wait()
            self.logger.finalize(Status.FINISHED)
        except KeyboardInterrupt:
            log.warning("KeyboardInterrupt -> KILLED")
            self.callbacks.on_failure(self, Status.KILLED)
            self.logger.finalize(Status.KILLED)
            raise
        except Exception:
            log.error(f"training failed:\n{traceback.format_exc()}")
            self.callbacks.on_failure(self, Status.FAILED)
            self.logger.finalize(Status.FAILED)
            raise
        finally:
            # close an unfinished profiler window (short runs / failures)
            self.profiler.stop()
            # join any in-flight background checkpoint write so the run dir
            # is complete before fit returns; on failure paths only log the
            # write error — never replace the in-flight exception
            try:
                self._ckpt_writer.wait()
            except Exception:
                log.error(
                    f"background checkpoint write failed:\n{traceback.format_exc()}"
                )

    # -- checkpointing ---------------------------------------------------------
    def _use_async_ckpt(self) -> bool:
        # background writes need no cross-process barrier; multi-host flax
        # saves must stay synchronous (collective barrier on the main thread)
        import jax

        return (
            self.async_ckpt
            and self.ckpt_backend == "flax"
            and jax.process_count() == 1
        )

    def save_checkpoint(self, path: str | Path) -> None:
        host_state = dict(
            datamodule_state={
                **(self.datamodule.state_dict() if self.datamodule else {}),
                "schedulers": self.module.schedulers_state_dict(),
            },
            metrics_state=self.storage.state_dict(),
            callbacks_state=self.callbacks.state_dict(),
            logger_state=self.logger.state_dict(),
        )
        if self._use_async_ckpt():
            # device->host fetch + file write happen on a background thread
            # while the next epoch trains (checkpoint.AsyncCheckpointWriter)
            self._ckpt_writer.submit(
                path, self.module.state, epoch=self.current_epoch, **host_state
            )
            return
        if self.ckpt_backend == "orbax":
            from . import checkpoint_orbax

            save_fn = checkpoint_orbax.save_checkpoint
        else:
            save_fn = save_checkpoint
        # NOTE orbax saves run on ALL processes (each host writes its own
        # array shards); the flax backend gathers to the main process
        if is_main_process() or self.ckpt_backend == "orbax":
            save_fn(path, self.module.state, epoch=self.current_epoch, **host_state)
        # all processes wait for the checkpoint to exist before proceeding
        # (reference dist.barrier() around save, trainer.py:288-291)
        barrier("save_checkpoint")

    def load_checkpoint(self, path: str | Path) -> int:
        self._ckpt_writer.wait()  # never read a file mid-background-write
        from .checkpoint_orbax import is_orbax_checkpoint

        if is_orbax_checkpoint(path):  # auto-detect, independent of backend
            from . import checkpoint_orbax

            ckpt = checkpoint_orbax.load_checkpoint(path)
            self.module.state = checkpoint_orbax.load_train_state(self.module.state, ckpt)
        else:
            ckpt = load_checkpoint(path)
            self.module.state = load_train_state(self.module.state, ckpt)
        dm_state = ckpt.get("datamodule") or {}
        if "schedulers" in dm_state:
            self.module.load_schedulers_state_dict(dm_state.pop("schedulers"))
        if self.datamodule is not None:
            self.datamodule.load_state_dict(dm_state)
        if ckpt.get("metrics"):
            self.storage.load_state_dict(ckpt["metrics"])
        if ckpt.get("callbacks"):
            self.callbacks.load_state_dict(ckpt["callbacks"])
        if ckpt.get("logger"):
            self.logger.load_state_dict(ckpt["logger"])
        self.current_step = int(ckpt.get("step", 0))
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        log.info(f"resumed from {path}: epoch {start_epoch}, step {self.current_step}")
        return start_epoch
