"""Config dataclasses + factory methods (the DI container).

Counterpart of reference src/base/config.py: yaml -> dict -> recursive
``--a.b.c=v`` CLI overrides -> nested dataclasses -> factories constructing
every runtime object (net / datamodule / module / callbacks / logger /
trainer / inference model). Debug-mode rename (limit_batches > 0 ->
experiment "debug"), run-dir layout ``results/<exp>/<run>/<timestamp>``, and
rank-0 logger init are preserved.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from ..loggers.loggers import (
    FileTrackerLogger,
    Loggers,
    MlflowFileLogger,
    TerminalLogger,
)
from ..loggers.pylogger import add_file_handler, log, set_device_tag
from ..utils.files import load_yaml
from ..utils.utils import get_rank, is_main_process, seed_everything
from .cli import update_config
from .structured import structure, unstructure

NOW = time.strftime("%Y-%m-%d_%H-%M-%S")
RESULTS_PATH = Path("results")


def find_last_checkpoint(experiment_dir: Path, run_name: str | None = None):
    """Newest ``last.pt`` under ``experiment_dir[/run_name]/*/checkpoints``
    (the run-dir layout every trainer run writes), or None when the
    experiment has never checkpointed. Both checkpoint backends qualify: the
    flax single file and the orbax directory."""
    root = experiment_dir / run_name if run_name else experiment_dir
    candidates = [p for p in root.glob("**/checkpoints/last.pt") if p.exists()]
    if not candidates:
        return None
    latest = max(candidates, key=lambda p: p.stat().st_mtime)
    log.info(f"auto-resume: found {latest}")
    return str(latest)


@dataclass
class TransformConfig:
    mean: list = field(default_factory=lambda: [0.485, 0.456, 0.406])
    std: list = field(default_factory=lambda: [0.229, 0.224, 0.225])
    out_size: Any = 224


@dataclass
class DatasetConfig:
    root: str = "data"
    split: str = "train"
    out_size: int = 512
    hm_resolutions: list = field(default_factory=lambda: [0.25, 0.5])
    num_kpts: int = 17
    max_num_people: int = 30
    sigma: float = 2.0
    mosaic_probability: float = 0.0


@dataclass
class DataloaderConfig:
    batch_size: int = 32
    pin_memory: bool = True
    num_workers: int = 4
    # uint8 images + fp16 heatmap targets + bool masks on the host; the
    # jitted steps normalize/upcast on device (~2.5x less collate memcpy and
    # host->device transfer per image — docs/performance.md). Requires the
    # default ImageNet mean/std.
    compact_batches: bool = False
    train_ds: DatasetConfig = field(default_factory=DatasetConfig)
    val_ds: DatasetConfig = field(default_factory=DatasetConfig)


@dataclass
class NetConfig:
    params: dict = field(default_factory=dict)


@dataclass
class TrainerConfig:
    accelerator: str = "tpu"
    max_epochs: int = 100
    limit_batches: int = -1
    use_DDP: bool = True  # data-parallel over the device mesh
    sync_batchnorm: bool = False
    use_compile: bool = False  # everything is jit-compiled; kept for config compat
    # "flax" = single-file msgpack; "orbax" = directory-based, per-array
    # parallel IO, multi-host sharded save/restore (train/checkpoint_orbax.py)
    ckpt_backend: str = "flax"
    # when set, capture an XLA profiler trace of a few early training steps
    # into this directory (TensorBoard/Perfetto-viewable; utils/profiling.py)
    profile_dir: str | None = None
    profile_steps: int = 5
    # batches staged onto the device ahead of the running step
    # (train/prefetch.DevicePrefetcher); 0 disables
    device_prefetch: int = 1
    # background-thread checkpoint writes (single-process flax backend only;
    # multi-host and orbax saves stay synchronous)
    async_ckpt: bool = True


@dataclass
class SetupConfig:
    seed: int = 42
    experiment_name: str = "exp"
    architecture: str = ""
    dataset: str = ""
    run_name: str | None = None
    is_train: bool = True
    ckpt_path: str | None = None
    pretrained_ckpt_path: str | None = None
    deterministic: bool = False
    # "file" = FileTrackerLogger; "mlflow" = MlflowFileLogger, which writes
    # the MLflow FileStore layout (browsable by `mlflow ui`) with no server —
    # the reference requires a live mlflow server (src/logger/loggers.py:266)
    tracker: str = "file"
    # persistent XLA compilation cache directory: repeated CLI runs (train
    # restarts, eval sweeps, serving redeploys) reuse compiled executables
    # instead of paying the cold compile again. None = disabled (jax default)
    compilation_cache_dir: str | None = None


@dataclass
class CUDNNConfig:
    """Accepted for config compat with the reference yamls; XLA has no cudnn
    flags (determinism comes from jax config when setup.deterministic)."""

    benchmark: bool = True
    deterministic: bool = False
    enabled: bool = True


@dataclass
class OptimizerConfig:
    name: str = "Adam"
    params: dict = field(default_factory=dict)


@dataclass
class LRSchedulerConfig:
    name: str = "ConstantLR"
    interval: str = "epoch"
    params: dict = field(default_factory=dict)


@dataclass
class ModuleConfig:
    optimizers: dict = field(default_factory=dict)
    lr_schedulers: dict = field(default_factory=dict)
    # >1: split each batch into this many microbatches inside the jitted step,
    # averaging grads (train/steps.py) — reference-scale effective batches in
    # one-microbatch activation memory
    accumulate_grad_batches: int = 1


@dataclass
class InferenceConfig:
    input_size: int = 512
    ckpt_path: str | None = None
    det_thr: float = 0.05
    tag_thr: float = 0.5
    use_flip: bool = False
    # multi-scale TTA, e.g. [0.5, 1, 2] (keypoints only); None = single scale
    scales: list | None = None
    # split the forward over N local devices, GPipe-style (keypoints only;
    # parallel/pipeline.py). 0 = monolithic single-device forward
    pipeline_devices: int = 0
    # ship uint8 pixels to the device and normalize inside the jitted
    # forward: 4x less host->device transfer + no host normalize pass
    # (ops/images.py). Exact at pad_multiple=64; bucket padding uses the
    # nearest-uint8 pad pixel (the pad>64 path is approximate either way)
    compact_inputs: bool = False
    # eval/inference shape-bucket size (keypoints AE models): 64 = exact
    # reference 64-multiple alignment, one jit compile per distinct shape;
    # larger values zero-pad into coarser buckets (decode masks the pad) —
    # far fewer compiles, slightly approximate near image borders. "auto" is
    # an OPT-IN shorthand for 128, the bucket-analysis optimum when compile
    # time dominates a cold varied-shape eval (scripts/bucket_analysis.py,
    # docs/performance.md). Default 64 preserves exact reference numerics
    # and is environment-independent.
    pad_multiple: int | str = 64


@dataclass
class BaseConfig:
    setup: SetupConfig = field(default_factory=SetupConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    cudnn: CUDNNConfig = field(default_factory=CUDNNConfig)
    dataloader: DataloaderConfig = field(default_factory=DataloaderConfig)
    transform: TransformConfig = field(default_factory=TransformConfig)
    module: ModuleConfig = field(default_factory=ModuleConfig)
    net: NetConfig = field(default_factory=NetConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)

    # -- construction ----------------------------------------------------------
    @classmethod
    def from_yaml_to_dict(cls, path: str, argv: list[str] | None = None) -> dict:
        cfg = load_yaml(path)
        allowed = {f for f in cfg.keys()} | {
            "setup", "trainer", "cudnn", "dataloader", "transform", "module",
            "net", "inference",
        }
        return update_config(cfg, argv if argv is not None else sys.argv[1:], allowed)

    @classmethod
    def from_dict(cls, cfg_dict: dict) -> "BaseConfig":
        cfg = structure(cfg_dict, cls)
        cfg.__post_init_config__()
        return cfg

    def __post_init_config__(self) -> None:
        # debug mode: limited batches reroute results (reference config.py:180-185)
        self.is_debug = self.trainer.limit_batches > 0
        if self.is_debug:
            self.setup.experiment_name = "debug"
        # elastic recovery (SURVEY §5.3 — the reference relies on torchrun +
        # manual --setup.ckpt_path): ckpt_path="auto" resolves to the newest
        # last.pt of this experiment (this run_name if set), or a fresh start
        # when none exists — the SAME command line works for the first launch
        # and for every restart after a preemption.
        if self.setup.ckpt_path == "auto":
            self.setup.ckpt_path = find_last_checkpoint(
                RESULTS_PATH / self.setup.experiment_name, self.setup.run_name
            )
        if self.setup.run_name is None:
            if self.setup.ckpt_path:
                self.setup.run_name = Path(self.setup.ckpt_path).parts[-4] \
                    if len(Path(self.setup.ckpt_path).parts) >= 4 else NOW
            else:
                self.setup.run_name = NOW
        self.log_path = (
            RESULTS_PATH / self.setup.experiment_name / self.setup.run_name / NOW
        )
        if self.setup.deterministic:
            import jax

            jax.config.update("jax_default_matmul_precision", "highest")
        if self.setup.compilation_cache_dir:
            import jax

            # cache even fast-to-compile graphs (the default min entry size /
            # min compile time thresholds would skip the small decode kernels)
            jax.config.update(
                "jax_compilation_cache_dir", str(self.setup.compilation_cache_dir)
            )
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    def to_dict(self) -> dict:
        return unstructure(self)

    def resolved_pad_multiple(self) -> int:
        """Resolve ``inference.pad_multiple``. "auto" is a deterministic
        opt-in alias for 128 — the bucket-analysis optimum for cold
        varied-shape evals (scripts/bucket_analysis.py) — so identical
        configs always produce identical numerics regardless of compile-cache
        state (round-4 advisor finding). The default (64) is exact reference
        64-multiple alignment."""
        pm = self.inference.pad_multiple
        if isinstance(pm, str):
            if pm != "auto":
                raise ValueError(
                    f"inference.pad_multiple must be an int or 'auto', got {pm!r}"
                )
            pm = 128
            log.info(
                "inference.pad_multiple=auto -> 128 (coarse zero-pad buckets; "
                "pass --inference.pad_multiple=64 for exact reference "
                "64-alignment)"
            )
        return int(pm)

    # -- runtime helpers --------------------------------------------------------
    def initialize_logging(self) -> None:
        rank = get_rank()
        set_device_tag(log, f"TPU:{rank}")
        if is_main_process():
            self.log_path.mkdir(parents=True, exist_ok=True)
        add_file_handler(log, self.log_path / "logs" / f"device_{rank}.log", f"TPU:{rank}")

    def seed(self) -> None:
        # per-rank seed like the reference (src/base/bin/train.py:44-49)
        seed_everything(self.setup.seed + get_rank())

    def make_mesh(self):
        if not self.trainer.use_DDP:
            return None
        from ..parallel import make_mesh

        return make_mesh()

    def bn_groups(self, mesh=None) -> int:
        """BatchNorm statistics scope for training (see models/norm.py).

        Reference default = per-device stats (src/base/model.py:42-44) ->
        groups = data-mesh size; ``trainer.sync_batchnorm: true`` -> global
        batch moments -> 1 group. On a single device both coincide.
        """
        if self.trainer.sync_batchnorm:
            return 1
        if mesh is not None:
            return int(mesh.devices.size)
        if self.trainer.use_DDP:
            import jax

            return jax.device_count()
        return 1

    # -- factories (overridden per task) ------------------------------------------
    def create_net(self):
        raise NotImplementedError

    def create_datamodule(self):
        raise NotImplementedError

    def create_module(self, mesh=None):
        raise NotImplementedError

    def create_inference_model(self):
        raise NotImplementedError

    def create_callbacks(self) -> list:
        from ..train.callbacks import default_callbacks

        return default_callbacks()

    def create_logger(self) -> Loggers:
        tracker_cls = (
            MlflowFileLogger if self.setup.tracker == "mlflow" else FileTrackerLogger
        )
        return Loggers(
            [TerminalLogger(self.log_path), tracker_cls(
                self.log_path, self.setup.experiment_name, str(self.setup.run_name)
            )],
            self.log_path,
        )

    def create_trainer(self, logger: Loggers | None = None):
        from ..train.trainer import Trainer

        logger = logger if logger is not None else self.create_logger()
        logger.log_config(self.to_dict())
        return Trainer(
            logger=logger,
            callbacks=self.create_callbacks(),
            max_epochs=self.trainer.max_epochs,
            limit_batches=self.trainer.limit_batches,
            log_path=self.log_path,
            ckpt_backend=self.trainer.ckpt_backend,
            profile_dir=self.trainer.profile_dir,
            profile_steps=self.trainer.profile_steps,
            device_prefetch=self.trainer.device_prefetch,
            async_ckpt=self.trainer.async_ckpt,
        )
