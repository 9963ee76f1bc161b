"""Shared train entry (counterpart of reference src/base/bin/train.py).

torchrun/DDP setup maps to jax.distributed + a device mesh; per-rank seeding,
config build, datamodule/module/trainer construction, and failure-path logger
finalization are preserved.
"""

from __future__ import annotations

from ..loggers.pylogger import log
from ..parallel.distributed import finalize_distributed, setup_distributed


def train(cfg_dict: dict, ConfigClass) -> None:
    # ``trainer.accelerator: cpu`` must pin the JAX platform BEFORE any
    # backend initialization (on hosts with an accelerator plugin, the env var
    # JAX_PLATFORMS can be overridden by the plugin; jax.config is not) —
    # lets users run data-pipeline/config debugging on the host CPU.
    if cfg_dict.get("trainer", {}).get("accelerator") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    setup_distributed()
    cfg = ConfigClass.from_dict(cfg_dict)
    cfg.initialize_logging()
    cfg.seed()
    mesh = cfg.make_mesh()
    log.info(
        f"starting {cfg.setup.experiment_name}/{cfg.setup.run_name} "
        f"(arch={cfg.setup.architecture}, mesh={mesh.shape if mesh else None})"
    )
    datamodule = cfg.create_datamodule()
    module = cfg.create_module(mesh=mesh)  # create() places state on the mesh
    trainer = cfg.create_trainer()
    try:
        trainer.fit(
            module,
            datamodule,
            pretrained_ckpt_path=cfg.setup.pretrained_ckpt_path,
            ckpt_path=cfg.setup.ckpt_path,
        )
    except KeyboardInterrupt:
        pass  # trainer already finalized KILLED
    finally:
        finalize_distributed()
