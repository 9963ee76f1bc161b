"""Config system: yaml -> CLI overrides -> dataclasses -> factories, plus an
end-to-end keypoints training smoke run driven entirely by config on the
synthetic COCO fixture."""

import numpy as np
import pytest
import yaml

from human_pose_tpu.configs import (
    ClassificationConfig,
    KeypointsConfig,
    parse_cli_value,
    update_config,
)
from tests.test_data import make_coco_fixture
from human_pose_tpu.data import prebake_annotations


def test_cli_value_coercion():
    assert parse_cli_value("none") is None
    assert parse_cli_value("True") is True
    assert parse_cli_value("false") is False
    assert parse_cli_value("3") == 3
    assert parse_cli_value("0.5") == 0.5
    assert parse_cli_value("hello") == "hello"
    assert parse_cli_value("[1, 2]") == [1, 2]
    assert parse_cli_value("[0.25, 0.5]") == [0.25, 0.5]


def test_yaml_cli_merge(tmp_path):
    cfg = {
        "setup": {"seed": 42, "experiment_name": "keypoints"},
        "trainer": {"max_epochs": 300, "limit_batches": -1},
        "net": {"params": {"C": 32}},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    merged = KeypointsConfig.from_yaml_to_dict(
        str(p), ["--setup.seed=7", "--trainer.limit_batches=2", "--net.params.C=8"]
    )
    assert merged["setup"]["seed"] == 7
    assert merged["trainer"]["limit_batches"] == 2
    assert merged["net"]["params"]["C"] == 8


def test_debug_mode_renames_experiment():
    cfg = KeypointsConfig.from_dict(
        {"setup": {"experiment_name": "keypoints"}, "trainer": {"limit_batches": 2}}
    )
    assert cfg.is_debug
    assert cfg.setup.experiment_name == "debug"
    assert "debug" in str(cfg.log_path)


def test_auto_resume_checkpoint_resolution(tmp_path, monkeypatch):
    """setup.ckpt_path='auto' resolves to the experiment's newest last.pt
    (same command line first launch and after preemption), or a fresh start
    when none exists (SURVEY §5.3 elastic recovery)."""
    import os
    import time as time_mod

    from human_pose_tpu.configs import base as cfg_base

    monkeypatch.setattr(cfg_base, "RESULTS_PATH", tmp_path)

    # no checkpoints anywhere -> fresh start
    cfg = KeypointsConfig.from_dict(
        {"setup": {"experiment_name": "kp", "ckpt_path": "auto"}}
    )
    assert cfg.setup.ckpt_path is None

    old = tmp_path / "kp" / "run_a" / "2026-01-01_00-00-00" / "checkpoints" / "last.pt"
    new = tmp_path / "kp" / "run_b" / "2026-01-02_00-00-00" / "checkpoints" / "last.pt"
    for p in (old, new):
        p.parent.mkdir(parents=True)
        p.write_bytes(b"ckpt")
    past = time_mod.time() - 3600
    os.utime(old, (past, past))

    cfg = KeypointsConfig.from_dict(
        {"setup": {"experiment_name": "kp", "ckpt_path": "auto"}}
    )
    assert cfg.setup.ckpt_path == str(new)
    # run_name derived from the resolved path -> resumes the same run lineage
    assert cfg.setup.run_name == "run_b"

    # restricting to a run_name picks that run's checkpoint
    cfg = KeypointsConfig.from_dict(
        {"setup": {"experiment_name": "kp", "ckpt_path": "auto", "run_name": "run_a"}}
    )
    assert cfg.setup.ckpt_path == str(old)


def test_reference_yaml_files_parse():
    kp = KeypointsConfig.from_dict(
        KeypointsConfig.from_yaml_to_dict("experiments/keypoints/higher_hrnet_32.yaml", [])
    )
    assert kp.setup.architecture == "HigherHRNet"
    assert kp.module.optimizers["optim"]["name"] == "Adam"
    assert kp.transform.max_rotation == 30
    cl = ClassificationConfig.from_dict(
        ClassificationConfig.from_yaml_to_dict("experiments/classification/hrnet_32.yaml", [])
    )
    assert cl.module.optimizers["optim"]["params"]["nesterov"] is True


@pytest.mark.slow
def test_config_driven_training_smoke(tmp_path, monkeypatch):
    """Full config-driven run: yaml dict -> factories -> trainer.fit on the
    synthetic COCO fixture with a shallow net (cpu dtype)."""
    root = tmp_path / "coco"
    make_coco_fixture(root, n_images=2, size=64)
    prebake_annotations(str(root), "val2017")
    monkeypatch.chdir(tmp_path)

    cfg_dict = {
        "setup": {"seed": 0, "experiment_name": "kp", "architecture": "HigherHRNet"},
        "trainer": {"accelerator": "cpu", "max_epochs": 1, "limit_batches": 1,
                    "use_DDP": False, "profile_steps": 1},
        "dataloader": {
            "batch_size": 2,
            "num_workers": 1,
            "train_ds": {"root": str(root), "split": "val2017", "out_size": 64,
                          "max_num_people": 5},
            "val_ds": {"root": str(root), "split": "val2017", "out_size": 64,
                        "max_num_people": 5},
        },
        "transform": {"out_size": 64},
        "module": {
            "optimizers": {"optim": {"name": "Adam", "params": {"lr": 0.001}}},
            "lr_schedulers": {"optim": {"name": "MultiStepLR", "interval": "epoch",
                                         "params": {"milestones": [200], "gamma": 0.1}}},
            # exercises the yaml -> ModuleConfig -> module wiring of the
            # microbatch-accumulated train step (batch 2 -> 2 microbatches)
            "accumulate_grad_batches": 2,
        },
        "net": {"params": {"num_kpts": 17, "C": 8,
                            "num_blocks_per_stage": [1, 1, 1, 1], "num_units": 1,
                            "num_deconv_resid_blocks": 1}},
    }
    cfg = KeypointsConfig.from_dict(cfg_dict)
    dm = cfg.create_datamodule()
    module = cfg.create_module()
    assert module.accumulate_grad_batches == 2
    trainer = cfg.create_trainer()
    trainer.fit(module, dm)
    assert trainer.current_step == 1
    assert (cfg.log_path / "checkpoints" / "last.pt").exists()

    # setup.ckpt_path="auto" resolves to the checkpoint this run just wrote
    # (RESULTS_PATH is cwd-relative and we're chdir'd into tmp_path)
    cfg2 = KeypointsConfig.from_dict(
        {**cfg_dict, "setup": {**cfg_dict["setup"], "ckpt_path": "auto"}}
    )
    assert cfg2.setup.ckpt_path and cfg2.setup.ckpt_path.endswith("last.pt")


def test_compilation_cache_dir_wiring(tmp_path):
    """setup.compilation_cache_dir enables jax's persistent compile cache:
    a jitted computation leaves an executable entry on disk for the next
    process to reuse (cold-start elimination for CLI restarts)."""
    import jax
    import jax.numpy as jnp

    cache = tmp_path / "xla_cache"
    KeypointsConfig.from_dict(
        {"setup": {"experiment_name": "t", "compilation_cache_dir": str(cache)}}
    )
    assert jax.config.jax_compilation_cache_dir == str(cache)

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    f(jnp.ones((8, 8))).block_until_ready()
    assert cache.exists() and any(cache.iterdir())
    # reset so later tests don't write into the tmp dir
    jax.config.update("jax_compilation_cache_dir", None)


def test_pad_multiple_auto_resolution(tmp_path):
    """Default is exact 64 (reference parity, environment-independent);
    'auto' is a deterministic opt-in alias for 128 regardless of compile
    cache state; explicit ints pass through; junk strings are rejected."""
    cfg = KeypointsConfig.from_dict({"setup": {"experiment_name": "t"}})
    assert cfg.inference.pad_multiple == 64
    assert cfg.resolved_pad_multiple() == 64

    cache = tmp_path / "xla_cache"
    cache.mkdir()
    (cache / "entry").write_bytes(b"x")
    try:
        # "auto" -> 128 deterministically, even with a warm cache configured
        cfg = KeypointsConfig.from_dict(
            {"setup": {"experiment_name": "t",
                       "compilation_cache_dir": str(cache)},
             "inference": {"pad_multiple": "auto"}}
        )
        assert cfg.resolved_pad_multiple() == 128

        cfg = KeypointsConfig.from_dict(
            {"setup": {"experiment_name": "t"},
             "inference": {"pad_multiple": 256}}
        )
        assert cfg.resolved_pad_multiple() == 256

        cfg = KeypointsConfig.from_dict(
            {"setup": {"experiment_name": "t"},
             "inference": {"pad_multiple": "huge"}}
        )
        with pytest.raises(ValueError):
            cfg.resolved_pad_multiple()
    finally:
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
