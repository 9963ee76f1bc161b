"""End-to-end trainer: tiny classification run with callbacks, checkpointing,
and resume."""

import numpy as np
import pytest

from human_pose_tpu.data.loader import DataLoader
from human_pose_tpu.loggers.loggers import FileTrackerLogger, Loggers, TerminalLogger
from human_pose_tpu.models import ClassificationHRNet
from human_pose_tpu.train import (
    ClassificationModule,
    DataModule,
    MetricsLogger,
    MetricsPlotterCallback,
    MetricsSaverCallback,
    ModelSummary,
    SaveModelCheckpoint,
    Trainer,
)

TINY = dict(num_blocks_per_stage=(1, 1, 1, 1), num_units=1)


class SynthDataset:
    """Deterministic separable toy data: label = brightest quadrant."""

    def __init__(self, n=16, size=32, num_classes=4, seed=0):
        rng = np.random.RandomState(seed)
        self.images = rng.rand(n, size, size, 3).astype(np.float32) * 0.1
        self.labels = rng.randint(0, num_classes, n)
        half = size // 2
        for i, lbl in enumerate(self.labels):
            y0 = 0 if lbl < 2 else half
            x0 = 0 if lbl % 2 == 0 else half
            self.images[i, y0 : y0 + half, x0 : x0 + half] += 1.0

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return self.images[idx], self.labels[idx]


def collate(samples):
    return {
        "images": np.stack([s[0] for s in samples]),
        "labels": np.asarray([s[1] for s in samples], np.int32),
    }


@pytest.fixture()
def run_dir(tmp_path):
    return tmp_path / "run"


def make_parts(run_dir, max_epochs=2):
    ds = SynthDataset()
    train_dl = DataLoader(ds, batch_size=8, collate_fn=collate, num_workers=1, seed=0)
    val_dl = DataLoader(ds, batch_size=8, collate_fn=collate, shuffle=False, num_workers=1)
    dm = DataModule(train_dl, val_dl)
    model = ClassificationHRNet(C=8, num_classes=4, **TINY)
    module = ClassificationModule.create(
        model, input_shape=(32, 32, 3),
        optimizers_cfg={"optim": {"name": "SGD", "params": {"lr": 0.05, "momentum": 0.9}}},
        lr_schedulers_cfg={"optim": {"name": "MultiStepLR", "interval": "epoch",
                                     "params": {"milestones": [50], "gamma": 0.1}}},
    )
    logger = Loggers(
        [TerminalLogger(run_dir), FileTrackerLogger(run_dir)], run_dir
    )
    callbacks = [
        ModelSummary(),
        MetricsPlotterCallback(),
        MetricsSaverCallback(),
        MetricsLogger(),
        SaveModelCheckpoint(monitor="loss", split="val", mode="min"),
    ]
    trainer = Trainer(
        logger, callbacks, max_epochs=max_epochs, log_path=run_dir
    )
    return trainer, module, dm


def test_fit_and_artifacts(run_dir):
    trainer, module, dm = make_parts(run_dir)
    # XLA profiler window (utils/profiling.py): piggyback on this fit run
    from human_pose_tpu.utils.profiling import StepWindowProfiler

    trainer.profiler = StepWindowProfiler(str(run_dir / "trace"), start=1, steps=2)
    trainer.fit(module, dm)
    # profiler captured a TensorBoard-viewable trace of steps [1, 3)
    assert list((run_dir / "trace").rglob("*.xplane.pb")), "no profiler trace"
    # loss decreased across epochs
    epochs = trainer.storage.aggregate_over_key("epoch").metrics["loss"]["train"]
    assert epochs[-1]["value"] < epochs[0]["value"] * 1.2
    # artifacts written
    assert (run_dir / "checkpoints" / "last.pt").exists()
    assert (run_dir / "checkpoints" / "best.pt").exists()
    assert (run_dir / "epoch_metrics.jpg").exists()
    assert (run_dir / "epoch_metrics.html").exists()  # interactive (plotly-equiv)
    assert (run_dir / "epoch_metrics.yaml").exists()
    assert (run_dir / "model" / "model_summary.txt").exists()
    assert (run_dir / "tracker" / "metrics_val.jsonl").exists()


def test_resume_from_checkpoint(run_dir):
    trainer, module, dm = make_parts(run_dir, max_epochs=1)
    trainer.fit(module, dm)
    step_after_1 = trainer.current_step
    params_after_1 = module.state.params

    trainer2, module2, dm2 = make_parts(run_dir, max_epochs=2)
    trainer2.fit(module2, dm2, ckpt_path=run_dir / "checkpoints" / "last.pt")
    assert trainer2.current_epoch == 1  # only epoch 1 ran after resume
    assert trainer2.current_step > step_after_1
    # resumed params differ from the epoch-1 snapshot after further training
    import jax

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        params_after_1,
        module2.state.params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_orbax_checkpoint_roundtrip(run_dir):
    """Orbax backend: save/restore TrainState + host payload + partial load,
    and Trainer.load_checkpoint auto-detects the directory format."""
    import jax
    import jax.numpy as jnp

    from human_pose_tpu.train import checkpoint_orbax as co
    from human_pose_tpu.train.checkpoint import load_params_partial

    trainer, module, dm = make_parts(run_dir, max_epochs=1)
    state = module.state
    state = state.replace(step=state.step + 5)
    path = run_dir / "checkpoints" / "last.pt"
    co.save_checkpoint(
        path, state, epoch=3,
        datamodule_state={"seed": 0}, metrics_state=None,
        callbacks_state=None, logger_state=None,
    )
    assert co.is_orbax_checkpoint(path)

    ckpt = co.load_checkpoint(path)
    assert ckpt["epoch"] == 3 and ckpt["step"] == 5
    assert ckpt["datamodule"] == {"seed": 0}

    # restore into a template with different values
    zeroed = state.replace(
        step=jnp.zeros_like(state.step),
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params),
    )
    restored = co.load_train_state(zeroed, ckpt)
    assert int(restored.step) == 5
    ok = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        restored.params, state.params,
    )
    assert all(jax.tree_util.tree_leaves(ok))

    # name-intersection partial load through the flax front-end dispatcher
    partial = load_params_partial(
        jax.tree_util.tree_map(jnp.zeros_like, state.params), path
    )
    ok = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        partial, jax.device_get(state.params),
    )
    assert all(jax.tree_util.tree_leaves(ok))


def test_limit_batches_debug_mode(run_dir):
    trainer, module, dm = make_parts(run_dir)
    trainer.limit_batches = 1
    trainer.fit(module, dm)
    assert trainer.current_step == 2  # 1 batch x 2 epochs
