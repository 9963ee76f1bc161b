"""AsyncCheckpointWriter: the background save must capture a consistent
snapshot (immutability of jax arrays), serialize overlapping submits, and
surface background errors on the next wait/submit."""

import jax.numpy as jnp
import optax
import pytest

from human_pose_tpu.train.checkpoint import (
    AsyncCheckpointWriter,
    load_checkpoint,
    load_train_state,
)
from human_pose_tpu.train.state import TrainState


def make_state(value: float) -> TrainState:
    params = {"w": jnp.full((4, 4), value)}
    tx = optax.sgd(0.1)
    return TrainState.create(lambda *a, **k: None, params, {"bn": jnp.zeros(4)}, tx)


def test_async_save_snapshots_state_at_submit_time(tmp_path):
    writer = AsyncCheckpointWriter()
    path = tmp_path / "last.pt"
    state = make_state(1.0)
    host = {"metrics_state": {"loss": [1.0]}}
    writer.submit(path, state, epoch=0, **host)
    # "training continues": rebind to new arrays and mutate the host dict —
    # neither must leak into the in-flight save
    state = make_state(2.0)
    host["metrics_state"]["loss"].append(99.0)
    writer.wait()

    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 0
    assert ckpt["metrics"] == {"loss": [1.0]}
    restored = load_train_state(make_state(0.0), ckpt)
    assert float(restored.params["w"][0, 0]) == 1.0


def test_async_saves_serialize(tmp_path):
    writer = AsyncCheckpointWriter()
    path = tmp_path / "last.pt"
    for epoch in range(3):
        writer.submit(path, make_state(float(epoch)), epoch=epoch)
    writer.wait()
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 2
    restored = load_train_state(make_state(0.0), ckpt)
    assert float(restored.params["w"][0, 0]) == 2.0


def test_async_error_surfaces_on_wait(tmp_path):
    writer = AsyncCheckpointWriter()
    # parent is a FILE, so mkdir(parents=True) in save_checkpoint fails
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    writer.submit(blocker / "sub" / "last.pt", make_state(1.0), epoch=0)
    with pytest.raises(OSError):
        writer.wait()
    # writer is reusable after the error
    ok = tmp_path / "ok.pt"
    writer.submit(ok, make_state(1.0), epoch=0)
    writer.wait()
    assert ok.exists()


def test_async_save_survives_buffer_donation(tmp_path):
    """The jitted train steps donate the TrainState buffers (train/steps.py),
    so the arrays captured at submit time can be invalidated one dispatch
    later. submit() must snapshot device-side before returning; deleting the
    original buffers right after submit simulates donation."""
    import jax

    writer = AsyncCheckpointWriter()
    path = tmp_path / "last.pt"
    state = make_state(3.0)
    writer.submit(path, state, epoch=1)
    for leaf in jax.tree.leaves(
        {"p": state.params, "b": state.batch_stats,
         "o": state.opt_state, "s": state.step}
    ):
        leaf.delete()  # what donation does to the passed-in buffers
    writer.wait()
    restored = load_train_state(make_state(0.0), load_checkpoint(path))
    assert float(restored.params["w"][0, 0]) == 3.0


def test_failed_background_write_marks_run_failed(tmp_path):
    """fit must join the last background checkpoint write BEFORE finalizing
    FINISHED — a failed last.pt write marks the run FAILED (trainer.fit)."""
    import jax.numpy as jnp
    import numpy as np

    from human_pose_tpu.loggers.loggers import Loggers, Status, TerminalLogger
    from human_pose_tpu.train import DataModule, Trainer
    from tests.test_prefetch import FakeModule, ListLoader

    statuses = []
    logger = Loggers([TerminalLogger(tmp_path)], tmp_path)
    orig = logger.finalize
    logger.finalize = lambda s: (statuses.append(s), orig(s))

    trainer = Trainer(logger, callbacks=[], max_epochs=1, log_path=tmp_path)

    class BoomWriter:
        def submit(self, *a, **k):
            pass

        def wait(self):
            raise OSError("disk full")

    trainer._ckpt_writer = BoomWriter()
    batches = [{"images": np.zeros((2, 4, 4, 3), np.float32)}]
    with pytest.raises(OSError):
        trainer.fit(FakeModule(), DataModule(ListLoader(batches), None))
    assert statuses == [Status.FAILED]
