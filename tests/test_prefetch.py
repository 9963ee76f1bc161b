"""DevicePrefetcher + deferred metric fetch: the pipelined host loop must be
observationally identical to the serial one (same batches, same order, same
meters/storage), it only moves the host sync points."""

import jax
import numpy as np
import jax.numpy as jnp

from human_pose_tpu.loggers.loggers import Loggers, TerminalLogger
from human_pose_tpu.train import DataModule, Trainer
from human_pose_tpu.train.prefetch import DeviceBatch, DevicePrefetcher


class ListLoader:
    def __init__(self, batches):
        self.batches = batches
        self.epochs_set = []

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        self.epochs_set.append(epoch)

    def __iter__(self):
        return iter(self.batches)


def _batches(n=5, bs=2):
    rng = np.random.RandomState(0)
    return [
        {"images": rng.rand(bs, 4, 4, 3).astype(np.float32), "labels": np.arange(bs)}
        for _ in range(n)
    ]


def test_prefetcher_yields_all_batches_in_order():
    batches = _batches()
    loader = ListLoader(batches)
    transfers = []

    def transfer(b):
        transfers.append(len(transfers))
        return {k: jnp.asarray(v) for k, v in b.items()}

    for buffer in (1, 2, 10):
        got = list(DevicePrefetcher(ListLoader(batches), transfer, buffer=buffer))
        assert len(got) == len(batches)
        for g, b in zip(got, batches):
            assert isinstance(g, DeviceBatch)
            np.testing.assert_array_equal(np.asarray(g["images"]), b["images"])
            np.testing.assert_array_equal(np.asarray(g["labels"]), b["labels"])

    pf = DevicePrefetcher(loader, transfer, buffer=2)
    assert len(pf) == len(batches)
    pf.set_epoch(3)
    assert loader.epochs_set == [3]


def test_prefetcher_stays_ahead():
    """With buffer=k, batch i+k is transferred before batch i is yielded."""
    batches = _batches(n=4)
    events = []

    def transfer(b):
        events.append("t")
        return b

    pf = DevicePrefetcher(ListLoader(batches), transfer, buffer=2)
    it = iter(pf)
    next(it)  # yielding batch 0 requires transfers of batches 0,1,2
    assert events.count("t") == 3


@jax.jit
def _jitted_whole_batch_step(batch):
    return jnp.sum(batch["images"])


class FakeModule:
    """Returns known device metrics per step; records batch consumption order."""

    def __init__(self):
        self.step_count = 0
        self.schedulers = {}

    def batch_to_device(self, batch):
        # mirrors BaseModule.batch_to_device's contract: prefetched batches
        # come back as a plain-dict view (jit-compatible), host batches are
        # transferred
        if isinstance(batch, DeviceBatch):
            return dict(batch)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def training_step(self, batch):
        assert isinstance(batch, DeviceBatch), "trainer must pass prefetched batches"
        batch = self.batch_to_device(batch)
        # the whole batch dict must be a valid jit argument after
        # batch_to_device (KeypointsModule passes the full dict into the
        # jitted step — a dict-subclass marker leaking through breaks tracing)
        _jitted_whole_batch_step(batch)
        self.step_count += 1
        return {"loss": jnp.asarray(float(self.step_count))}

    def validation_step(self, batch):
        return {"loss": jnp.asarray(0.5)}, None

    @property
    def lr(self):
        return 0.1

    def on_epoch_end(self, val_metrics=None):
        pass

    def schedulers_state_dict(self):
        return {}


def test_trainer_deferred_metrics_match_serial_semantics(tmp_path):
    """Storage rows carry the right (value, step) pairs despite one-step lag,
    and the prefetched loop consumes every batch exactly once."""
    batches = _batches(n=5)
    dm = DataModule(ListLoader(batches), ListLoader(batches[:2]))
    module = FakeModule()
    trainer = Trainer(
        Loggers([TerminalLogger(tmp_path)], tmp_path),
        callbacks=[],
        max_epochs=1,
        log_path=tmp_path,
        log_every_n_steps=2,
        device_prefetch=1,
    )
    trainer.fit(module, dm)

    rows = trainer.storage.metrics["loss"]["train"]
    assert [r["step"] for r in rows] == list(range(5))
    assert [r["value"] for r in rows] == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert module.step_count == 5
    # val meters got every batch despite the deferred fetch
    assert trainer.meters["val"].to_dict() == {"loss": 0.5}
    # train meter average over all 5 steps
    assert trainer.meters["train"].to_dict() == {"loss": 3.0}


def test_prefetcher_mesh_sharded_path():
    """Under a data mesh, the prefetcher stages batches with the module's
    sharding; the second batch_to_device (inside training_step) returns a
    plain jit-compatible dict view that keeps the sharded placement."""
    from jax.sharding import Mesh

    from human_pose_tpu.parallel import make_mesh
    from human_pose_tpu.train.module import BaseModule

    mesh = make_mesh(8)
    assert isinstance(mesh, Mesh) and mesh.devices.size == 8
    module = BaseModule(model=None, state=None, schedulers={}, mesh=mesh)
    batches = [{"images": np.full((8, 4, 4, 3), float(i), np.float32)} for i in range(3)]
    got = list(DevicePrefetcher(ListLoader(batches), module.batch_to_device))
    assert len(got) == 3
    for i, g in enumerate(got):
        assert isinstance(g, DeviceBatch)
        unwrapped = module.batch_to_device(g)
        assert type(unwrapped) is dict
        arr = unwrapped["images"]
        # batch dim sharded over the 8 data devices, buffer not re-copied
        assert len(arr.sharding.device_set) == 8
        assert arr is g["images"]
        assert float(_jitted_whole_batch_step(unwrapped)) == i * 8 * 4 * 4 * 3


def test_trainer_device_prefetch_disabled(tmp_path):
    """device_prefetch=0 passes raw host batches through batch_to_device."""
    batches = _batches(n=3)

    class HostModule(FakeModule):
        def training_step(self, batch):
            assert not isinstance(batch, DeviceBatch)
            self.step_count += 1
            return {"loss": jnp.asarray(1.0)}

    module = HostModule()
    trainer = Trainer(
        Loggers([TerminalLogger(tmp_path)], tmp_path),
        callbacks=[],
        max_epochs=1,
        log_path=tmp_path,
        device_prefetch=0,
    )
    trainer.fit(module, DataModule(ListLoader(batches), None))
    assert module.step_count == 3


def test_step_end_callback_sees_current_step_metrics(tmp_path):
    """A callback overriding on_step_end reads meters/storage at step
    granularity; the trainer must disable the deferred fetch so the hook
    sees the metrics of the step that JUST ran (reference hook contract)."""
    from human_pose_tpu.train.callbacks import BaseCallback, Callbacks

    seen = []

    class StepReader(BaseCallback):
        def on_step_end(self, trainer):
            rows = trainer.storage.metrics.get("loss", {}).get("train", [])
            seen.append((trainer.current_step, len(rows)))

    assert Callbacks([StepReader()]).overrides_step_end()
    assert not Callbacks([BaseCallback()]).overrides_step_end()

    batches = _batches(n=3)
    trainer = Trainer(
        Loggers([TerminalLogger(tmp_path)], tmp_path),
        callbacks=[StepReader()],
        max_epochs=1,
        log_path=tmp_path,
        device_prefetch=1,
    )
    trainer.fit(FakeModule(), DataModule(ListLoader(batches), None))
    # after step N completes (current_step already incremented to N+1), the
    # storage holds all N+1 rows — no one-step lag
    assert seen == [(1, 1), (2, 2), (3, 3)]


def test_profiler_window_flushes_pending_metrics(tmp_path):
    """The deferred metric fetch must be flushed before the profiler window
    closes, so every profiled step has finished on device (utils/profiling
    StepWindowProfiler.closing)."""
    batches = _batches(n=5)
    trainer = Trainer(
        Loggers([TerminalLogger(tmp_path)], tmp_path),
        callbacks=[],
        max_epochs=1,
        log_path=tmp_path,
        device_prefetch=1,
        profile_dir=str(tmp_path / "trace"),
    )
    # window = steps [2, 4): closing(4) is True only while the trace is open
    trainer.profiler.steps = 2
    order = []
    real_closing = type(trainer.profiler).closing

    def spy_closing(self, step):
        r = real_closing(self, step)
        order.append(("closing", step, r))
        return r

    trainer.profiler.closing = spy_closing.__get__(trainer.profiler)
    trainer.fit(FakeModule(), DataModule(ListLoader(batches), None))
    assert ("closing", 4, True) in order
    assert trainer.profiler.done
    # metrics bookkeeping unharmed by the mid-epoch flush
    rows = trainer.storage.metrics["loss"]["train"]
    assert [r["value"] for r in rows] == [1.0, 2.0, 3.0, 4.0, 5.0]
