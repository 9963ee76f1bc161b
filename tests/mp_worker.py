"""Worker for tests/test_multiprocess.py: ONE process of an N-process
jax.distributed training run on the CPU backend (gloo cross-process
collectives), exercising the REAL multi-host code paths end to end:

* jax.distributed.initialize via parallel.distributed.setup_distributed
  (counterpart of reference torchrun + init_process_group,
  src/base/bin/train.py:16-27)
* per-process data sharding in data/loader.py (DistributedSampler equivalent)
* global-batch assembly from process-local shards
  (parallel.mesh.local_batch_to_global via BaseModule.batch_to_device)
* explicitly-global replicated TrainState (parallel.mesh.replicate_global)
* global metric reduction under jit + replicated metric fetch
* rank-0-gated loggers/callbacks with the collective SaveModelCheckpoint
* orbax multi-host checkpoint save (all processes participate) + barrier

Usage: mp_worker.py <proc_id> <nprocs> <port> <out_dir> <local_devices>
                    <max_epochs> [resume]
Writes <out_dir>/result_<proc_id>.json. nprocs=1 runs the same code
single-process (the equivalence baseline for the test).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    out_dir = sys.argv[4]
    local_devices = int(sys.argv[5])
    max_epochs = int(sys.argv[6])
    resume = len(sys.argv) > 7 and sys.argv[7] == "resume"

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin wins over env var
    # NOTE: do NOT enable the persistent compilation cache here — AOT-loaded
    # executables skew the process start-up enough that the 30 s gloo
    # context handshake (GetKeyValue) times out on this 1-core host, and the
    # loader also warns about machine-feature mismatches. Cold compiles keep
    # the two processes naturally in lock-step.

    from human_pose_tpu.parallel.distributed import (
        finalize_distributed,
        setup_distributed,
    )

    if nprocs > 1:
        setup_distributed(f"localhost:{port}", nprocs, proc_id)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs * local_devices

    from pathlib import Path

    from human_pose_tpu.data.loader import DataLoader
    from human_pose_tpu.loggers.loggers import FileTrackerLogger, Loggers, TerminalLogger
    from human_pose_tpu.models import ClassificationHRNet
    from human_pose_tpu.parallel import make_mesh
    from human_pose_tpu.train import (
        ClassificationModule,
        DataModule,
        MetricsLogger,
        SaveModelCheckpoint,
        Trainer,
    )
    from tests.test_trainer import TINY, SynthDataset, collate

    run_dir = Path(out_dir) / "run"
    ds = SynthDataset(n=16)
    # global batch 8 = local batch (8 // nprocs) x nprocs processes; the
    # loader block-shards the SAME (seed, epoch) permutation per process, so
    # the ASSEMBLED global step-k batch is identical (samples AND order) to
    # the single-process step-k batch — making nprocs=1 vs nprocs=2 loss
    # streams comparable up to collective reduction order
    mk_dl = lambda shuffle: DataLoader(
        ds, batch_size=8 // nprocs, collate_fn=collate, shuffle=shuffle,
        num_workers=1, seed=0,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    dm = DataModule(mk_dl(True), mk_dl(False))

    mesh = make_mesh()  # all global devices
    # bn_groups=1 (global-batch BN): loss is then invariant to how samples
    # are laid out across devices, which differs between the two runs.
    # Plain low-lr SGD keeps the run numerically tame: the cross-process
    # collectives (gloo) and the in-process all-reduce sum in different
    # orders, a ~1e-7 step-0 perturbation that momentum at high lr amplifies
    # chaotically on this tiny BN net (measured: 8e-2 by step 4 at
    # lr=.05/m=.9) — which would test the toy's chaos, not the framework
    model = ClassificationHRNet(C=8, num_classes=4, bn_groups=1, **TINY)
    module = ClassificationModule.create(
        model, input_shape=(32, 32, 3),
        optimizers_cfg={"optim": {"name": "SGD", "params": {"lr": 0.01}}},
        lr_schedulers_cfg={"optim": {"name": "MultiStepLR", "interval": "epoch",
                                     "params": {"milestones": [50], "gamma": 0.1}}},
        seed=42, mesh=mesh,
    )
    logger = Loggers([TerminalLogger(run_dir), FileTrackerLogger(run_dir)], run_dir)
    callbacks = [MetricsLogger(), SaveModelCheckpoint(monitor="loss", split="val", mode="min")]

    crash_at = os.environ.get("HP_CRASH_AT_EPOCH_END")
    if crash_at is not None:
        # fault injection (tests/test_multiprocess.py): simulate a preemption
        # by SIGKILLing THIS process right after the epoch-N checkpoint save
        # (appended after SaveModelCheckpoint, so the save has completed).
        # SIGKILL is uncatchable — no finalizers, no orderly teardown, exactly
        # what a TPU-VM preemption looks like.
        import signal

        from human_pose_tpu.train.callbacks import BaseCallback

        class _CrashAtEpochEnd(BaseCallback):
            main_process_only = False

            def __init__(self, epoch: int):
                self.epoch = epoch

            def on_epoch_end(self, trainer) -> None:
                if trainer.current_epoch == self.epoch:
                    os.kill(os.getpid(), signal.SIGKILL)

        callbacks.append(_CrashAtEpochEnd(int(crash_at)))
    trainer = Trainer(
        logger, callbacks, max_epochs=max_epochs, log_path=run_dir,
        # orbax = the collective multi-host backend; HP_CKPT_BACKEND=flax lets
        # the fault-injection test exercise the single-process default path
        # (async writer + atomic tmp+replace)
        ckpt_backend=os.environ.get("HP_CKPT_BACKEND", "orbax"),
    )
    ckpt = run_dir / "checkpoints" / "last.pt" if resume else None
    trainer.fit(module, dm, ckpt_path=ckpt)

    import numpy as np

    params_fp = float(
        sum(float(np.abs(np.asarray(p)).sum())
            for p in jax.tree_util.tree_leaves(module.state.params))
    )
    losses = trainer.storage.aggregate_over_key("epoch").metrics["loss"]
    result = {
        "process_index": int(jax.process_index()),
        "process_count": int(jax.process_count()),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "train_losses": [e["value"] for e in losses["train"]],
        "val_losses": [e["value"] for e in losses.get("val", [])],
        "steps": int(trainer.current_step),
        "start_epoch_after_resume": int(trainer.current_epoch),
        "params_fp": params_fp,
    }
    Path(out_dir, f"result_{proc_id}.json").write_text(json.dumps(result))
    finalize_distributed()


if __name__ == "__main__":
    main()
