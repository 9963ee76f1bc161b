"""TRUE multi-process distributed training (2 OS processes, gloo-backed CPU
collectives via jax.distributed) through the real Trainer stack.

Everything else in the suite runs single-process on a virtual 8-device mesh;
this is the one place the actual multi-host code paths execute: process-group
init, per-process loader shards assembled into global batches, replicated
state, rank-0 gating, the collective orbax checkpoint save, barriers, and
resume. Counterpart of the reference's torchrun DDP launch
(src/base/bin/train.py:16-27), which the reference never tests either.

Equivalence pin: a 2-process x 2-device run must compute the same global
math as a 1-process x 4-device run of the same config. The loader's
block-per-batch sharding makes the assembled global batches IDENTICAL
(samples and order; pinned by
test_data.test_loader_global_batch_stream_is_topology_invariant), so the
only fp difference left is collective reduction order (gloo cross-process
vs in-process all-reduce) — ~1e-7 per step. The pin is therefore on the
quantities that stay inside that fp corridor: the first-epoch loss
(measured divergence 3e-5 after 2 SGD steps) and the final parameter
checksum (7e-6 after 4). Per-step losses further out are NOT comparable at
tight tolerance: the toy net saturates its softmax on 16 samples, so ~1e-6
parameter perturbations move individual losses by percents (measured; with
momentum at lr=.05 the amplification reaches 8e-2 by step 4).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env() -> dict:
    env = dict(os.environ)
    # keep the axon site dir (CLAUDE.md: never overwrite PYTHONPATH)
    parts = [str(REPO)] + [p for p in env.get("PYTHONPATH", "").split(":") if p]
    env["PYTHONPATH"] = ":".join(dict.fromkeys(parts))
    return env


def _launch_once(nprocs: int, port: int, out: Path, local_devices: int,
                 max_epochs: int, resume: bool, extra_env: dict | None = None) -> list:
    procs = []
    for pid in range(nprocs):
        args = [sys.executable, str(WORKER), str(pid), str(nprocs), str(port),
                str(out), str(local_devices), str(max_epochs)]
        if resume:
            args.append("resume")
        procs.append(subprocess.Popen(
            args, env={**_env(), **(extra_env or {})}, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append((p.returncode, stdout))
    return outputs


def _launch(nprocs: int, port: int, out: Path, local_devices: int,
            max_epochs: int, resume: bool = False,
            extra_env: dict | None = None) -> None:
    outputs = _launch_once(nprocs, port, out, local_devices, max_epochs,
                           resume, extra_env)
    # the gloo context handshake has a hardcoded 30 s key-exchange deadline;
    # under heavy host contention (xdist workers compiling concurrently on
    # this 1-core box) one process can miss it — an environment flake, not a
    # code failure. Retry once on a fresh port.
    if any(rc != 0 for rc, _ in outputs) and any(
        "Gloo context initialization failed" in s for _, s in outputs
    ):
        outputs = _launch_once(nprocs, _free_port(), out, local_devices,
                               max_epochs, resume, extra_env)
    for rc, stdout in outputs:
        assert rc == 0, f"worker failed (rc={rc}):\n{stdout[-4000:]}"


def _results(out: Path, nprocs: int) -> list[dict]:
    return [json.loads((out / f"result_{i}.json").read_text()) for i in range(nprocs)]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    # -- 2 processes x 2 local devices ---------------------------------------
    mp_dir = tmp_path / "mp"
    mp_dir.mkdir()
    _launch(2, _free_port(), mp_dir, local_devices=2, max_epochs=2)
    r0, r1 = _results(mp_dir, 2)
    assert r0["process_count"] == 2 and r0["global_devices"] == 4
    assert r0["local_devices"] == 2

    # replicated metrics: every process observed the identical loss stream
    assert r0["train_losses"] == r1["train_losses"]
    assert r0["val_losses"] == r1["val_losses"]
    assert r0["params_fp"] == r1["params_fp"]
    assert len(r0["train_losses"]) == 2  # epochs
    assert r0["steps"] == 4  # 16 samples / global batch 8 x 2 epochs

    # collective checkpoint written exactly once (shared dir, orbax layout)
    ckpt = mp_dir / "run" / "checkpoints" / "last.pt"
    assert ckpt.is_dir(), "orbax checkpoint directory missing"

    # rank-0 gating: only one tracker/metrics tree exists and it is complete
    assert (mp_dir / "run" / "tracker" / "metrics_val.jsonl").exists()

    # -- 1 process x 4 local devices: same config, same global batches -------
    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    _launch(1, _free_port(), sp_dir, local_devices=4, max_epochs=2)
    (rs,) = _results(sp_dir, 1)
    assert rs["global_devices"] == 4

    np.testing.assert_allclose(
        rs["train_losses"][0], r0["train_losses"][0], rtol=1e-4,
        err_msg="first-epoch global loss diverged across process topologies",
    )
    np.testing.assert_allclose(
        rs["params_fp"], r0["params_fp"], rtol=1e-4,
        err_msg="final parameters diverged across process topologies",
    )

    # -- multi-process resume: orbax load + one more epoch -------------------
    _launch(2, _free_port(), mp_dir, local_devices=2, max_epochs=3, resume=True)
    r0b, r1b = _results(mp_dir, 2)
    assert r0b["steps"] == 6  # resumed at step 4, trained epoch 2 (2 steps)
    assert r0b["start_epoch_after_resume"] == 2
    assert r0b["train_losses"] == r1b["train_losses"]
    # training continued from the trained state, not from scratch
    assert r0b["train_losses"][-1] < r0["train_losses"][0]


@pytest.mark.slow
def test_sigkill_preemption_resume(tmp_path):
    """Fault injection (SURVEY §5.3 — the reference has none): SIGKILL the
    training process right after the epoch-1 checkpoint save (uncatchable, no
    teardown — a TPU-VM preemption), then rerun pointing at last.pt. The
    atomic tmp+replace checkpoint write (train/checkpoint.py) and the
    full-state resume must carry the run to FINISHED with correct epoch/step
    accounting."""
    out = tmp_path / "crash"
    out.mkdir()
    env = _env()
    env["HP_CRASH_AT_EPOCH_END"] = "1"
    env["HP_CKPT_BACKEND"] = "flax"  # single-process default backend
    p = subprocess.Popen(
        [sys.executable, str(WORKER), "0", "1", "0", str(out), "2", "3"],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    stdout, _ = p.communicate(timeout=1200)
    assert p.returncode == -9, f"expected SIGKILL death, rc={p.returncode}:\n{stdout[-2000:]}"
    assert not (out / "result_0.json").exists()  # died before finishing
    ckpt = out / "run" / "checkpoints" / "last.pt"
    assert ckpt.exists(), "epoch-1 checkpoint missing after the kill"

    # resume: same config, 3 epochs total -> trains exactly epoch 2
    _launch(1, 0, out, local_devices=2, max_epochs=3, resume=True,
            extra_env={"HP_CKPT_BACKEND": "flax"})
    (r,) = _results(out, 1)
    assert r["start_epoch_after_resume"] == 2
    assert r["steps"] == 6  # 4 steps (epochs 0-1) restored + 2 trained
    assert len(r["train_losses"]) == 3  # storage restored epochs 0-1 + new 2
    assert r["train_losses"][-1] < r["train_losses"][0]
