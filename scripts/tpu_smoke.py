"""End-to-end TPU smoke: train -> resume-eval the full flagship stack on one
real chip, with the production transfer paths on.

The CPU test suite covers every component in isolation; this script proves
the whole stack COMPOSES on TPU hardware — the full-size HigherHRNet-W32
@512, the real CLIs, the threaded loader with compact uint8/fp16/bool
batches, device prefetch, async checkpointing, and the batched evaluator
with compact uint8 uploads — in one bounded run (~15-25 min through the
axon tunnel; most of it XLA compiles).

    python scripts/tpu_smoke.py [--root=/tmp/tpu_smoke] [--batches=4]

Steps:
1. synthesize a tiny COCO split at production shape (512px) + pre-bake
2. bin.train_keypoints: one epoch, --dataloader.compact_batches=true,
   limit_batches bounds it; asserts FINISHED + checkpoints written
3. bin.eval_keypoints on the produced last.pt with
   --inference.compact_inputs=true --batch_size=8; asserts the COCO AP
   table + detections json were written

Exit code 0 = everything ran on the chip. First validated 2026-08-19
(train FINISHED, eval wrote results; docs/performance.md has the measured
throughput story).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def sh(args: list[str], **kw) -> None:
    print("+", " ".join(args), flush=True)
    subprocess.run(args, check=True, cwd=str(REPO), **kw)


def main() -> None:
    root, batches = Path("/tmp/tpu_smoke"), 4
    for tok in sys.argv[1:]:
        if tok.startswith("--root="):
            root = Path(tok.split("=", 1)[1])
        elif tok.startswith("--batches="):
            batches = int(tok.split("=", 1)[1])
        else:
            raise SystemExit(f"unknown flag: {tok}")

    coco = root / "coco"
    if not (coco / "annotations" / "person_keypoints_train2017").exists():
        sys.path.insert(0, str(REPO / "scripts"))
        sys.path.insert(0, str(REPO))
        from make_synthetic_coco import make_split

        from human_pose_tpu.data import prebake_annotations

        make_split(coco, "train2017", 48, size=512, seed=0)
        make_split(coco, "val2017", 16, size=512, seed=1)
        prebake_annotations(str(coco), "train2017")
        prebake_annotations(str(coco), "val2017")

    cfg = root / "cfg.yaml"
    cfg.write_text(f"""\
setup: {{experiment_name: tpu_smoke, architecture: HigherHRNet, dataset: COCO,
  pretrained_ckpt_path: null, seed: 42,
  compilation_cache_dir: {root}/xla_cache}}
trainer: {{accelerator: tpu, max_epochs: 1, limit_batches: {batches}, use_DDP: false}}
dataloader:
  batch_size: 8
  num_workers: 2
  compact_batches: true
  train_ds: {{root: {coco}, split: train2017, out_size: 512}}
  val_ds: {{root: {coco}, split: val2017, out_size: 512}}
transform: {{out_size: 512}}
net:
  params: {{num_kpts: 17, C: 32}}
inference: {{input_size: 512, compact_inputs: true}}
""")

    sh([sys.executable, "-m", "human_pose_tpu.bin.train_keypoints", f"--config={cfg}"])

    # the debug-mode run dir (limit_batches>0 renames the experiment)
    runs = sorted((REPO / "results" / "debug").glob("*/*/checkpoints/last.pt"))
    assert runs, "training produced no last.pt"
    ckpt = runs[-1]
    print(f"checkpoint: {ckpt}")

    import os

    env = dict(os.environ)
    # run eval with cwd under root so evaluation_results/ lands there, not in
    # the repo; PYTHONPATH appends (never overwrites — CLAUDE.md: the default
    # /root/.axon_site entry registers the TPU backend)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    print("+ eval_keypoints (cwd", root, ")", flush=True)
    subprocess.run(
        [
            sys.executable, "-m", "human_pose_tpu.bin.eval_keypoints",
            f"--config={cfg}", f"--inference.ckpt_path={ckpt}",
            "--batch_size=8", "--limit=8",
        ],
        check=True, cwd=str(root), env=env,
    )
    outs = sorted((root / "evaluation_results").glob("*/coco_output.txt"))
    assert outs, "eval wrote no AP table"
    print(f"AP table: {outs[-1]}")
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
