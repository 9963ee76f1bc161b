"""Headline benchmark: HigherHRNet-W32 @512 images/sec/chip INCLUDING decode.

Matches BASELINE.json's metric: single-scale COCO-style inference at 512x512 —
bf16 forward + float32 decode (stage aggregation, NMS, top-k, AE grouping with
Hungarian assignment, adjust, refine) all on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput (BASELINE.md). REF_FPS
below is a fixed bookkeeping constant (estimated torch reference throughput,
single consumer GPU @300W, fwd+CPU Munkres decode) so rounds are comparable;
the 5x north-star target corresponds to vs_baseline >= 5.

Capture robustness (round-4, after BENCH_r03 timed out at rc=124 with no
number): a persistent XLA compilation cache at ./.xla_cache (pre-populated
during the round by `make bench`) turns the multi-minute cold Mosaic/XLA
compile through the axon tunnel into a seconds-long cache load; heartbeat
lines with timestamps make any residual stall diagnosable from the driver's
captured tail; and the TPU-availability retry window is bounded at 300 s so
a tunnel outage fails fast instead of silently eating the driver budget.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

CACHE_DIR = Path(__file__).resolve().parent / ".xla_cache"

REF_FPS = 25.0  # fixed assumption for round-over-round comparability

# bs24 saturates the chip after the round-2 S2D/top-k work: 8/16/24/32 ->
# 225/263/276/276 img/s (serving-throughput metric; per-batch latency is
# batch/throughput)
BATCH = 24
ITERS = 10
SIZE = 512
REPEATS = 3  # best-of; tunnel fetch stalls only ever inflate a timing


def hb(msg: str) -> None:
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache (same knobs as
    human_pose_tpu.configs.base setup.compilation_cache_dir): cache every
    entry regardless of size/compile time so the decode kernels land too."""
    import jax

    CACHE_DIR.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    enable_compile_cache()
    hb(f"compile cache at {CACHE_DIR} "
       f"({len(list(CACHE_DIR.glob('*')))} entries)")

    from human_pose_tpu.models import HigherHRNet
    from human_pose_tpu.ops import decode_batch

    rng = jax.random.PRNGKey(0)
    model = HigherHRNet(num_kpts=17, C=32, dtype=jnp.bfloat16)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), train=False)
    images = jax.random.normal(rng, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

    def infer(variables, images):
        stages_hms, tags = model.apply(variables, images, train=False)
        # Thresholds = the reference's PUBLISHED-EVAL operating point. Its
        # eval CLI builds the inference model through
        # config.create_inference_model (src/keypoints/config.py:135-136),
        # which reads det_thr=0.05 / tag_thr=0.5 from the experiment yaml
        # (experiments/keypoints/higher_hrnet_32.yaml:82-83) with the default
        # max_num_people=30 (model.py:60). NOTE the reference also contains
        # det_thr=0.1 / tag_thr=1.0 / max 20 at module.py:107-108 — that is
        # the TRAIN-TIME validation-plotting default, not the eval path; 0.05
        # admits more candidate rows into the grouping kernel, so the number
        # below is the conservative (slower) of the two operating points.
        # A/B at 0.1/1.0 is recorded in docs/performance.md.
        joints, scores, valid = decode_batch(
            stages_hms, [tags], input_hw=(SIZE, SIZE),
            max_num_people=30, det_thr=0.05, tag_thr=0.5,
        )
        return joints, scores, valid

    # ITERS steps inside one graph: measures steady-state device throughput.
    # (Per-dispatch measurement is meaningless here — the axon tunnel adds
    # ~60-150 ms of host round-trip per call that local serving would not pay;
    # and block_until_ready can return before execution, so the only honest
    # sync is a host fetch of a value that depends on every iteration.)
    @jax.jit
    def many(variables, images):
        def body(i, acc):
            # jitter makes every iteration a distinct computation
            _, scores, _ = infer(variables, images + jnp.bfloat16(i) * jnp.bfloat16(1e-4))
            return acc + scores.sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    hb(f"compiling + warmup (bs={BATCH}, iters={ITERS}, {SIZE}x{SIZE}) ...")
    t0 = time.perf_counter()
    acc = float(many(variables, images))  # compile + warmup
    hb(f"compile+warmup done in {time.perf_counter() - t0:.1f}s")
    assert acc == acc  # no NaN

    # Best of REPEATS timed runs: the axon tunnel's fetch path has bursty
    # multi-second stalls (observed: 193 s for a trivial scalar fetch while
    # compiles stayed healthy). Device throughput is a property of the chip,
    # not the tunnel, so the MINIMUM over repeats is the honest estimate —
    # any tunnel stall only ever inflates a measurement.
    dt = float("inf")
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        acc = float(many(variables, images))
        dt_rep = time.perf_counter() - t0
        hb(f"timed run {rep + 1}/{REPEATS}: {dt_rep:.2f}s")
        dt = min(dt, dt_rep)

    fps = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "images/sec/chip HigherHRNet-W32 @512 incl. decode",
                "value": round(fps, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(fps / REF_FPS, 3),
            }
        )
    )


def wait_for_tpu(max_wait_s: float = 300.0, probe_timeout_s: float = 120.0) -> bool:
    """The axon TPU tunnel has multi-hour outages where backend init either
    hangs or raises UNAVAILABLE (CLAUDE.md). Probe in a SUBPROCESS (a hung
    in-process init can't be retried) and retry within a bounded window so a
    transient blip doesn't fail the benchmark run outright. The window is
    short (300 s): a real outage should fail fast with a diagnosable message
    rather than burn the driver's capture budget (BENCH_r03 lesson)."""
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    while True:
        hb("probing TPU backend ...")
        try:
            rc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.devices()[0].platform == 'tpu'"],
                timeout=probe_timeout_s, capture_output=True,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            hb("TPU backend up")
            return True
        if time.time() > deadline:
            return False
        hb(f"TPU backend unavailable (rc={rc}); retrying "
           f"(window ends in {deadline - time.time():.0f}s)")
        time.sleep(20)


if __name__ == "__main__":
    if os.environ.get("HP_BENCH_SKIP_PROBE") != "1" and not wait_for_tpu():
        raise SystemExit("TPU backend unavailable after bounded retry window")
    main()
