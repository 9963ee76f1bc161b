"""Train-step roofline split (round-5, VERDICT #6).

Decomposes the keypoints training step (HigherHRNet-W32 @512, bf16 compute,
Adam) into fwd+loss / backward / optimizer-update stages by subtractive
timing — each variant runs N iterations inside ONE jitted fori_loop with the
state threading through and the batch synthesized on-device (the bench_train
methodology; the axon tunnel makes per-dispatch timing meaningless).

Variants:
  full    — forward + loss + backward + optimizer update (the real step)
  fwdloss — forward + loss only (value, no grad)
  grads   — forward + loss + backward (grads materialized, no update)
  opt     — optimizer update only, on fixed grads

Splits: bwd = grads - fwdloss, opt_update = full - grads (cross-checked
against the direct `opt` run). Also prints the fwd FLOP estimate from XLA
cost analysis and the implied MXU utilization at the bf16 peak.

Usage: python scripts/prof/prof_train_split.py [--batch=48] [--size=512]
       [--iters=5] [--C=32]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp

V5E_BF16_PEAK_TFLOPS = 197.0


def main() -> None:
    batch, size, iters, width = 48, 512, 5, 32
    for tok in sys.argv[1:]:
        if tok.startswith("--batch="):
            batch = int(tok.split("=")[1])
        if tok.startswith("--size="):
            size = int(tok.split("=")[1])
        if tok.startswith("--iters="):
            iters = int(tok.split("=")[1])
        if tok.startswith("--C="):
            width = int(tok.split("=")[1])

    from human_pose_tpu.models import HigherHRNet
    from human_pose_tpu.train import TrainState, create_optimizer
    from human_pose_tpu.train.steps import (
        _apply_train,
        _keypoints_grads,
        _keypoints_losses,
        _update,
        keypoints_train_step_body,
    )

    model = HigherHRNet(num_kpts=17, C=width, dtype=jnp.bfloat16)
    tx = create_optimizer("Adam", lr=1e-3)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), train=False)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    k, p = 17, 30

    def synth_batch(i):
        f = jnp.float32(i)

        def ramp(shape, scale):
            n = 1
            for d in shape:
                n *= d
            v = jnp.arange(n, dtype=jnp.float32) * (scale / n) + f * 1e-3
            return v.reshape(shape)

        return {
            "images": ramp((batch, size, size, 3), 1.0),
            "heatmaps": [
                ramp((batch, size // 4, size // 4, k), 1.0),
                ramp((batch, size // 2, size // 2, k), 1.0),
            ],
            "masks": [
                jnp.ones((batch, size // 4, size // 4), jnp.float32),
                jnp.ones((batch, size // 2, size // 2), jnp.float32),
            ],
            "joints": jnp.ones((batch, p, k, 3), jnp.int32),
        }

    def timed(fn, init):
        # each fn returns a SCALAR depending on every iteration; the only
        # honest sync through the axon tunnel is a host fetch of that value
        # (block_until_ready can return before execution — CLAUDE.md)
        jfn = jax.jit(fn)
        v = float(jfn(init))
        assert v == v
        t0 = time.perf_counter()
        v = float(jfn(init))
        dt = time.perf_counter() - t0
        return dt / iters

    def tree_scalar(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in
                   jax.tree_util.tree_leaves(t))

    # full step (scalar depends on the FINAL params, so no iteration's
    # update can be dead-code-eliminated)
    def run_full(state):
        def body(i, carry):
            st, _ = carry
            st, m = keypoints_train_step_body(st, synth_batch(i), 1e-3)
            return st, m["loss"]
        st, loss = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0.0)))
        return loss + 1e-30 * tree_scalar(st.params)

    # fwd+loss only (same helpers as the real step; loss threads through so
    # nothing is dead-code-eliminated)
    def run_fwdloss(state):
        def body(i, acc):
            b = synth_batch(i)
            out, _ = _apply_train(state, b["images"])
            total, _ = _keypoints_losses(out, b)
            return acc + total
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # fwd+bwd, no update (grads folded into a scalar so they materialize)
    def run_grads(state):
        def body(i, acc):
            grads, _, metrics = _keypoints_grads(state, synth_batch(i))
            gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in
                       jax.tree_util.tree_leaves(grads))
            return acc + metrics["loss"] + 1e-30 * gsum
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # optimizer update only, fixed unit grads
    unit_grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    def run_opt(state):
        def body(i, st):
            params, opt_state = _update(st, unit_grads, 1e-3)
            return st.replace(params=params, opt_state=opt_state)
        st = jax.lax.fori_loop(0, iters, body, state)
        return tree_scalar(st.params)

    t_full = timed(run_full, state)
    t_fwd = timed(run_fwdloss, state)
    t_grads = timed(run_grads, state)
    t_opt = timed(run_opt, state)

    # fwd FLOPs from XLA cost analysis (single apply, train=False is close
    # enough for the conv/matmul count)
    try:
        a = jax.jit(
            lambda v, x: model.apply(v, x, train=False)
        ).lower(variables, jnp.zeros((batch, size, size, 3), jnp.bfloat16)
                ).compile().cost_analysis()
        flops = float((a[0] if isinstance(a, (list, tuple)) else a)["flops"])
    except Exception:
        flops = float("nan")

    bwd = t_grads - t_fwd
    opt_delta = t_full - t_grads
    util = (flops / 1e12) / (t_fwd * V5E_BF16_PEAK_TFLOPS)
    print(json.dumps({
        "config": {"batch": batch, "size": size, "C": width, "iters": iters},
        "ms_per_step": {
            "full": round(t_full * 1e3, 2),
            "fwd+loss": round(t_fwd * 1e3, 2),
            "fwd+bwd": round(t_grads * 1e3, 2),
            "bwd(=grads-fwd)": round(bwd * 1e3, 2),
            "opt(=full-grads)": round(opt_delta * 1e3, 2),
            "opt(direct)": round(t_opt * 1e3, 2),
        },
        "img_per_s_full": round(batch / t_full, 1),
        "fwd_tflops": round(flops / 1e12, 2) if flops == flops else None,
        "fwd_mxu_utilization": round(util, 3) if util == util else None,
    }))


if __name__ == "__main__":
    main()
