"""Forward-pass stage profiler: cumulative prefixes of HigherHRNet-W32 @512.

stem | +stage0 | +stage1 | +stage2 | +stage3 (backbone) | +init head |
+deconv head (full forward). fori_loop harness (CLAUDE.md timing rules).
"""

import json
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

B, SIZE, ITERS = 8, 512, 10


def timed(fn, *args):
    @jax.jit
    def many(*args):
        def body(i, acc):
            return acc + fn(i, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(many(*args))
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / (B * ITERS) * 1e3


class Probe(nn.Module):
    """HigherHRNet-W32 internals re-assembled stage by stage, stopping after
    `upto` (same modules/names as models/hrnet.py HRNetBackbone + the
    HigherHRNet heads, so timings decompose the real model)."""

    upto: int  # 0 stem, 1..4 stages, 5 init head, 6 full

    @nn.compact
    def __call__(self, x):
        from human_pose_tpu.models.hrnet import ConvBN, HighResolutionStage
        from human_pose_tpu.models.higher_hrnet import DeconvHeatmapsHead

        C = 32
        C2, C4, C8 = 64, 128, 256
        dt = jnp.bfloat16
        x = ConvBN(64, kernel=3, stride=2, relu=True, dtype=dt, name="stem1")(x, False)
        x = ConvBN(64, kernel=3, stride=2, relu=True, dtype=dt, name="stem2")(x, False)
        if self.upto == 0:
            return x
        cfg = [
            (1, 4, "bottleneck", [64], [C, C2]),
            (1, 4, "basic", [C, C2], [C, C2, C4]),
            (4, 4, "basic", [C, C2, C4], [C, C2, C4, C8]),
            (3, 4, "basic", [C, C2, C4, C8], [C, C2, C4, C8]),
        ]
        xs = x
        for s, (nb, nu, bt, in_ch, out_ch) in enumerate(cfg):
            xs = HighResolutionStage(
                nb, nu, bt, in_ch, out_ch,
                is_final_stage=s == len(cfg) - 1,
                is_first_stage=s == 0,
                final_stage_single_scale=True,
                dtype=dt, name=f"stage{s + 1}",
            )(xs, False)
            if self.upto == s + 1:
                out = xs[0] if isinstance(xs, (list, tuple)) else xs
                return out
        feats = xs[0]
        init_hm = nn.Conv(34, (1, 1), dtype=dt, name="init_heatmaps_head")(feats)
        if self.upto == 5:
            return init_hm
        deconv_in = jnp.concatenate([feats, init_hm], axis=-1)
        _, hm = DeconvHeatmapsHead(C, 17, dtype=dt, name="deconv0")(deconv_in, False)
        return hm


def main():
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, SIZE, SIZE, 3), jnp.bfloat16)
    names = ["stem", "+stage0", "+stage1", "+stage2", "+stage3", "+init_head", "+deconv_head"]
    for upto, name in enumerate(names):
        model = Probe(upto=upto)
        variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))

        def fwd(i, variables, images):
            out = model.apply(variables, images + jnp.bfloat16(i) * jnp.bfloat16(1e-4))
            return jnp.float32(out.sum())

        print(
            json.dumps({"stage": name, "cum_ms_per_img": round(timed(fwd, variables, images), 3)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
