"""Repro/verification harness for the s2d-under-spatial-sharding GSPMD bug.

Compares the s2d=True HigherHRNet forward on a (data, space) CPU mesh against
the unsharded program (see the RESOLVED GSPMD-bug note in
parallel/spatial.py). Exit code 0 + max|err| ~1e-6 confirms the slice-lowered
pack composes with H sharding; large error would mean the miscompile is back.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from human_pose_tpu.models import HigherHRNet
from human_pose_tpu.parallel import replicate
from human_pose_tpu.parallel.spatial import make_mesh_2d, spatial_sharding

TINY = dict(
    num_kpts=17, C=8, num_blocks_per_stage=(1, 1, 1, 1), num_units=1,
    num_deconv_resid_blocks=1,
)


def main():
    model = HigherHRNet(s2d=True, **TINY)
    rs = np.random.RandomState(0)
    x = rs.rand(8, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), train=False)

    def fwd(v, xx):
        return model.apply(v, xx, train=False)

    ref = [np.asarray(o) for o in jax.tree_util.tree_leaves(jax.jit(fwd)(variables, x))]

    mesh = make_mesh_2d(4, 2)
    xs = jax.device_put(x, spatial_sharding(mesh))
    vs = replicate(mesh, variables)
    out = [np.asarray(o) for o in jax.tree_util.tree_leaves(jax.jit(fwd)(vs, xs))]

    worst = 0.0
    for r, o in zip(ref, out):
        err = float(np.abs(r - o).max())
        print(f"leaf {r.shape}: max|err| = {err:.3e}")
        worst = max(worst, err)
    print("WORST", worst)
    return 0 if worst < 1e-4 else 1


if __name__ == "__main__":
    raise SystemExit(main())
