"""A/B the fused phase-space kernels vs the XLA decode stages on TPU."""
import json, time
import jax
import jax.numpy as jnp
import numpy as np

B, K, E, P, H4, W4 = 8, 17, 1, 30, 128, 128
H, W = 4*H4, 4*W4
ITERS = 10

def timed(fn, *args):
    @jax.jit
    def many(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    float(many(*args)); t0 = time.perf_counter(); float(many(*args))
    return (time.perf_counter() - t0) / (B * ITERS) * 1e3

def main():
    from human_pose_tpu.ops.heatmaps import average_stages, resize_bilinear
    from human_pose_tpu.ops.grouping import nms
    from human_pose_tpu.ops.pallas_aggregate import fused_aggregate, refine_argmax_phase_batch
    from human_pose_tpu.ops.pallas_decode import refine_argmax_batch

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.rand(B, K, H4, W4).astype(np.float32))
    h2 = jnp.asarray(rs.rand(B, K, 2*H4, 2*W4).astype(np.float32))
    tags_lo = jnp.asarray(rs.rand(B, K, E, H4, W4).astype(np.float32) * 4)
    prev = jnp.asarray(rs.rand(B, P, E).astype(np.float32) * 4)

    def xla_agg(i, q, h2):
        jit = jnp.float32(i) * 1e-6
        avg = resize_bilinear(average_stages([q + jit, h2 + jit], channel_major=True), H, W, channel_major=True)
        sup = jax.vmap(nms)(avg)
        return sup.max(axis=3).sum() + avg.sum() * 0
    print(json.dumps({"stage": "xla_agg+nms+rowmax", "ms_per_img": round(timed(xla_agg, q, h2), 3)}), flush=True)

    def fused(i, q, h2):
        jit = jnp.float32(i) * 1e-6
        avg, sup, cmax = fused_aggregate(q + jit, h2 + jit)
        return cmax.sum() + avg[0,0,0,0,0,0] + sup[0,0,0,0,0,0]
    print(json.dumps({"stage": "fused_aggregate", "ms_per_img": round(timed(fused, q, h2), 3)}), flush=True)

    avg_p, _, _ = fused_aggregate(q, h2)
    tags_dense = jax.image.resize(tags_lo, (B, K, E, H, W), method="linear")
    hm_dense = jnp.transpose(avg_p, (0,1,4,2,5,3)).reshape(B,K,H,W)

    def old_refine(i, hm, tags, prev):
        jit = jnp.float32(i) * 1e-6
        idx, val = refine_argmax_batch(
            (hm + jit).reshape(B, K, H*W),
            jnp.transpose(tags + jit, (0,1,2,3,4)).reshape(B, K, E, H*W), prev)
        return val.sum() + idx.sum() * 0.0
    print(json.dumps({"stage": "refine_dense_kernel", "ms_per_img": round(timed(old_refine, hm_dense, tags_dense, prev), 3)}), flush=True)

    def new_refine(i, avg_p, tags_lo, prev):
        jit = jnp.float32(i) * 1e-6
        idx, val = refine_argmax_phase_batch(avg_p + jit, tags_lo + jit, prev)
        return val.sum() + idx.sum() * 0.0
    print(json.dumps({"stage": "refine_phase_kernel", "ms_per_img": round(timed(new_refine, avg_p, tags_lo, prev), 3)}), flush=True)

if __name__ == "__main__":
    main()
