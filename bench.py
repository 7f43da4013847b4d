"""Headline benchmark: DIB-R 512x512 forward+backward ms/frame per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md config 2 shape): batch=4 spheres (~1280 faces each),
DIB-R rasterization + soft mask at 512x512, L1 image + silhouette IoU loss,
gradients to vertices. Timing runs the full train step chained inside one
jit (lax.scan) so the measurement is device-bound, not dispatch-bound (the
axon tunnel makes per-call host timing meaningless).

``vs_baseline`` is speedup vs the first recorded measurement of this same
workload on one TPU v5e chip (BASELINE.md: the reference publishes no
numbers, so the baseline is established empirically by this harness).
"""

import json
import math
import sys
import time

import numpy as np

# First recorded number (round 1, pure-XLA backends before the Pallas
# kernels landed, measured on one TPU v5e chip with this same harness):
# 69.4 ms/frame. vs_baseline = baseline / current (higher = better).
BASELINE_MS_PER_FRAME = 69.4

BATCH = 4
H = W = 512
ITERS = 20


def _run():
    import jax
    import jax.numpy as jnp
    import kaolin_tpu as kal
    from __graft_entry__ import _scene

    verts, faces, cam_rot, cam_trans, cam_proj = _scene(BATCH, 3,
                                                        jnp.float32)
    target_img = jnp.zeros((BATCH, H, W, 4), jnp.float32)
    target_mask = jnp.zeros((BATCH, H, W), jnp.float32)

    def loss_fn(vertices):
        fvc, fvi, fn = kal.render.mesh.prepare_vertices(
            vertices, faces, cam_proj, camera_rot=cam_rot,
            camera_trans=cam_trans)
        ff = jnp.concatenate([fvc, jnp.ones(fvc.shape[:3] + (1,))], axis=-1)
        feat, soft_mask, _ = kal.render.mesh.dibr_rasterization(
            H, W, fvc[..., 2], fvi, ff, fn[..., 2])
        return (jnp.mean(jnp.abs(feat - target_img))
                + kal.metrics.render.mask_iou(soft_mask, target_mask))

    @jax.jit
    def chained(vertices):
        def body(v, _):
            loss, g = jax.value_and_grad(loss_fn)(v)
            return v - 1e-7 * g, loss
        v, losses = jax.lax.scan(body, vertices, None, length=ITERS)
        return losses[-1], jnp.sum(v)

    # compile + warmup
    jax.block_until_ready(chained(verts))
    t0 = time.perf_counter()
    out = chained(verts)
    _ = float(out[0]) + float(out[1])          # host fetch forces full sync
    dt = time.perf_counter() - t0

    return dt / ITERS / BATCH * 1000.


def main():
    # the shared-TPU tunnel sporadically stalls or throws transient
    # FAILED_PRECONDITION; retry and keep the best of a few attempts
    best = None
    for attempt in range(3):
        try:
            ms = _run()
            best = ms if best is None else min(best, ms)
        except Exception as e:
            print(f"# bench attempt {attempt} failed: {e}", file=sys.stderr)
            time.sleep(20)
            continue
        if attempt >= 1:
            break
    if best is None:
        print(json.dumps({
            "metric": "dibr_512x512_fwd_bwd_ms_per_frame",
            "value": -1.0,
            "unit": "ms/frame",
            "vs_baseline": 0.0,
        }))
        return
    print(json.dumps({
        "metric": "dibr_512x512_fwd_bwd_ms_per_frame",
        "value": round(best, 3),
        "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS_PER_FRAME / best, 3),
    }))


if __name__ == '__main__':
    main()
