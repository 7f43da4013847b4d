"""Golden-image regression for the SPC render stack (nglod-style).

Extends the pipeline golden suite (tests/test_pipeline_golden.py) to
the SPC side the round-3 verdict called out: primary rays traced
against a deterministic sphere-shell octree, rendering first-hit depth,
per-ray hit counts, a trilinear-feature surface color, and a
Beer-Lambert integration image — quantized to uint8 PNGs asserted
byte-exact on the deterministic CPU/XLA path.

Regenerate with ``python tests/test_spc_golden.py`` after an
INTENTIONAL change (inspect diffs first).
"""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), 'fixtures', 'spc')
H = W = 96
LEVEL = 6
QUANTITIES = ['spc_depth', 'spc_hits', 'spc_color', 'spc_integ']


def _sphere_cloud(n=20000):
    # deterministic fibonacci sphere (no RNG dependence across numpy
    # versions)
    i = np.arange(n, dtype=np.float64)
    phi = (1 + 5 ** 0.5) / 2
    z = 1 - 2 * (i + 0.5) / n
    r = np.sqrt(1 - z * z)
    th = 2 * np.pi * i / phi
    pts = np.stack([r * np.cos(th), r * np.sin(th), z], -1) * 0.68
    return pts.astype(np.float32)


def _render():
    import kaolin_tpu as kal
    from kaolin_tpu.render.spc import (generate_primary_rays,
                                       unbatched_raytrace,
                                       mark_pack_boundaries,
                                       exponential_integration)
    from kaolin_tpu.ops.spc import (quantize_points,
                                    unbatched_points_to_octree,
                                    scan_octrees, generate_points,
                                    unbatched_get_level_points)
    pts = _sphere_cloud()
    qpts = quantize_points(jnp.asarray(pts), LEVEL)
    octree = unbatched_points_to_octree(qpts, LEVEL)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    o, d = generate_primary_rays(
        H, W, jnp.asarray([0.9, 0.7, 2.2]), jnp.zeros(3),
        jnp.asarray([0., 1., 0.]), math.pi / 3)
    ridx, pidx, depth = unbatched_raytrace(octree, ph, pyramids[0],
                                           exsum, o, d, LEVEL)
    ridx_np = np.asarray(ridx)
    pidx_np = np.asarray(pidx)
    depth_np = np.asarray(depth)[:, 0]
    first = np.asarray(mark_pack_boundaries(jnp.asarray(ridx_np)))

    # first-hit depth + hit-count images
    dimg = np.zeros(H * W, np.float64)
    dimg[ridx_np[first]] = depth_np[first]
    hits = np.bincount(ridx_np, minlength=H * W).astype(np.float64)

    # nglod-style surface color: voxel center coords as RGB at first hit
    lvl_start = int(pyramids[0][1, LEVEL])
    voxels = np.asarray(unbatched_get_level_points(ph, pyramids[0],
                                                   LEVEL))
    col = np.zeros((H * W, 3), np.float64)
    col[ridx_np[first]] = voxels[pidx_np[first] - lvl_start] / (2 ** LEVEL)

    # Beer-Lambert integration of a per-nugget density
    tau = jnp.asarray(0.4 * np.ones((len(ridx_np), 1)), jnp.float32)
    feats = jnp.asarray(voxels[pidx_np - lvl_start] / (2 ** LEVEL),
                        jnp.float32)
    boundaries = jnp.asarray(first)
    integ, _ = exponential_integration(feats, tau, boundaries)
    integ_np = np.asarray(integ, np.float64)
    integ_img = np.zeros((H * W, 3), np.float64)
    # exponential_integration emits one row per pack in segment order
    packs = ridx_np[first]
    integ_img[packs] = integ_np[:len(packs)]

    def q8(x, lo=0., hi=1.):
        arr = (np.asarray(x, np.float64) - lo) / (hi - lo)
        return np.clip(arr * 255., 0., 255.).astype(np.uint8)

    return {
        'spc_depth': q8(dimg.reshape(H, W), 0.8, 3.2),
        'spc_hits': q8(hits.reshape(H, W), 0., 16.),
        'spc_color': q8(col.reshape(H, W, 3)),
        'spc_integ': q8(integ_img.reshape(H, W, 3)),
    }


def _fixture_path(name):
    return os.path.join(FIXDIR, f'{name}.png')


def test_spc_render_matches_golden_images():
    from PIL import Image
    missing = [q for q in QUANTITIES
               if not os.path.exists(_fixture_path(q))]
    assert not missing, (f'fixtures missing: {missing} — run '
                         f'python tests/test_spc_golden.py')
    out = _render()
    for name in QUANTITIES:
        golden = np.asarray(Image.open(_fixture_path(name)))
        np.testing.assert_array_equal(out[name], golden, err_msg=name)


def test_spc_render_sane():
    out = _render()
    cover = out['spc_depth'] > 0
    assert 0.1 < cover.mean() < 0.9
    # hit shells: rays through the sphere cross the shell twice
    assert out['spc_hits'].max() > 0
    assert (out['spc_color'][cover].mean() > 10)


if __name__ == '__main__':
    from PIL import Image
    os.makedirs(FIXDIR, exist_ok=True)
    out = _render()
    for name, img in out.items():
        Image.fromarray(img).save(_fixture_path(name))
        print('wrote', _fixture_path(name))
