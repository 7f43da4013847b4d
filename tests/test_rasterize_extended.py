"""Rasterize + DefTet semantic edges: z-test max rule, valid_faces
culling, multiplier invariance, row-slab partial rendering, DefTet
render_ranges clipping and valid_faces (reference
rasterization_cuda.cu:159-169, deftet.py:338)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.mesh.rasterization import rasterize
from kaolin_tpu.render.mesh.deftet import deftet_sparse_render


def two_overlapping_tris():
    """Two full-viewport triangles at different camera depths."""
    big = np.asarray([[-3., -3.], [3., -3.], [0., 4.]])
    fvi = np.stack([big, big * 0.999])[None]             # (1, 2, 3, 2)
    fvz = np.asarray([[[-2., -2., -2.], [-1., -1., -1.]]])
    feats = np.zeros((1, 2, 3, 1))
    feats[0, 0] = 1.                                     # far tri: white
    feats[0, 1] = 2.                                     # near tri: 2
    return (jnp.asarray(fvi, jnp.float32), jnp.asarray(fvz, jnp.float32),
            jnp.asarray(feats, jnp.float32))


def test_depth_test_keeps_max_z():
    """Camera-space z is negative-forward: the LARGER z (closer) wins
    (rasterization_cuda.cu:159-169 keeps max interpolated z)."""
    fvi, fvz, feats = two_overlapping_tris()
    out, fidx = rasterize(16, 16, fvz, fvi, feats)
    assert (np.asarray(fidx) == 1).all()
    np.testing.assert_allclose(np.asarray(out), 2., rtol=1e-5)


def test_valid_faces_culls():
    fvi, fvz, feats = two_overlapping_tris()
    valid = jnp.asarray([[True, False]])
    out, fidx = rasterize(16, 16, fvz, fvi, feats, valid_faces=valid)
    assert (np.asarray(fidx) == 0).all()
    np.testing.assert_allclose(np.asarray(out), 1., rtol=1e-5)


def test_multiplier_invariance():
    """The multiplier only rescales internal numerics; outputs match
    across values on a generic scene."""
    rng = np.random.default_rng(0)
    F = 12
    fvi = jnp.asarray(rng.uniform(-0.7, 0.7, (1, F, 1, 2))
                      + rng.uniform(-0.3, 0.3, (1, F, 3, 2)), jnp.float32)
    fvz = jnp.asarray(-(rng.uniform(1., 3., (1, F, 1))
                        * np.ones((1, 1, 3))), jnp.float32)
    feats = jnp.asarray(rng.uniform(0, 1, (1, F, 3, 2)), jnp.float32)
    out1, fidx1 = rasterize(24, 24, fvz, fvi, feats, multiplier=1000)
    out2, fidx2 = rasterize(24, 24, fvz, fvi, feats, multiplier=100)
    np.testing.assert_array_equal(np.asarray(fidx1), np.asarray(fidx2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)


def test_row_slab_matches_full_render():
    """row_start/total_height render a horizontal slab identical to the
    corresponding rows of the full image (the shard_map decomposition
    contract)."""
    rng = np.random.default_rng(1)
    F = 10
    fvi = jnp.asarray(rng.uniform(-0.8, 0.8, (1, F, 1, 2))
                      + rng.uniform(-0.4, 0.4, (1, F, 3, 2)), jnp.float32)
    fvz = jnp.asarray(-(rng.uniform(1., 3., (1, F, 1))
                        * np.ones((1, 1, 3))), jnp.float32)
    feats = jnp.asarray(rng.uniform(0, 1, (1, F, 3, 1)), jnp.float32)
    full, fidx = rasterize(32, 32, fvz, fvi, feats)
    for r0 in (0, 8, 24):
        slab, sidx = rasterize(8, 32, fvz, fvi, feats, row_start=r0,
                               total_height=32)
        np.testing.assert_array_equal(np.asarray(sidx),
                                      np.asarray(fidx)[:, r0:r0 + 8])
        np.testing.assert_allclose(np.asarray(slab),
                                   np.asarray(full)[:, r0:r0 + 8],
                                   rtol=1e-5)


def test_deftet_render_ranges_clip():
    """Intersections outside [min_depth, max_depth] are dropped."""
    big = np.asarray([[-3., -3.], [3., -3.], [0., 4.]])
    fvi = jnp.asarray(np.stack([big, big])[None], jnp.float32)
    fvz = jnp.asarray([[[-2.] * 3, [-1.] * 3]], jnp.float32)
    feats = jnp.asarray(np.ones((1, 2, 3, 1)), jnp.float32)
    pix = jnp.zeros((1, 4, 2), jnp.float32)
    rr_all = jnp.asarray(np.tile([[-10., 0.]], (4, 1))[None], jnp.float32)
    rr_near = jnp.asarray(np.tile([[-1.5, 0.]], (4, 1))[None], jnp.float32)
    _, idx_all = deftet_sparse_render(pix, rr_all, fvz, fvi, feats, knum=4)
    _, idx_near = deftet_sparse_render(pix, rr_near, fvz, fvi, feats,
                                       knum=4)
    assert (np.asarray(idx_all)[0, :, :2] >= 0).sum() == 8   # both faces
    near = np.asarray(idx_near)[0]
    assert (near >= 0).sum() == 4                            # only z=-1
    assert set(near[near >= 0].tolist()) == {1}


def test_deftet_valid_faces_and_depth_order():
    rng = np.random.default_rng(3)
    F = 8
    big = np.asarray([[-3., -3.], [3., -3.], [0., 4.]])
    fvi = jnp.asarray(np.tile(big, (1, F, 1, 1)), jnp.float32)
    z = -rng.uniform(1., 5., F)
    fvz = jnp.asarray(np.tile(z[None, :, None], (1, 1, 3)), jnp.float32)
    feats = jnp.asarray(np.ones((1, F, 3, 1)), jnp.float32)
    pix = jnp.zeros((1, 2, 2), jnp.float32)
    rr = jnp.asarray(np.tile([[-10., 0.]], (2, 1))[None], jnp.float32)
    valid = jnp.asarray(np.arange(F) % 2 == 0)[None]
    _, idx = deftet_sparse_render(pix, rr, fvz, fvi, feats, knum=F,
                                  valid_faces=valid)
    got = np.asarray(idx)[0, 0]
    got = got[got >= 0]
    assert set(got.tolist()) == set(range(0, F, 2))
    # sorted near-to-far: z descending (negative-forward)
    np.testing.assert_array_equal(got, np.asarray(sorted(
        range(0, F, 2), key=lambda i: -z[i])))
