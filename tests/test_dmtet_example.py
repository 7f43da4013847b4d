"""DMTet example: tet grid generation + end-to-end SDF fitting.

Reference: ``examples/tutorial/dmtet_tutorial.ipynb`` / ``dmtet_network.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.ops.conversions.tetmesh import (marching_tetrahedra_fixed,
                                                tet_grid)
from examples import dmtet_train


def test_tet_grid_structure():
    verts, tets = tet_grid(4)
    assert verts.shape == (125, 3) and tets.shape == (6 * 64, 4)
    assert verts.min() == -0.5 and verts.max() == 0.5
    assert tets.min() == 0 and tets.max() == 124
    # every tet has positive volume (consistent orientation not
    # required, but non-degeneracy is)
    v = verts[tets]
    vol = np.linalg.det(v[:, 1:] - v[:, :1]) / 6.
    assert (np.abs(vol) > 1e-9).all()
    # the 6 tets tile each cell exactly (total volume = unit cube)
    np.testing.assert_allclose(np.abs(vol).sum(), 1.0, rtol=1e-5)


def test_decoder_and_sphere_pretrain():
    key = jax.random.PRNGKey(0)
    params = dmtet_train.init_decoder(key, multires=2)
    out = dmtet_train.decoder_apply(params, jnp.zeros((7, 3)), 2)
    assert out.shape == (7, 4)
    params, loss = dmtet_train.pre_train_sphere(params, key, steps=300)
    assert loss < 5e-3
    # SDF sign: negative inside radius 0.3, positive outside
    p = jnp.asarray([[0., 0., 0.], [0.45, 0., 0.]])
    sdf = dmtet_train.decoder_apply(params, p, 2)[:, 0]
    assert float(sdf[0]) < 0 < float(sdf[1])


def test_laplace_regularizer_masked():
    verts = jnp.asarray([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                         [3., 3., 3.]])
    faces = jnp.asarray([[0, 1, 2], [0, 1, 3]], jnp.int32)
    full = dmtet_train.laplace_regularizer(
        verts, faces, jnp.asarray([True, True]))
    masked = dmtet_train.laplace_regularizer(
        verts, faces, jnp.asarray([True, False]))
    assert float(masked) != float(full)
    # masked result equals dropping the face entirely
    only = dmtet_train.laplace_regularizer(
        verts, faces[:1], jnp.asarray([True]))
    np.testing.assert_allclose(float(masked), float(only), rtol=1e-6)


def test_train_dmtet_torus_converges():
    rng = np.random.default_rng(0)
    u, v = rng.uniform(0, 2 * np.pi, (2, 4000))
    pts = np.stack([(0.35 + 0.15 * np.cos(v)) * np.cos(u),
                    (0.35 + 0.15 * np.cos(v)) * np.sin(u),
                    0.15 * np.sin(v)], -1)
    # lr below the tutorial's 1e-3: at coarse grids the surface
    # crossings flip wholesale under larger adam steps (at the
    # tutorial's 128^3 grid 1e-3 is fine)
    params, hist = dmtet_train.train_dmtet(
        pts, grid_res=14, iterations=150, num_samples=3000, seed=1,
        lr=3e-4)
    assert np.isfinite(hist).all()
    start = np.mean(hist[:5])
    end = np.mean(hist[-5:])
    assert end < start * 0.1, f'{start} -> {end}'
    # the extracted surface must have active faces
    tv, tets = tet_grid(14)
    out = dmtet_train.decoder_apply(params, jnp.asarray(tv), 2)
    _, _, _, fmask, _ = marching_tetrahedra_fixed(
        jnp.asarray(tv), tets, out[:, 0])
    assert int(fmask.sum()) > 100
