"""Mesh ops: check_sign, sampling, subdivision, tetmesh subdivision."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import kaolin_tpu as kal
from kaolin_tpu.ops.mesh import (check_sign, sample_points, face_areas,
                                 face_normals, subdivide_trianglemesh,
                                 subdivide_tetmesh, index_vertices_by_faces,
                                 packed_sample_points, packed_face_areas)


def test_check_sign_reference_example():
    # kaolin/ops/mesh/check_sign.py:89-106 doctest
    verts = jnp.asarray([[[0., 0., 0.], [1., 0.5, 1.], [0.5, 1., 1.],
                          [1., 1., 0.5]]])
    faces = jnp.asarray([[0, 3, 1], [0, 1, 2], [0, 2, 3], [3, 2, 1]])
    axis = np.linspace(0.1, 0.9, 3)
    p_x, p_y, p_z = np.meshgrid(axis + 0.01, axis + 0.02, axis + 0.03,
                                indexing='ij')
    points = jnp.asarray(np.stack([p_x, p_y, p_z], axis=-1).reshape(1, -1, 3))
    out = check_sign(verts, faces, points)
    expected = [True, False, False, False, False, False, False, False,
                False, False, False, False, False, True, False, False,
                False, True, False, False, False, False, False, True,
                False, True, False]
    assert np.asarray(out)[0].tolist() == expected


def test_check_sign_sphere():
    # points inside/outside a unit icosphere
    from __graft_entry__ import _icosphere
    verts_np, faces_np = _icosphere(2)
    verts = jnp.asarray(verts_np[None])
    faces = jnp.asarray(faces_np)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (1, 200, 3))
    out = np.asarray(check_sign(verts, faces, jnp.asarray(pts)))[0]
    r = np.linalg.norm(pts[0], axis=-1)
    # icosphere(2) is close to a unit sphere: stay away from the skin
    interior = r < 0.9
    exterior = r > 1.05
    assert out[interior].all()
    assert not out[exterior].any()


def test_sample_points_distribution():
    verts = jnp.asarray([[[0., 0., 0.], [4., 0., 0.], [0., 4., 0.],
                          [0., 0., 0.1]]])
    faces = jnp.asarray([[0, 1, 2], [0, 1, 3]])
    pts, choices = sample_points(verts, faces, 4096,
                                 key=jax.random.PRNGKey(0))
    areas = np.asarray(face_areas(verts, faces))[0]
    frac = (np.asarray(choices)[0] == 0).mean()
    expect = areas[0] / areas.sum()
    assert abs(frac - expect) < 0.05
    # points on face 0 lie in its plane z=0
    mask0 = np.asarray(choices)[0] == 0
    assert np.abs(np.asarray(pts)[0][mask0][:, 2]).max() < 1e-5


def test_sample_points_with_features():
    verts = jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]]])
    faces = jnp.asarray([[0, 1, 2]])
    fv = index_vertices_by_faces(verts, faces)
    # features = vertex xy -> interpolated features == point xy
    feat = fv[..., :2]
    pts, choices, pfeat = sample_points(verts, faces, 128, face_features=feat,
                                        key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(pts)[..., :2], np.asarray(pfeat),
                               atol=1e-6)


def test_packed_sample_points():
    verts = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)))
    first_idx_vertices = np.array([0, 4, 7])
    faces = jnp.asarray([[0, 1, 2], [0, 1, 2]])
    num_faces_per_mesh = np.array([1, 1])
    pts, choices = packed_sample_points(verts, first_idx_vertices, faces,
                                        num_faces_per_mesh, 64,
                                        key=jax.random.PRNGKey(2))
    assert pts.shape == (2, 64, 3)
    areas = packed_face_areas(verts, first_idx_vertices, faces,
                              num_faces_per_mesh)
    assert areas.shape == (2,)


def test_subdivide_trianglemesh_reference_example():
    # kaolin/ops/mesh/trianglemesh.py:520-545 doctest
    vertices = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                           dtype=jnp.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    alpha = jnp.zeros((1, 4), dtype=jnp.float32)
    nv, nf = subdivide_trianglemesh(vertices, faces, 1, alpha)
    expected_v = [[0.0000, 0.0000, 0.0000], [1.0000, 0.0000, 0.0000],
                  [0.0000, 1.0000, 0.0000], [0.0000, 0.0000, 1.0000],
                  [0.3750, 0.1250, 0.1250], [0.1250, 0.3750, 0.1250],
                  [0.1250, 0.1250, 0.3750], [0.3750, 0.3750, 0.1250],
                  [0.3750, 0.1250, 0.3750], [0.1250, 0.3750, 0.3750]]
    np.testing.assert_allclose(np.asarray(nv)[0], expected_v, atol=1e-6)
    expected_f = [[1, 7, 4], [0, 4, 5], [2, 5, 7], [5, 4, 7],
                  [1, 8, 4], [0, 4, 6], [3, 6, 8], [6, 4, 8],
                  [2, 9, 5], [0, 5, 6], [3, 6, 9], [6, 5, 9],
                  [2, 9, 7], [1, 7, 8], [3, 8, 9], [8, 7, 9]]
    np.testing.assert_array_equal(np.asarray(nf), expected_f)


def test_subdivide_tetmesh_reference_example():
    vertices = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                           dtype=jnp.float32)
    tets = np.array([[0, 1, 2, 3]])
    sdf = jnp.asarray([[[-1.], [-1.], [0.5], [0.5]]])
    nv, nt, nsdf = subdivide_tetmesh(vertices, tets, sdf)
    assert nv.shape == (1, 10, 3)
    expected_tets = [[0, 4, 5, 6], [1, 7, 4, 8], [2, 5, 7, 9],
                     [3, 6, 9, 8], [4, 5, 6, 8], [4, 5, 8, 7],
                     [9, 5, 8, 6], [9, 5, 7, 8]]
    np.testing.assert_array_equal(np.asarray(nt), expected_tets)
    expected_sdf = [-1., -1., 0.5, 0.5, -1., -0.25, -0.25, -0.25, -0.25, 0.5]
    np.testing.assert_allclose(np.asarray(nsdf)[0, :, 0], expected_sdf,
                               atol=1e-6)


def test_face_normals_unit():
    verts = jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]]])
    faces = jnp.asarray([[0, 1, 2]])
    fv = index_vertices_by_faces(verts, faces)
    n = face_normals(fv, unit=True)
    np.testing.assert_allclose(np.asarray(n), [[[0., 0., 1.]]], atol=1e-6)


def test_weighted_face_sampling_never_picks_zero_area():
    """Boundary draws (q == total, observed from u = 1 - 2^-25) must
    clamp to the last POSITIVE-area face, not a masked/padded one."""
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.ops.mesh.trianglemesh import (_picks_from_cdf,
                                                  _weighted_face_choices)
    areas = jnp.asarray([[1., 3., 0., 0.]])
    cdf = jnp.cumsum(areas, -1)
    # searchsorted alone overflows past the end on q == total
    assert int(jnp.searchsorted(cdf[0], cdf[0, -1], side='right')) == 4
    picks = _picks_from_cdf(cdf, jnp.asarray([[0., 0.5, 3.999, 4.0]]))
    np.testing.assert_array_equal(np.asarray(picks), [[0, 0, 1, 1]])
    # random draws stay within the positive-area prefix
    many = _weighted_face_choices(jax.random.PRNGKey(0), areas, 20000)
    assert int(many.max()) <= 1 and int(many.min()) >= 0
