"""Metrics: sided/chamfer distance, f-score, point_to_mesh_distance,
tetmesh and voxelgrid metrics — checked against brute-force numpy and the
reference's documented examples."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.metrics.pointcloud import (sided_distance, chamfer_distance,
                                           f_score)
from kaolin_tpu.metrics.trianglemesh import (point_to_mesh_distance,
                                             uniform_laplacian_smoothing)
from kaolin_tpu.metrics.tetmesh import tetrahedron_volume, equivolume, amips
from kaolin_tpu.metrics.voxelgrid import iou
from kaolin_tpu.ops.mesh import inverse_vertices_offset


@pytest.fixture
def clouds():
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.normal(size=(2, 57, 3)))
    p2 = jnp.asarray(rng.normal(size=(2, 83, 3)))
    return p1, p2


def test_sided_distance_bruteforce(clouds):
    p1, p2 = clouds
    dist, idx = sided_distance(p1, p2)
    d = np.sum((np.asarray(p1)[:, :, None] - np.asarray(p2)[:, None]) ** 2,
               axis=-1)
    np.testing.assert_allclose(np.asarray(dist), d.min(-1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))


@pytest.mark.parametrize('n1,n2', [(100, 77), (513, 1025), (2048, 300)])
def test_nearest_idx_pallas_matches_xla(n1, n2):
    """Pallas VMEM-tiled NN kernel (interpret mode) selects bit-identical
    indices to the XLA scan (same distance form, same tie rule)."""
    from kaolin_tpu.metrics.pointcloud import _nearest_idx
    from kaolin_tpu.kernels.nn_distance import nearest_idx_pallas
    rng = np.random.default_rng(3)
    p1 = jnp.asarray(rng.random((2, n1, 3)), jnp.float32)
    p2 = jnp.asarray(rng.random((2, n2, 3)), jnp.float32)
    a = np.asarray(_nearest_idx(p1, p2))
    b = np.asarray(nearest_idx_pallas(p1, p2, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_nearest_idx_pallas_duplicate_ties():
    """Duplicated points: ties must keep the lowest index."""
    from kaolin_tpu.metrics.pointcloud import _nearest_idx
    from kaolin_tpu.kernels.nn_distance import nearest_idx_pallas
    rng = np.random.default_rng(4)
    base = rng.random((1, 40, 3)).astype(np.float32)
    p2 = jnp.asarray(np.concatenate([base, base[:, ::-1], base], axis=1))
    p1 = jnp.asarray(base + 1e-3 * rng.standard_normal(base.shape)
                     .astype(np.float32))
    a = np.asarray(_nearest_idx(p1, p2))
    b = np.asarray(nearest_idx_pallas(p1, p2, interpret=True))
    np.testing.assert_array_equal(a, b)


def _grid_mesh():
    g = np.mgrid[0:5, 0:5].reshape(2, -1).T.astype(np.float32)
    verts = np.concatenate([g, np.zeros((25, 1), np.float32)], 1)
    quads = np.array([[i * 5 + j, i * 5 + j + 1, (i + 1) * 5 + j,
                       (i + 1) * 5 + j + 1]
                      for i in range(4) for j in range(4)])
    faces = np.concatenate([quads[:, [0, 1, 2]], quads[:, [1, 3, 2]]])
    return verts, verts[faces]


def test_p2m_pallas_matches_xla_random():
    """Pallas point-to-mesh selection (interpret) vs the XLA scan."""
    from kaolin_tpu.metrics.trianglemesh import _select_faces
    from kaolin_tpu.kernels.p2m_distance import p2m_select_pallas
    rng = np.random.default_rng(5)
    p = jnp.asarray(rng.random((2, 333, 3)), jnp.float32)
    f = jnp.asarray(rng.random((2, 207, 3, 3)), jnp.float32)
    a_i, a_t = _select_faces(p, f)
    b_i, b_t = p2m_select_pallas(p, f, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
    np.testing.assert_array_equal(np.asarray(a_t), np.asarray(b_t))


def test_p2m_pallas_exact_ties_and_overlapping_flags():
    """Points exactly above shared vertices/edges of a grid mesh: the
    summed type codes overlap (e.g. 4 + 6 = 10) and distances tie
    exactly across adjacent faces; the kernel must reproduce the XLA
    path's lowest-index tie rule and summed codes bit-for-bit."""
    from kaolin_tpu.metrics.trianglemesh import _select_faces
    from kaolin_tpu.kernels.p2m_distance import p2m_select_pallas
    rng = np.random.default_rng(6)
    verts, fv_np = _grid_mesh()
    fv = jnp.asarray(fv_np)[None]
    p_mid = verts[:-1] * 0.5 + verts[1:] * 0.5 + [0, 0, 2]
    pts = jnp.asarray(np.concatenate([verts + [0, 0, 1], p_mid])[None])
    a_i, a_t = _select_faces(pts, fv)
    b_i, b_t = p2m_select_pallas(pts, fv, interpret=True)
    assert int(np.asarray(a_t).max()) > 6      # overlap codes exercised
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
    np.testing.assert_array_equal(np.asarray(a_t), np.asarray(b_t))
    # random probes against the same mesh
    p = jnp.asarray(rng.random((1, 400, 3)).astype(np.float32) * 6 - 1)
    a_i, a_t = _select_faces(p, fv)
    b_i, b_t = p2m_select_pallas(p, fv, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
    np.testing.assert_array_equal(np.asarray(a_t), np.asarray(b_t))


def test_sided_distance_reference_example():
    # kaolin/metrics/pointcloud.py:72-84
    p1 = jnp.asarray([[[5.9336, 4.9742, 8.1047]],
                      [[4.1939, 3.3612, 9.5407]]], dtype=jnp.float32)
    p2 = jnp.asarray([[[1.6998, 0.7719, 2.9987],
                       [0.1812, 8.9342, 10.0285]],
                      [[10.0184, 0.3928, 5.2545],
                       [4.2934, 11.2127, 4.5247]]], dtype=jnp.float32)
    dist, idx = sided_distance(p1, p2)
    np.testing.assert_allclose(np.asarray(dist), [[52.4727], [61.1077]],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), [[1], [0]])


def test_chamfer_reference_example():
    # kaolin/metrics/pointcloud.py:113-124
    p1 = jnp.asarray([[[8.8977, 4.1709, 1.2839], [8.5640, 7.7767, 9.4214]],
                      [[0.5431, 6.4495, 11.4914], [3.2126, 8.0865, 3.1018]]],
                     dtype=jnp.float32)
    p2 = jnp.asarray([[[6.9340, 6.1152, 3.4435], [0.1032, 9.8181, 11.3350]],
                      [[11.4006, 2.2154, 7.9589], [4.2586, 1.4133, 7.2606]]],
                     dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(chamfer_distance(p1, p2)),
                               [72.5838, 151.0809], rtol=1e-4)


def test_f_score_reference_example():
    # kaolin/metrics/pointcloud.py:160-175
    p1 = jnp.asarray([[[8.8977, 4.1709, 1.2839], [8.5640, 7.7767, 9.4214]],
                      [[0.5431, 6.4495, 11.4914], [3.2126, 8.0865, 3.1018]]],
                     dtype=jnp.float32)
    p2 = jnp.asarray([[[9.4863, 4.2249, 0.1712], [8.1783, 8.5310, 8.5119]],
                      [[-0.0020699, 6.4429, 12.3], [3.8386, 8.3585, 4.7662]]],
                     dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(f_score(p1, p2, radius=1)),
                               [0., 0.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_score(p1, p2, radius=1.5)),
                               [1., 0.5], atol=1e-5)


def test_chamfer_gradients(clouds):
    p1, p2 = clouds

    def loss(a, b):
        return jnp.sum(chamfer_distance(a, b))

    g1, g2 = jax.grad(loss, argnums=(0, 1))(p1, p2)
    eps = 1e-6
    flat = np.asarray(p1).ravel()
    k = 17
    d = np.zeros_like(flat)
    d[k] = eps
    fp = loss(jnp.asarray((flat + d).reshape(p1.shape)), p2)
    fm = loss(jnp.asarray((flat - d).reshape(p1.shape)), p2)
    np.testing.assert_allclose(float(np.asarray(g1).ravel()[k]),
                               (float(fp) - float(fm)) / (2 * eps), rtol=1e-4)


def test_point_to_mesh_distance_example():
    # kaolin/metrics/trianglemesh.py:53-67
    point = jnp.asarray([[[0.5, 0.5, 0.5], [3., 4., 5.]]])
    face_vertices = jnp.asarray([[[[0., 0., 0.], [0., 1., 0.],
                                   [0., 0., 1.]]]])
    dist, idx, dist_type = point_to_mesh_distance(point, face_vertices)
    np.testing.assert_allclose(np.asarray(dist), [[0.25, 41.]], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 0]])
    np.testing.assert_array_equal(np.asarray(dist_type), [[5, 5]])


def test_point_to_mesh_distance_vs_naive_torch():
    torch = pytest.importorskip('torch')
    import importlib.util
    # brute force reference: closest point on each triangle via sampling
    rng = np.random.default_rng(5)
    points = rng.normal(size=(1, 40, 3))
    fv = rng.normal(size=(1, 25, 3, 3))
    dist, idx, types = point_to_mesh_distance(jnp.asarray(points),
                                              jnp.asarray(fv))
    # dense barycentric sampling of each face as ground truth distance
    s = np.linspace(0, 1, 60)
    u, v = np.meshgrid(s, s)
    keep = (u + v) <= 1.
    u, v = u[keep], v[keep]
    w = 1. - u - v
    samples = (fv[0, :, None, 0] * w[None, :, None]
               + fv[0, :, None, 1] * u[None, :, None]
               + fv[0, :, None, 2] * v[None, :, None])   # (F, S, 3)
    d = np.min(np.sum((points[0][:, None, None] - samples[None]) ** 2,
                      axis=-1), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(dist)[0], d, atol=5e-3)


def test_point_to_mesh_gradients_finite():
    rng = np.random.default_rng(2)
    points = jnp.asarray(rng.normal(size=(1, 10, 3)))
    fv = jnp.asarray(rng.normal(size=(1, 6, 3, 3)))

    def loss(p, f):
        return jnp.sum(point_to_mesh_distance(p, f)[0])

    gp, gf = jax.grad(loss, argnums=(0, 1))(points, fv)
    eps = 1e-6
    flat = np.asarray(points).ravel()
    for k in [0, 7, 29]:
        d = np.zeros_like(flat)
        d[k] = eps
        fp = loss(jnp.asarray((flat + d).reshape(points.shape)), fv)
        fm = loss(jnp.asarray((flat - d).reshape(points.shape)), fv)
        np.testing.assert_allclose(float(np.asarray(gp).ravel()[k]),
                                   (float(fp) - float(fm)) / (2 * eps),
                                   rtol=1e-4, atol=1e-7)


def test_tetrahedron_volume_example():
    tet = jnp.asarray([[[[0.5000, 0.5000, 0.4500],
                         [0.4500, 0.5000, 0.5000],
                         [0.4750, 0.4500, 0.4500],
                         [0.5000, 0.5000, 0.5000]]]])
    np.testing.assert_allclose(np.asarray(tetrahedron_volume(tet)),
                               [[-2.0833e-05]], rtol=1e-3)


def test_equivolume_example():
    tet = jnp.asarray([[[[0.5000, 0.5000, 0.7500],
                         [0.4500, 0.8000, 0.6000],
                         [0.4750, 0.4500, 0.2500],
                         [0.5000, 0.3000, 0.3000]],
                        [[0.4750, 0.4500, 0.2500],
                         [0.5000, 0.9000, 0.3000],
                         [0.4500, 0.4000, 0.9000],
                         [0.4500, 0.4500, 0.7000]]],
                       [[[0.7000, 0.3000, 0.4500],
                         [0.4800, 0.2000, 0.3000],
                         [0.9000, 0.4500, 0.4500],
                         [0.2000, 0.5000, 0.1000]],
                        [[0.3750, 0.4500, 0.2500],
                         [0.9000, 0.8000, 0.7000],
                         [0.6000, 0.9000, 0.3000],
                         [0.5500, 0.3500, 0.9000]]]])
    np.testing.assert_allclose(np.asarray(equivolume(tet, pow=4)),
                               [[2.2961e-10], [7.7704e-10]], rtol=1e-3)


def test_inverse_vertices_offset_example():
    tet = jnp.asarray([[[[-0.0500, 0.0000, 0.0500],
                         [-0.0250, -0.0500, 0.0000],
                         [0.0000, 0.0000, 0.0500],
                         [0.5000, 0.5000, 0.4500]]]])
    out = inverse_vertices_offset(tet)
    np.testing.assert_allclose(
        np.asarray(out),
        [[[[0.0000, 20.0000, 0.0000],
           [79.9999, -149.9999, 10.0000],
           [-99.9999, 159.9998, -10.0000]]]], rtol=1e-3, atol=1e-3)


def test_voxelgrid_iou_example():
    pred = jnp.asarray([[[[0., 0.], [1., 1.]], [[1., 1.], [1., 1.]]]])
    gt = jnp.ones((1, 2, 2, 2))
    np.testing.assert_allclose(np.asarray(iou(pred, gt)), [0.75])


def test_uniform_laplacian_smoothing_example():
    vertices = jnp.asarray([[[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]]])
    faces = jnp.asarray([[0, 1, 2]])
    out = uniform_laplacian_smoothing(vertices, faces)
    np.testing.assert_allclose(
        np.asarray(out),
        [[[0., 0.5, 0.5], [0.5, 0., 0.5], [0.5, 0.5, 0.]]], atol=1e-6)


def test_nearest_idx_pruned_exact():
    """Morton-banded pruned NN selection is bit-identical to the XLA
    scan (same distance form, lowest-original-index ties), including
    duplicated points and uneven tile/chunk padding."""
    from kaolin_tpu.kernels.nn_distance import nearest_idx_pruned
    from kaolin_tpu.metrics.pointcloud import _nearest_idx
    rng = np.random.default_rng(7)
    p1 = jnp.asarray(rng.random((2, 1700, 3)), jnp.float32)
    p2 = jnp.asarray(rng.random((2, 2600, 3)), jnp.float32)
    a = np.asarray(nearest_idx_pruned(p1, p2, interpret=True))
    b = np.asarray(_nearest_idx(p1, p2))
    assert np.array_equal(a, b)
    # duplicated reference points force distance ties
    p2d = jnp.concatenate([p2[:, :400], p2[:, :400]], axis=1)
    a = np.asarray(nearest_idx_pruned(p1, p2d, interpret=True))
    b = np.asarray(_nearest_idx(p1, p2d))
    assert np.array_equal(a, b)
