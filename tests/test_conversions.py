"""Conversions and voxelgrid ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops.conversions import (
    pointclouds_to_voxelgrids, unbatched_pointcloud_to_spc,
    sdf_to_voxelgrids, voxelgrids_to_cubic_meshes,
    voxelgrids_to_trianglemeshes, trianglemeshes_to_voxelgrids)
from kaolin_tpu.ops.voxelgrid import (downsample, extract_surface, fill,
                                      extract_odms, project_odms)
from kaolin_tpu.ops.mesh import check_sign


def test_pointclouds_to_voxelgrids_basic():
    pts = jnp.asarray([[[0., 0., 0.], [1., 1., 1.], [0.5, 0.5, 0.5]]])
    vg = pointclouds_to_voxelgrids(pts, 3)
    expected = np.zeros((3, 3, 3))
    expected[0, 0, 0] = expected[2, 2, 2] = expected[1, 1, 1] = 1
    np.testing.assert_array_equal(np.asarray(vg)[0], expected)


def test_pointcloud_to_spc_roundtrip():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (500, 3)))
    feats = jnp.asarray(rng.normal(size=(500, 4)))
    spc = unbatched_pointcloud_to_spc(pts, 4, feats)
    assert spc.max_level == 4
    n_leaves = int(spc.pyramids[0, 0, 4])
    assert spc.features.shape == (n_leaves, 4)


def test_sdf_to_voxelgrids_reference_example():
    # kaolin/ops/conversions/sdf.py doctest: sphere r=0.5, init_res 4
    def sphere(points):
        return jnp.sum(points ** 2, 1) ** 0.5 - 0.5

    out = np.asarray(sdf_to_voxelgrids([sphere], init_res=4))
    expected = np.zeros((5, 5, 5))
    # from the reference doctest output
    expected[2, 2, 2] = 0  # center of printed grid pattern
    gt = np.array(
        [[[0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 1, 0, 0],
          [0, 0, 0, 0, 0], [0, 0, 0, 0, 0]],
         [[0, 0, 0, 0, 0], [0, 1, 1, 1, 0], [0, 1, 1, 1, 0],
          [0, 1, 1, 1, 0], [0, 0, 0, 0, 0]],
         [[0, 0, 1, 0, 0], [0, 1, 1, 1, 0], [1, 1, 1, 1, 1],
          [0, 1, 1, 1, 0], [0, 0, 1, 0, 0]],
         [[0, 0, 0, 0, 0], [0, 1, 1, 1, 0], [0, 1, 1, 1, 0],
          [0, 1, 1, 1, 0], [0, 0, 0, 0, 0]],
         [[0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 1, 0, 0],
          [0, 0, 0, 0, 0], [0, 0, 0, 0, 0]]], dtype=np.float64)
    np.testing.assert_array_equal(out[0], gt)


def test_sdf_to_voxelgrids_upsampling_matches_dense():
    def sphere(points):
        return jnp.sum(points ** 2, 1) ** 0.5 - 0.4

    coarse_refined = np.asarray(sdf_to_voxelgrids(
        [sphere], init_res=8, upsampling_steps=2))
    dense = np.asarray(sdf_to_voxelgrids([sphere], init_res=32))
    np.testing.assert_array_equal(coarse_refined, dense)


def test_voxelgrids_to_cubic_meshes_single_voxel():
    vg = jnp.zeros((1, 3, 3, 3)).at[0, 1, 1, 1].set(1.)
    verts, faces = voxelgrids_to_cubic_meshes(vg)
    v, f = np.asarray(verts[0]), np.asarray(faces[0])
    assert v.shape == (8, 3)
    assert f.shape == (12, 3)
    # vertices are the corners of the unit cube at offset (1,1,1)
    np.testing.assert_array_equal(np.sort(v, axis=0)[0], [1, 1, 1])
    np.testing.assert_array_equal(np.sort(v, axis=0)[-1], [2, 2, 2])


def test_voxelgrids_to_trianglemeshes_sphere():
    # surface of a voxel sphere should lie near radius in voxel units
    dim = 16
    ii, jj, kk = np.meshgrid(*([np.arange(dim)] * 3), indexing='ij')
    r = np.sqrt((ii - 7.5) ** 2 + (jj - 7.5) ** 2 + (kk - 7.5) ** 2)
    vg = jnp.asarray((r < 5.).astype(np.float32))[None]
    verts, faces = voxelgrids_to_trianglemeshes(vg)
    v = np.asarray(verts[0])
    f = np.asarray(faces[0])
    assert v.shape[0] > 100 and f.shape[0] > 100
    rad = np.linalg.norm(v - 8.0, axis=-1)
    assert abs(np.median(rad) - 5.) < 0.7


def test_trianglemeshes_to_voxelgrids():
    verts = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 0, 1]]],
                        dtype=jnp.float32)
    faces = jnp.asarray([[0, 1, 2]])
    vg = np.asarray(trianglemeshes_to_voxelgrids(verts, faces, 3))
    # reference doctest: triangle in the y=0 plane
    gt = np.array([[[1, 1, 1], [0, 0, 0], [0, 0, 0]],
                   [[1, 1, 0], [0, 0, 0], [0, 0, 0]],
                   [[1, 0, 0], [0, 0, 0], [0, 0, 0]]], dtype=np.float32)
    np.testing.assert_array_equal(vg[0], gt)


def test_downsample():
    vg = jnp.zeros((1, 4, 4, 4)).at[:, :2].set(0.7).at[:, 2:].set(0.4)
    out = np.asarray(downsample(vg, 2))
    np.testing.assert_allclose(out[0, 0], 0.7, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.4, rtol=1e-6)


def test_extract_surface_and_fill():
    vg = jnp.ones((1, 3, 3, 3))
    surf = np.asarray(extract_surface(vg, mode="wide"))
    assert surf[0, 1, 1, 1] == False  # noqa: E712
    assert surf.sum() == 26
    refilled = np.asarray(fill(jnp.asarray(surf)))
    assert refilled.sum() == 27


def test_odms_roundtrip():
    dim = 8
    ii, jj, kk = np.meshgrid(*([np.arange(dim)] * 3), indexing='ij')
    r = np.sqrt((ii - 3.5) ** 2 + (jj - 3.5) ** 2 + (kk - 3.5) ** 2)
    vg = jnp.asarray((r < 3.).astype(np.float32))[None]
    odms = extract_odms(vg)
    assert odms.shape == (1, 6, dim, dim)
    carved = project_odms(odms)
    # carving a full grid by the sphere's odms approximates its hull
    c = np.asarray(carved)[0]
    inner = np.asarray(vg)[0] > 0
    assert (c[inner]).all()


# --------------------------------------------------------------------------
# Conservative triangle voxelization / mesh -> SPC
# (reference: mesh_to_spc_cuda.cu d_ProcessTriangles/d_ProcessVoxels)
# --------------------------------------------------------------------------

def _random_voxelizer_inputs(seed=0, level=6, nv=60, nt=40):
    rng = np.random.default_rng(seed)
    res = 1 << level
    V = rng.uniform(0, res, (nv, 3)).astype(np.float32)
    F = rng.integers(0, nv, (nt, 3))
    # degenerate cases: repeated-vertex segment, point, collinear triple
    F = np.concatenate([F, [[0, 0, 1], [2, 2, 2]]])
    V = np.concatenate([V, [V[3] * 0.5 + V[4] * 0.5]])
    F = np.concatenate([F, [[3, 4, nv]]])
    return V, F, level


def test_voxelize_triangles_native_matches_numpy():
    from kaolin_tpu.ops.conversions.mesh import _voxelize_triangles_np
    from kaolin_tpu.native import voxelize_triangles_fast
    for seed in (0, 1):
        V, F, level = _random_voxelizer_inputs(seed)
        a = voxelize_triangles_fast(V, F, level)
        if a is None:
            pytest.skip('native library unavailable')
        b = _voxelize_triangles_np(V, F, level)
        assert set(map(tuple, a.tolist())) == set(map(tuple, b.tolist()))


def test_voxelize_triangles_covers_surface():
    # every densely-sampled point of each snapped *proper* triangle must
    # fall within one voxel of the emitted 26-connected band (degenerate
    # triangles follow the reference's bbox-diagonal quirk and are
    # excluded; see ops/conversions/mesh.py docstring)
    from kaolin_tpu.ops.conversions.mesh import voxelize_triangles
    V, F, level = _random_voxelizer_inputs(0)
    res = 1 << level
    vox = voxelize_triangles(V, F, level)
    have = set(map(tuple, vox.tolist()))
    p = np.floor(V[F].astype(np.float64) + 0.5)
    proper = np.linalg.norm(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1) > 0
    p = p[proper]
    s = np.linspace(0, 1, 25)
    u, w = np.meshgrid(s, s)
    keep = u + w <= 1
    u, w = u[keep], w[keep]
    pts = (p[:, 0, None] * (1 - u - w)[None, :, None]
           + p[:, 1, None] * u[None, :, None]
           + p[:, 2, None] * w[None, :, None]).reshape(-1, 3)
    inb = ((pts >= 0) & (pts <= res - 1)).all(-1)
    cells = np.unique(np.floor(pts[inb]).astype(np.int64), axis=0)
    for q in cells:
        assert any(
            (q[0] + dx, q[1] + dy, q[2] + dz) in have
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
        ), q


def test_voxelize_triangles_axis_aligned_exact():
    # a lattice-aligned square-half triangle in the z=4 plane: the covered
    # columns are exactly the dilated 2D footprint of the triangle
    from kaolin_tpu.ops.conversions.mesh import voxelize_triangles
    V = np.array([[1., 1., 4.], [6., 1., 4.], [1., 6., 4.]], np.float32)
    F = np.array([[0, 1, 2]])
    vox = voxelize_triangles(V, F, 3)
    have = set(map(tuple, vox.tolist()))
    assert all(z == 4 for _, _, z in have)
    got2d = {(x, y) for x, y, _ in have}
    # expectation from the reference's edge math: edges x=1, y=1, x+y=7,
    # each dilated outward by the half-pixel L1 radius, strict < 0 tests
    dilated = {(x, y) for x in range(8) for y in range(8)
               if x + 0.5 > 1 and y + 0.5 > 1 and (x - 0.5) + (y - 0.5) < 7}
    assert got2d == dilated


def test_unbatched_mesh_to_spc_octree_matches_voxels():
    from kaolin_tpu.ops.conversions.mesh import (voxelize_triangles,
                                                 unbatched_mesh_to_spc)
    from kaolin_tpu.ops.spc import (scan_octrees, generate_points,
                                    unbatched_get_level_points)
    level = 5
    res = 1 << level
    V, F, _ = _random_voxelizer_inputs(2, level=level)
    octree = unbatched_mesh_to_spc((V / res) * 2. - 1., F, level)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    leaf = np.asarray(unbatched_get_level_points(ph, pyramids[0], level))
    grid = (np.asarray(V, np.float64) / res) * res  # already grid coords
    vox = voxelize_triangles(V, F, level)
    assert set(map(tuple, leaf.tolist())) == set(map(tuple, vox.tolist()))
