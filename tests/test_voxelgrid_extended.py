"""Extended voxelgrid ops: surface modes, fill on nested cavities, ODM
carving with votes, downsample fractions, and shape validation errors
(reference kaolin/ops/voxelgrid.py:21-365)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops.voxelgrid import (downsample, extract_surface, fill,
                                      extract_odms, project_odms)


def solid_cube(res=8, lo=2, hi=6):
    vg = np.zeros((1, res, res, res), np.float32)
    vg[:, lo:hi, lo:hi, lo:hi] = 1.
    return vg


def test_downsample_fractional_occupancy():
    vg = np.zeros((1, 4, 4, 4), np.float32)
    vg[0, 0, 0, 0] = 1.          # one of 8 cells in its 2x2x2 block
    out = np.asarray(downsample(jnp.asarray(vg), [2, 2, 2]))
    np.testing.assert_allclose(out[0, 0, 0, 0], 1. / 8)
    assert out.shape == (1, 2, 2, 2)


def test_extract_surface_modes_differ_on_edges():
    vg = jnp.asarray(solid_cube())
    wide = np.asarray(extract_surface(vg, mode='wide'))
    thin = np.asarray(extract_surface(vg, mode='thin'))
    # interior removed in both; the 4^3 solid keeps its 4^3-2^3 shell
    assert wide[0, 3:5, 3:5, 3:5].sum() == 0
    assert thin[0, 3:5, 3:5, 3:5].sum() == 0
    # both modes agree on a solid axis-aligned cube's shell
    assert wide.sum() == thin.sum() == 4 ** 3 - 2 ** 3
    with pytest.raises(ValueError):
        extract_surface(vg[0], mode='wide')
    with pytest.raises(ValueError):
        extract_surface(vg, mode='bogus')


def test_fill_nested_cavity():
    vg = solid_cube(10, 1, 9)
    vg[:, 3:7, 3:7, 3:7] = 0.         # hollow cavity
    filled = np.asarray(fill(jnp.asarray(vg)))
    assert filled[0, 4, 4, 4] == 1    # cavity filled
    assert filled[0, 0, 0, 0] == 0    # outside untouched
    # open channel to the outside -> no longer a cavity
    vg2 = vg.copy()
    vg2[:, 3:7, 5, 0:7] = 0.
    filled2 = np.asarray(fill(jnp.asarray(vg2)))
    assert filled2[0, 4, 5, 4] == 0


def test_odms_depths_of_shifted_slab():
    res = 8
    vg = np.zeros((1, res, res, res), np.float32)
    vg[0, :, :, 2:4] = 1.             # slab along z in [2, 4)
    odms = np.asarray(extract_odms(jnp.asarray(vg)))
    assert odms.shape == (1, 6, res, res)
    # depth = #empty voxels before the first filled one per direction;
    # z+ view sees 4 empties, z- view sees 2
    zplus = odms[0].min(axis=(1, 2))
    assert 2 in zplus and 4 in zplus
    # x/y views see through (slab fills the full cross-section): 0
    assert (odms[0].min(axis=(1, 2)) == 0).sum() >= 4


def test_project_odms_carves_back():
    vg = solid_cube(8, 2, 6)
    odms = extract_odms(jnp.asarray(vg))
    carved = np.asarray(project_odms(odms))
    # carving a full grid by the cube's ODMs recovers the convex cube
    np.testing.assert_array_equal(carved, vg)


def test_project_odms_votes_semantics():
    """``votes`` carving views are needed to REMOVE a voxel (reference
    voxelgrid.py:321: "votes needed to subtract a voxel"), so higher
    votes keeps more; the reference doctest's exact case is replicated
    below."""
    rng = np.random.default_rng(0)
    vg = (rng.random((1, 8, 8, 8)) < 0.3).astype(np.float32)
    odms = extract_odms(jnp.asarray(vg))
    keep1 = np.asarray(project_odms(odms, votes=1)).sum()
    keep6 = np.asarray(project_odms(odms, votes=6)).sum()
    assert keep1 <= keep6
    # the reference's own doctest case, byte for byte
    odms2 = np.zeros((1, 6, 2, 2), np.int32)
    odms2[0, 1, 1, 1] = 2
    out1 = np.asarray(project_odms(jnp.asarray(odms2)))
    expected = np.ones((1, 2, 2, 2), bool)
    expected[0, 1, 1, 0] = expected[0, 1, 1, 1] = False
    hmm = out1
    np.testing.assert_array_equal(hmm, expected)
    out2 = np.asarray(project_odms(jnp.asarray(odms2), votes=2))
    np.testing.assert_array_equal(out2, np.ones((1, 2, 2, 2), bool))


def test_fill_and_surface_validation():
    bad = jnp.zeros((4, 4, 4))
    with pytest.raises(ValueError):
        fill(bad)
    with pytest.raises(ValueError):
        project_odms(jnp.zeros((1, 5, 8, 8)))
