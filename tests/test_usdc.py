"""Binary USD (usdc/crate) reader vs the reference's own binary
fixtures (``tests/samples/timelapse/notexture/**.usd``, written by pxr;
the reference reads them with usd-core in
``tests/python/kaolin/visualize/test_timelapse.py``)."""

import os

import numpy as np
import pytest

import kaolin_tpu.io.usd as usd
from kaolin_tpu.io.usdc import is_usdc

FIX = '/root/reference/tests/samples/timelapse/notexture'

pytestmark = pytest.mark.skipif(not os.path.isdir(FIX),
                                reason='reference fixtures unavailable')


def test_magic_detection():
    assert is_usdc(os.path.join(FIX, 'ground_truth', 'mesh_0.usd'))


def test_mesh_final_iterate_matches_ground_truth():
    # the fixture set is an optimization run: the output log's last time
    # sample must equal the ground-truth target
    out = usd.import_mesh(os.path.join(FIX, 'output', 'mesh_0.usd'),
                          time=100)
    gt = usd.import_mesh(os.path.join(FIX, 'ground_truth', 'mesh_0.usd'),
                         time=0)
    np.testing.assert_allclose(np.asarray(out.vertices),
                               np.asarray(gt.vertices), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.faces),
                                  np.asarray(gt.faces))
    assert out.faces.shape[1] == 3


def test_mesh_timesamples_progression():
    stage = usd.Stage.load(os.path.join(FIX, 'output', 'mesh_1.usd'))
    prim = stage.get_prim('/mesh_1')
    _, samples = prim.time_attrs['points']
    assert sorted(samples) == [0., 10., 20., 30., 40., 50., 60., 70.,
                               80., 90., 100.]
    assert all(v.shape == (482, 3) for v in samples.values())
    # the log must actually change over time
    assert not np.allclose(samples[0.], samples[100.])


def test_pointcloud_fixtures_parse():
    inp, _, _ = usd.import_pointcloud(
        os.path.join(FIX, 'input', 'pointcloud_0.usd'), time=0)
    out0, _, _ = usd.import_pointcloud(
        os.path.join(FIX, 'output', 'pointcloud_0.usd'), time=0)
    out100, _, _ = usd.import_pointcloud(
        os.path.join(FIX, 'output', 'pointcloud_0.usd'), time=100)
    assert np.asarray(inp).shape == np.asarray(out0).shape == (1432, 3)
    # the optimization log must move over time
    assert not np.allclose(np.asarray(out0), np.asarray(out100))


def test_voxelgrid_pointinstancer_layout():
    path = os.path.join(FIX, 'output', 'voxelgrid_0.usd')
    vg0 = np.asarray(usd.import_voxelgrid(path, time=0))
    vg100 = np.asarray(usd.import_voxelgrid(path, time=100))
    assert vg0.shape == vg100.shape == (30, 30, 30)
    assert vg0.dtype == bool
    assert vg0.sum() == 1277 and vg100.sum() == 1290


def test_usdc_to_usda_roundtrip(tmp_path):
    vg = usd.import_voxelgrid(
        os.path.join(FIX, 'output', 'voxelgrid_1.usd'), time=100)
    p = str(tmp_path / 'vg.usda')
    usd.export_voxelgrid(p, vg)
    back = usd.import_voxelgrid(p)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vg))

    mesh = usd.import_mesh(os.path.join(FIX, 'output', 'mesh_0.usd'),
                           time=50)
    p = str(tmp_path / 'm.usda')
    usd.export_mesh(p, vertices=mesh.vertices, faces=mesh.faces)
    back = usd.import_mesh(p)
    np.testing.assert_allclose(np.asarray(back.vertices),
                               np.asarray(mesh.vertices), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(back.faces),
                                  np.asarray(mesh.faces))
