"""Binary USD (usdc/crate) WRITER round trips.

The reference writes crate through pxr (``Usd.Stage.Save`` in
``kaolin/io/usd.py``); here :func:`kaolin_tpu.io.usdc.write_usdc` is the
pxr-free equivalent. These tests round-trip every Stage feature the
model holds through the binary path, and re-serialize a real pxr-written
reference fixture binary->binary to prove writer/reader closure on
pxr-shaped content.
"""

import os

import numpy as np
import pytest

import kaolin_tpu.io.usd as usd
from kaolin_tpu.io.usdc import is_usdc

FIX = '/root/reference/tests/samples/timelapse/notexture'


def test_mesh_roundtrip_binary(tmp_path):
    rng = np.random.RandomState(0)
    verts = rng.randn(17, 3).astype(np.float32)
    faces = rng.randint(0, 17, (12, 3))
    uvs = rng.rand(17, 2).astype(np.float32)
    p = str(tmp_path / 'm.usdc')
    usd.export_mesh(p, scene_path='/World/mesh_0', vertices=verts,
                    faces=faces, uvs=uvs, face_uvs_idx=faces)
    assert is_usdc(p)
    back = usd.import_mesh(p)
    np.testing.assert_allclose(np.asarray(back.vertices), verts,
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.faces), faces)
    stage = usd.Stage.load(p)
    prim = stage.get_prim('/World/mesh_0')
    np.testing.assert_allclose(
        np.asarray(prim.attrs['primvars:st'][1]), uvs, rtol=1e-6)
    assert stage.default_prim == 'World'


def test_timesamples_roundtrip_binary(tmp_path):
    p = str(tmp_path / 't.usdc')
    rng = np.random.RandomState(1)
    frames = {t: rng.randn(9, 3).astype(np.float32) for t in
              (0.0, 10.0, 25.0)}
    faces = rng.randint(0, 9, (4, 3))
    for t, v in frames.items():
        usd.export_mesh(p, scene_path='/m', vertices=v, faces=faces,
                        time=t)
    for t, v in frames.items():
        back = usd.import_mesh(p, time=t)
        np.testing.assert_allclose(np.asarray(back.vertices), v,
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(back.faces), faces)


def test_pointcloud_and_voxelgrid_roundtrip_binary(tmp_path):
    rng = np.random.RandomState(2)
    pts = rng.randn(50, 3).astype(np.float32)
    colors = rng.rand(50, 3).astype(np.float32)
    p = str(tmp_path / 'p.usdc')
    usd.export_pointcloud(p, pts, colors=colors)
    back = usd.import_pointcloud(p)
    np.testing.assert_allclose(np.asarray(back.points), pts, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.colors), colors,
                               rtol=1e-6)

    vg = rng.rand(13, 13, 13) > 0.7
    p = str(tmp_path / 'v.usdc')
    usd.export_voxelgrid(p, vg)
    np.testing.assert_array_equal(np.asarray(usd.import_voxelgrid(p)),
                                  vg)


def test_scalar_attr_types_roundtrip_binary(tmp_path):
    p = str(tmp_path / 's.usdc')
    stage = usd.Stage(p)
    prim = stage.define_prim('/World/shader', 'Shader')
    prim.attrs['info:id'] = ('string', 'UsdPreviewSurface')
    prim.attrs['metallic_value'] = ('float', 0.25)
    prim.attrs['ior_value'] = ('double', 1.5)
    prim.attrs['grid_size'] = ('int', -7)
    prim.attrs['flag'] = ('bool', True)
    prim.attrs['weights'] = ('float[]', np.asarray([1., 2., 3.]))
    stage.save()
    back = usd.Stage.load(p).get_prim('/World/shader')
    assert back.type_name == 'Shader'
    assert back.attrs['info:id'][1] == 'UsdPreviewSurface'
    assert back.attrs['metallic_value'][1] == pytest.approx(0.25)
    assert back.attrs['ior_value'][1] == pytest.approx(1.5)
    assert back.attrs['grid_size'][1] == -7
    assert back.attrs['flag'][1] is True
    np.testing.assert_allclose(np.asarray(back.attrs['weights'][1]),
                               [1., 2., 3.])


@pytest.mark.skipif(not os.path.isdir(FIX),
                    reason='reference fixtures unavailable')
def test_reserialize_pxr_fixture_binary(tmp_path):
    """pxr-written crate -> Stage -> our crate -> Stage closure."""
    src = os.path.join(FIX, 'output', 'mesh_1.usd')
    stage = usd.Stage.load(src)
    p = str(tmp_path / 'round.usdc')
    stage.file_path = p
    stage.save()
    assert is_usdc(p)
    back = usd.Stage.load(p)
    prim0 = stage.get_prim('/mesh_1')
    prim1 = back.get_prim('/mesh_1')
    _, s0 = prim0.time_attrs['points']
    _, s1 = prim1.time_attrs['points']
    assert sorted(s0) == sorted(s1)
    for t in s0:
        np.testing.assert_allclose(np.asarray(s1[t]), np.asarray(s0[t]),
                                   rtol=1e-6)
