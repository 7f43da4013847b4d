"""Extended USD I/O coverage: plural import/export symmetry, usdc
binary crate round-trips at scale, UV/normal round-trips, regex scene
filtering, up-axis handling, and overwrite semantics. Complements
tests/test_io.py (reference surface: kaolin/io/usd.py:306-1278)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.io import usd


def _mesh(n=10, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    f = rng.integers(0, n, size=(2 * n, 3)).astype(np.int32)
    return jnp.asarray(v), jnp.asarray(f)


@pytest.mark.parametrize('ext', ['usda', 'usdc'])
def test_export_import_meshes_plural(tmp_path, ext):
    path = os.path.join(str(tmp_path), f'scene.{ext}')
    vs, fs = zip(*[_mesh(6 + i, seed=i) for i in range(3)])
    usd.export_meshes(path, vertices=list(vs), faces=list(fs))
    out = usd.import_meshes(path)
    assert len(out) == 3
    for m, v, f in zip(out, vs, fs):
        np.testing.assert_allclose(np.asarray(m.vertices),
                                   np.asarray(v), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(m.faces), np.asarray(f))


@pytest.mark.parametrize('ext', ['usda', 'usdc'])
def test_mesh_uv_normals_roundtrip(tmp_path, ext):
    path = os.path.join(str(tmp_path), f'm.{ext}')
    v, f = _mesh(8, seed=3)
    rng = np.random.default_rng(1)
    uvs = jnp.asarray(rng.uniform(0, 1, (f.shape[0] * 3, 2)),
                      jnp.float32)
    fuv = jnp.arange(f.shape[0] * 3, dtype=jnp.int32).reshape(-1, 3)
    usd.export_mesh(path, vertices=v, faces=f, uvs=uvs,
                    face_uvs_idx=fuv)
    m = usd.import_mesh(path, with_normals=False)
    np.testing.assert_allclose(np.asarray(m.uvs), np.asarray(uvs),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m.face_uvs_idx),
                                  np.asarray(fuv))


def test_usdc_large_roundtrip(tmp_path):
    """The binary crate writer/reader at a few hundred KB: array
    alignment and section tables survive scale."""
    path = os.path.join(str(tmp_path), 'big.usdc')
    v, f = _mesh(20_000, seed=5)
    usd.export_mesh(path, vertices=v, faces=f)
    assert os.path.getsize(path) > 200_000
    m = usd.import_mesh(path)
    np.testing.assert_allclose(np.asarray(m.vertices), np.asarray(v),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m.faces), np.asarray(f))


def test_scene_path_regex_and_types(tmp_path):
    path = os.path.join(str(tmp_path), 's.usda')
    stage = usd.create_stage(path)
    v, f = _mesh(5)
    usd.add_mesh(stage, '/World/objA', vertices=v, faces=f)
    usd.add_mesh(stage, '/World/objB', vertices=v, faces=f)
    usd.add_pointcloud(stage, '/World/cloud0',
                       jnp.asarray(np.random.default_rng(0).normal(
                           size=(30, 3)), jnp.float32))
    stage.save()
    all_paths = usd.get_scene_paths(path)
    assert len(all_paths) >= 3
    just_a = usd.get_scene_paths(path, scene_path_regex='.*objA.*')
    assert len(just_a) == 1
    meshes = usd.get_scene_paths(path, prim_types=['Mesh'])
    assert len(meshes) == 2


@pytest.mark.parametrize('ext', ['usda', 'usdc'])
def test_pointcloud_times_roundtrip(tmp_path, ext):
    path = os.path.join(str(tmp_path), f'pc.{ext}')
    rng = np.random.default_rng(2)
    p0 = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    p1 = p0 + 0.5
    stage = usd.create_stage(path)
    usd.add_pointcloud(stage, '/World/pc', p0, time=0)
    usd.add_pointcloud(stage, '/World/pc', p1, time=10)
    stage.save()
    out0 = usd.import_pointcloud(path, '/World/pc', time=0)
    out10 = usd.import_pointcloud(path, '/World/pc', time=10)
    np.testing.assert_allclose(np.asarray(out0.points), np.asarray(p0),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out10.points), np.asarray(p1),
                               rtol=1e-6)


def test_voxelgrid_roundtrip_both_exts(tmp_path):
    rng = np.random.default_rng(4)
    vg = jnp.asarray(rng.random((16, 16, 16)) < 0.2)
    for ext in ('usda', 'usdc'):
        path = os.path.join(str(tmp_path), f'vg.{ext}')
        usd.export_voxelgrid(path, vg)
        out = usd.import_voxelgrid(path)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(vg))


def test_export_overwrites(tmp_path):
    path = os.path.join(str(tmp_path), 'o.usda')
    v1, f1 = _mesh(5, seed=1)
    v2, f2 = _mesh(9, seed=2)
    usd.export_mesh(path, vertices=v1, faces=f1)
    usd.export_mesh(path, vertices=v2, faces=f2)
    m = usd.import_mesh(path)
    assert np.asarray(m.vertices).shape == (9, 3)
