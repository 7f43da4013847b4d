"""I/O: OBJ/OFF/USD round trips, materials, datasets, Timelapse."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.io import obj, off, usd, utils as io_utils
from kaolin_tpu.io.materials import PBRMaterial
from kaolin_tpu.io.dataset import (Cache, CachedDataset, KaolinDataset,
                                   ProcessedDataset, CombinationDataset)
from kaolin_tpu.visualize import Timelapse, TimelapseParser


OBJ_TEXT = """
mtllib test.mtl
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1
f 1/1/1 3/3/1 4/2/1
"""

MTL_TEXT = """
newmtl red
Kd 1.0 0.0 0.0
Ka 0.1 0.1 0.1
"""


@pytest.fixture
def obj_file(tmp_path):
    p = tmp_path / 'test.obj'
    p.write_text(OBJ_TEXT)
    (tmp_path / 'test.mtl').write_text(MTL_TEXT)
    return str(p)


def test_obj_import(obj_file):
    mesh = obj.import_mesh(obj_file, with_materials=True, with_normals=True)
    assert mesh.vertices.shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(mesh.faces),
                                  [[0, 1, 2], [0, 2, 3]])
    assert mesh.uvs.shape == (3, 2)
    np.testing.assert_array_equal(np.asarray(mesh.face_uvs_idx),
                                  [[0, 1, 2], [0, 2, 1]])
    assert len(mesh.materials) == 1
    np.testing.assert_allclose(np.asarray(mesh.materials[0]['Kd']),
                               [1., 0., 0.])
    np.testing.assert_array_equal(np.asarray(mesh.materials_order), [[0, 0]])
    assert mesh.vertex_normals.shape == (1, 3)


def test_obj_heterogeneous(tmp_path):
    p = tmp_path / 'het.obj'
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
                 "f 1 2 3\nf 1 2 3 4\n")
    with pytest.raises(io_utils.NonHomogeneousMeshError):
        obj.import_mesh(str(p))
    mesh = obj.import_mesh(
        str(p), heterogeneous_mesh_handler=
        io_utils.heterogeneous_mesh_handler_naive_homogenize)
    np.testing.assert_array_equal(np.asarray(mesh.faces),
                                  [[0, 1, 2], [0, 1, 2], [0, 2, 3]])


def test_off_import(tmp_path):
    p = tmp_path / 'test.off'
    p.write_text("OFF\n4 2 0\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
                 "3 0 1 2 255 0 0\n3 0 2 3 0 255 0\n")
    mesh = off.import_mesh(str(p), with_face_colors=True)
    assert mesh.vertices.shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(mesh.faces),
                                  [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(np.asarray(mesh.face_colors),
                                  [[255, 0, 0], [0, 255, 0]])


def test_usd_mesh_roundtrip(tmp_path):
    path = str(tmp_path / 'mesh.usda')
    v = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)),
                    jnp.float32)
    f = jnp.asarray([[0, 1, 2], [2, 3, 4]])
    usd.export_mesh(path, '/World/mesh', vertices=v, faces=f)
    out = usd.import_mesh(path, '/World/mesh')
    np.testing.assert_allclose(np.asarray(out.vertices), np.asarray(v),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.faces), np.asarray(f))


def test_usd_timesamples(tmp_path):
    path = str(tmp_path / 'anim.usda')
    f = jnp.asarray([[0, 1, 2]])
    stage = usd.create_stage(path)
    for t in [0, 5, 10]:
        usd.add_mesh(stage, '/World/m', jnp.full((3, 3), float(t)), f,
                     time=t)
    stage.save()
    for t in [0, 5, 10]:
        out = usd.import_mesh(path, '/World/m', time=t)
        np.testing.assert_allclose(np.asarray(out.vertices), float(t))


def test_usd_pointcloud_voxelgrid_roundtrip(tmp_path):
    pc_path = str(tmp_path / 'pc.usda')
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(20, 3)),
                      jnp.float32)
    usd.export_pointcloud(pc_path, pts)
    out = usd.import_pointcloud(pc_path)
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(pts),
                               rtol=1e-6)

    vg_path = str(tmp_path / 'vg.usda')
    vg = np.zeros((4, 4, 4))
    vg[1, 2, 3] = vg[0, 0, 0] = 1
    usd.export_voxelgrid(vg_path, jnp.asarray(vg))
    out = np.asarray(usd.import_voxelgrid(vg_path))
    np.testing.assert_array_equal(out, vg > 0.5)


def test_usd_scene_paths(tmp_path):
    path = str(tmp_path / 'multi.usda')
    stage = usd.create_stage(path)
    for i in range(3):
        usd.add_mesh(stage, f'/World/Meshes/mesh_{i}',
                     jnp.zeros((3, 3)), jnp.asarray([[0, 1, 2]]))
    usd.add_pointcloud(stage, '/World/pc', jnp.zeros((4, 3)))
    stage.save()
    meshes = usd.get_scene_paths(path, prim_types='Mesh')
    assert len(meshes) == 3
    pcs = usd.get_scene_paths(path, prim_types='Points')
    assert pcs == ['/World/pc']


def test_material_roundtrip(tmp_path):
    path = str(tmp_path / 'mat.usda')
    usd.create_stage(path)
    tex = jnp.asarray(np.random.default_rng(0).random((3, 8, 8)),
                      jnp.float32)
    mat = PBRMaterial(name='m0', diffuse_color=(0.2, 0.3, 0.4),
                      roughness_value=0.7, metallic_value=0.9,
                      diffuse_texture=tex)
    mat.write_to_usd(path, '/World/Looks/m0')
    back = PBRMaterial.read_from_usd(path, '/World/Looks/m0')
    np.testing.assert_allclose(back.diffuse_color, (0.2, 0.3, 0.4),
                               rtol=1e-5)
    assert abs(back.roughness_value - 0.7) < 1e-6
    assert abs(back.metallic_value - 0.9) < 1e-6
    np.testing.assert_allclose(np.asarray(back.diffuse_texture),
                               np.asarray(tex), atol=2 / 255.)


class _ToyDataset(KaolinDataset):
    def __len__(self):
        return 5

    def get_data(self, i):
        return np.full((2, 2), i, np.float32)

    def get_attributes(self, i):
        return {'name': f'item_{i}'}


def test_datasets(tmp_path):
    ds = _ToyDataset()
    item = ds[2]
    assert item.attributes['name'] == 'item_2'
    cached = CachedDataset(ds, str(tmp_path / 'cache'))
    got = cached[3]
    np.testing.assert_array_equal(got.data, np.full((2, 2), 3))
    # second instantiation hits the disk cache
    cached2 = CachedDataset(ds, str(tmp_path / 'cache'))
    np.testing.assert_array_equal(cached2[3].data, np.full((2, 2), 3))

    processed = ProcessedDataset(ds, lambda d: d * 2,
                                 cache_dir=str(tmp_path / 'proc'))
    np.testing.assert_array_equal(processed[2].data, np.full((2, 2), 4))

    combo = CombinationDataset([ds, ds])
    assert len(combo) == 5
    np.testing.assert_array_equal(combo[1].data[0], combo[1].data[1])


def test_timelapse_roundtrip(tmp_path):
    logdir = str(tmp_path / 'logs')
    tl = Timelapse(logdir)
    f = jnp.asarray([[0, 1, 2]])
    for it in [0, 10]:
        tl.add_mesh_batch(iteration=it, category='fit',
                          vertices_list=[jnp.full((3, 3), float(it))],
                          faces_list=[f])
    tl.add_pointcloud_batch(iteration=0, category='pc',
                            pointcloud_list=[jnp.zeros((7, 3))])
    parser = TimelapseParser(logdir)
    mesh_files = parser.get_filepaths('fit', 'mesh')
    assert len(mesh_files) == 1
    out = usd.import_mesh(mesh_files[0], time=10)
    np.testing.assert_allclose(np.asarray(out.vertices), 10.)
    assert parser.num_items('pointcloud') == 1
    assert not parser.check_for_updates()
    tl.add_mesh_batch(iteration=20, category='fit',
                      vertices_list=[jnp.zeros((3, 3))], faces_list=[f])
    assert parser.check_for_updates()


def test_texture_mapping_matches_torch_grid_sample():
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    from kaolin_tpu.render.mesh import texture_mapping
    rng = np.random.default_rng(0)
    tex = rng.random((2, 3, 17, 23)).astype(np.float32)
    uv = rng.random((2, 9, 11, 2)).astype(np.float32)
    for mode in ('nearest', 'bilinear'):
        ours = np.asarray(texture_mapping(jnp.asarray(uv),
                                          jnp.asarray(tex), mode=mode))
        t_uv = torch.from_numpy(uv).reshape(2, -1, 1, 2).clamp(0, 1) * 2 - 1
        t_uv[..., 1] *= -1
        ref = F.grid_sample(torch.from_numpy(tex), t_uv, mode=mode,
                            align_corners=False, padding_mode='border')
        ref = ref.permute(0, 2, 3, 1).reshape(2, 9, 11, 3).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5,
                                   err_msg=f'mode={mode}')


def test_import_synthetic_view_fixture():
    """Against the reference's synthetic-view sample
    (``tests/python/kaolin/io/test_render.py:100``)."""
    import json as _json
    import math as _math
    root = '/root/reference/tests/samples/synthetic'
    if not os.path.isdir(root):
        pytest.skip('reference fixtures unavailable')
    from kaolin_tpu.io.render import import_synthetic_view
    out = import_synthetic_view(root, 0, rgb=True, normals=True,
                                bbox_2d_tight=True, bbox_2d_loose=True)
    from PIL import Image
    exp_rgb = np.array(Image.open(os.path.join(root, '0_rgb.png'))
                       )[:, :, :3].astype(np.float32) / 255.
    np.testing.assert_array_equal(np.asarray(out['rgb']), exp_rgb)
    assert out['normals'].shape == exp_rgb.shape
    meta = _json.load(open(os.path.join(root, '0_metadata.json')))
    np.testing.assert_allclose(
        np.asarray(out['metadata']['cam_transform']),
        np.asarray(meta['camera_properties']['tf_mat'],
                   np.float32)[:, :3])
    cam = meta['camera_properties']
    fov = 2 * _math.atan(cam['horizontal_aperture']
                         / (2 * cam['focal_length']))
    ar = cam['resolution']['width'] / cam['resolution']['height']
    from kaolin_tpu.render.camera import generate_perspective_projection
    np.testing.assert_allclose(np.asarray(out['metadata']['cam_proj']),
                               np.asarray(generate_perspective_projection(
                                   fov, ar)), rtol=1e-6)
    assert out['bbox_2d_tight'] == meta['bbox_2d_tight']
    assert out['metadata']['clipping_range'] == \
        cam['clipping_range']


REF_SAMPLES = '/root/reference/tests/samples'
_have_ref = os.path.isdir(REF_SAMPLES)


@pytest.mark.skipif(not _have_ref, reason='reference fixtures unavailable')
def test_import_pointcloud_pxr_fixtures_both_forms():
    """The reference's pxr-written pointcloud fixtures: GeomPoints form
    ('points') and v0.9.0 PointInstancer form ('positions') hold the
    same cloud and must import identically."""
    a = usd.import_pointcloud(
        os.path.join(REF_SAMPLES, 'rocket_pointcloud_GeomPoints.usda'))
    b = usd.import_pointcloud(
        os.path.join(REF_SAMPLES, 'rocket_pointcloud.v0.9.0.usda'))
    assert a.points.shape[0] > 100
    np.testing.assert_allclose(np.asarray(a.points), np.asarray(b.points))
    assert len(usd.import_pointclouds(
        os.path.join(REF_SAMPLES, 'rocket_pointcloud.v0.9.0.usda'))) == 1


@pytest.mark.skipif(not _have_ref, reason='reference fixtures unavailable')
def test_import_hetero_usd_fixture_with_handler():
    """rocket_hetero.usd (pxr-written: quads + triangles + one 14-gon)
    imports through the naive fan homogenizer; without a handler it
    raises."""
    from kaolin_tpu.io.utils import (
        NonHomogeneousMeshError, heterogeneous_mesh_handler_naive_homogenize)
    path = os.path.join(REF_SAMPLES, 'rocket_hetero.usd')
    with pytest.raises(NonHomogeneousMeshError):
        usd.import_mesh(path)
    out = usd.import_mesh(
        path,
        heterogeneous_mesh_handler=heterogeneous_mesh_handler_naive_homogenize)
    raw = usd.Stage.load(path)
    prim_counts = None
    for p, prim in raw.walk():
        if 'faceVertexCounts' in prim.attrs:
            prim_counts = np.asarray(prim.attrs['faceVertexCounts'][1])
    expected_tris = int(np.sum(prim_counts - 2))
    assert out.faces.shape == (expected_tris, 3)
    assert int(out.faces.max()) < out.vertices.shape[0]


@pytest.mark.skipif(not _have_ref, reason='reference fixtures unavailable')
def test_import_pxr_materials_fixture():
    """pxr-written UsdPreviewSurface materials (values + UsdUVTexture
    connections) import through the Material/Shader tree layout."""
    p = os.path.join(REF_SAMPLES, 'golden', 'pbr_material_values.usda')
    m = usd.import_material(p, '/World/Looks/Diffuse')
    assert m.diffuse_color == (0., 1., 0.)
    d = usd.import_material(p, '/World/Looks/Default')
    assert d.diffuse_color == (0.5, 0.5, 0.5)
    assert d.ior_value == 1.5 and d.clearcoat_roughness_value == 0.01

    pt = os.path.join(REF_SAMPLES, 'golden', 'pbr_material_textures.usda')
    mt = usd.import_material(pt, '/World/Looks/Diffuse')
    assert mt.diffuse_texture.shape == (3, 256, 256)
    mr = usd.import_material(pt, '/World/Looks/Roughness')
    assert mr.roughness_texture.shape == (1, 256, 256)  # outputs:r


def test_material_manager_dispatches_unknown_shader(tmp_path):
    from kaolin_tpu.io.materials import (MaterialManager,
                                         MaterialNotSupportedError)
    p = str(tmp_path / 'custom.usda')
    st = usd.create_stage(p)
    mat = st.define_prim('/World/Looks/X', 'Material')
    sh = st.define_prim('/World/Looks/X/Shader', 'Shader')
    sh.attrs['info:id'] = ('token', 'MyCustomPBR')
    sh.attrs['inputs:foo'] = ('float', 7.0)
    st.save()
    with pytest.raises(MaterialNotSupportedError):
        usd.import_material(p, '/World/Looks/X')
    seen = {}

    def reader(params, tex_dir, time):
        seen['params'] = params
        return 'custom-material'
    MaterialManager.register_usd_reader('MyCustomPBR', reader)
    out = usd.import_material(p, '/World/Looks/X')
    assert out == 'custom-material'
    assert seen['params']['inputs:foo'] == 7.0


@pytest.mark.skipif(not _have_ref, reason='reference fixtures unavailable')
def test_import_subsets_materials_fixture():
    """rocket_hetero_subsets_materials.usd: mesh-level binding plus two
    GeomSubset bindings import as three materials (pxr metadata parens
    around attributes must not derail the prim tree)."""
    path = os.path.join(REF_SAMPLES, 'rocket_hetero_subsets_materials.usd')
    st = usd.Stage.load(path)
    paths = {p for p, _ in st.walk()}
    assert '/Root/Looks/PreviewSurfaceTexture' in paths
    out = usd.import_mesh(
        path, with_materials=True,
        heterogeneous_mesh_handler=
        io_utils.heterogeneous_mesh_handler_naive_homogenize)
    assert out.faces.shape[1] == 3 and out.faces.shape[0] > 800
    assert len(out.materials) == 3
    # the mesh-level binding is the textured preview surface
    assert out.materials[0].diffuse_texture is not None
    # the subset materials carry plain colors
    assert out.materials[1].diffuse_color == (1., 0., 0.)


@pytest.mark.skipif(not _have_ref, reason='reference fixtures unavailable')
def test_stage_load_parses_every_reference_usd():
    """Every USD file the reference ships (usda text + usdc binary,
    pxr-written) parses into a non-trivial prim tree without errors."""
    count = 0
    for dirpath, _, files in os.walk(REF_SAMPLES):
        for f in files:
            if f.endswith(('.usd', '.usda', '.usdc')):
                st = usd.Stage.load(os.path.join(dirpath, f))
                assert sum(1 for _ in st.walk()) >= 1
                count += 1
    assert count >= 20


@pytest.mark.skipif(not _have_ref, reason='reference fixtures unavailable')
def test_simple_obj_off_fixtures_match_reference_expectations():
    """The reference's own simple_obj/simple_off fixtures and the
    EXPECTED values from its tests (test_obj.py:59-170): quad faces,
    'map_Ks .' error handling, heterogeneous fan order,
    materials_order, comment-laden OFF with missing edge count."""
    import warnings
    d = os.path.join(REF_SAMPLES, 'simple_obj')
    # default handler raises on the unloadable 'map_Ks .' texture
    with pytest.raises(Exception):
        obj.import_mesh(os.path.join(d, 'model.obj'), with_materials=True)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        m = obj.import_mesh(os.path.join(d, 'model.obj'),
                            with_materials=True, with_normals=True,
                            error_handler=obj.skip_error_handler)
    assert np.asarray(m.faces).shape == (2, 4)          # uniform quads
    np.testing.assert_array_equal(np.asarray(m.materials_order),
                                  [[0, 0], [1, 1], [2, 2]])
    mh = obj.import_mesh(
        os.path.join(d, 'model_heterogeneous.obj'), with_materials=True,
        with_normals=True, error_handler=obj.skip_error_handler,
        heterogeneous_mesh_handler=
        io_utils.heterogeneous_mesh_handler_naive_homogenize)
    # the reference's expected_faces_heterogeneous (test_obj.py:59)
    np.testing.assert_array_equal(np.asarray(mh.faces),
                                  [[0, 1, 3], [0, 3, 2], [1, 0, 4]])

    o = off.import_mesh(os.path.join(REF_SAMPLES, 'simple_off/model.off'),
                        with_face_colors=True)
    assert o.vertices.shape == (6, 3)
    np.testing.assert_array_equal(np.asarray(o.faces),
                                  [[1, 2, 4, 3], [2, 1, 5, 6]])
    np.testing.assert_array_equal(np.asarray(o.face_colors),
                                  [[128, 128, 128], [0, 0, 255]])
