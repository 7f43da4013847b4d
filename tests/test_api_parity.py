"""API-parity additions: plural USD i/o, stage helpers, PRNG state,
deprecated aliases, material registry, extrinsics backend registry.

Reference symbols: ``kaolin/io/usd.py:264-1326``, ``ops/random.py:39-77``,
``ops/spc/points.py:309``, ``render/spc/raytrace.py:108``,
``io/materials.py:90``, ``render/camera/extrinsics_backends.py:44``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import kaolin_tpu as kal


def test_usd_pointclouds_plural_roundtrip(tmp_path):
    p = str(tmp_path / 'pc.usda')
    pcs = [np.random.default_rng(0).random((10, 3)).astype(np.float32),
           np.random.default_rng(1).random((5, 3)).astype(np.float32)]
    kal.io.usd.export_pointclouds(p, pcs, colors=[pcs[0], None])
    out = kal.io.usd.import_pointclouds(p)
    assert len(out) == 2
    np.testing.assert_allclose(out[0].points, pcs[0], rtol=1e-6)
    np.testing.assert_allclose(out[0].colors, pcs[0], rtol=1e-6)
    assert out[1].colors is None
    assert kal.io.usd.get_root(p) == '/'
    assert len(kal.io.usd.get_pointcloud_scene_paths(p)) == 2


def test_usd_voxelgrids_plural_roundtrip(tmp_path):
    p = str(tmp_path / 'vg.usda')
    v1 = np.zeros((8, 8, 8)); v1[2, 3, 4] = 1
    v2 = np.zeros((8, 8, 8)); v2[1, 1, 1] = 1
    kal.io.usd.export_voxelgrids(p, [v1, v2])
    out = kal.io.usd.import_voxelgrids(p)
    assert len(out) == 2
    assert bool(out[0][2, 3, 4]) and bool(out[1][1, 1, 1])
    # voxelgrid PointInstancers are not pointcloud scene paths
    assert kal.io.usd.get_pointcloud_scene_paths(p) == []


def test_usd_time_sample_helpers(tmp_path):
    st = kal.io.usd.create_stage(str(tmp_path / 't.usda'))
    kal.io.usd.add_pointcloud(st, '/World/pc', np.random.rand(4, 3), time=0)
    kal.io.usd.add_pointcloud(st, '/World/pc', np.random.rand(4, 3), time=10)
    st.save()
    assert kal.io.usd.get_authored_time_samples(st) == [0.0, 10.0]
    assert kal.io.usd.get_pointcloud_bracketing_time_samples(
        st, '/World/pc', 4) == (0.0, 10.0)
    assert kal.io.usd.get_pointcloud_bracketing_time_samples(
        st, '/World/pc', 10) == (10.0, 10.0)


def test_random_get_set_state():
    from kaolin_tpu.ops import random as krandom
    krandom.manual_seed(7)
    state = krandom.get_state()
    k1 = krandom.get_key()
    r1 = krandom.random_shape_per_tensor(4, (1, 1), (5, 5))
    krandom.set_state(state)
    k2 = krandom.get_key()
    r2 = krandom.random_shape_per_tensor(4, (1, 1), (5, 5))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(r1, r2)


def test_deprecated_aliases():
    from kaolin_tpu.ops.spc import points as spc_points
    from kaolin_tpu.render.spc import raytrace
    coords = jnp.asarray([[0.1, 0.2, 0.3]])
    pts = jnp.asarray([[0, 0, 0]], jnp.int16)
    with pytest.deprecated_call():
        a = spc_points.coords_to_trilinear(coords, pts, 3)
    b = spc_points.coords_to_trilinear_coeffs(coords, pts, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    ridx = jnp.asarray([0, 0, 1, 1, 1, 2])
    with pytest.deprecated_call():
        m = raytrace.mark_first_hit(ridx)
    np.testing.assert_array_equal(np.asarray(m),
                                  [True, False, True, False, False, True])


def test_flatten_feature_and_contained_equal():
    from kaolin_tpu.io.obj import flatten_feature
    assert flatten_feature(None) is None
    assert flatten_feature([]) is None
    assert flatten_feature([[1, 2], [3]]) == [1, 2, 3]
    from kaolin_tpu.utils.testing import contained_torch_equal
    assert contained_torch_equal({'a': [jnp.ones(2)]}, {'a': [np.ones(2)]})
    assert not contained_torch_equal({'a': 1}, {'b': 1})


def test_material_manager_registry():
    from kaolin_tpu.io.materials import (MaterialManager,
                                         MaterialNotSupportedError)
    reader = lambda params, tex, time: ('custom', params)
    MaterialManager.register_usd_reader('MyPBR_test', reader)
    assert MaterialManager.get_usd_reader('MyPBR_test') is reader
    assert MaterialManager.get_usd_reader('nope') is None
    assert issubclass(MaterialNotSupportedError, Exception)


def test_extrinsics_register_backend():
    from kaolin_tpu.render.camera import CameraExtrinsics, register_backend

    # translation-only representation: 3 params, identity rotation
    register_backend(
        'translation_only_test',
        params_from_mat=lambda mat: mat[:, :3, 3],
        mat_from_params=lambda p: jnp.concatenate([
            jnp.concatenate([
                jnp.tile(jnp.eye(3, dtype=p.dtype)[None],
                         (p.shape[0], 1, 1)), p[..., None]], -1),
            jnp.tile(jnp.asarray([[[0., 0., 0., 1.]]], p.dtype),
                     (p.shape[0], 1, 1))], 1))

    mat = jnp.eye(4)[None].at[:, :3, 3].set(jnp.asarray([[1., 2., 3.]]))
    ext = CameraExtrinsics.from_view_matrix(
        mat, backend='translation_only_test')
    assert ext.parameters().shape[-1] == 3
    np.testing.assert_allclose(np.asarray(ext.view_matrix()), np.asarray(mat),
                               atol=1e-6)
    pts = jnp.asarray([[[0., 0., 0.]]])
    np.testing.assert_allclose(np.asarray(ext.transform(pts))[0, 0],
                               [1., 2., 3.], atol=1e-5)


def test_usd_mesh_full_fields_roundtrip(tmp_path):
    """uvs / face_uvs_idx / face_normals round-trip through usda
    (reference io/usd.py:463 six-field namedtuple)."""
    rng = np.random.default_rng(0)
    p = str(tmp_path / 'm.usda')
    verts = rng.random((5, 3)).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [1, 3, 2], [2, 3, 4]])
    uvs = rng.random((5, 2)).astype(np.float32)
    fuv = faces.copy()
    fn = rng.random((3, 3, 3)).astype(np.float32)
    kal.io.usd.export_mesh(p, vertices=verts, faces=faces, uvs=uvs,
                           face_uvs_idx=fuv, face_normals=fn)
    out = kal.io.usd.import_mesh(p, with_normals=True)
    np.testing.assert_allclose(out.vertices, verts, rtol=1e-6)
    np.testing.assert_array_equal(out.faces, faces)
    np.testing.assert_allclose(out.uvs, uvs, rtol=1e-6)
    np.testing.assert_array_equal(out.face_uvs_idx, fuv)
    np.testing.assert_allclose(out.face_normals, fn, rtol=1e-6)
    assert out.materials is None        # with_materials=False
    many = kal.io.usd.import_meshes(p, with_normals=True)
    assert len(many) == 1 and many[0].faces.shape == (3, 3)


def test_usd_heterogeneous_mesh_handler(tmp_path):
    from kaolin_tpu.io.utils import (
        NonHomogeneousMeshError, heterogeneous_mesh_handler_naive_homogenize)
    p = str(tmp_path / 'het.usda')
    st = kal.io.usd.create_stage(p)
    prim = st.define_prim('/World/m', 'Mesh')
    prim.attrs['points'] = ('point3f[]',
                            np.random.rand(5, 3).astype(np.float32))
    prim.attrs['faceVertexCounts'] = ('int[]', np.asarray([3, 4]))
    prim.attrs['faceVertexIndices'] = ('int[]',
                                       np.asarray([0, 1, 2, 1, 3, 4, 2]))
    st.save()
    with pytest.raises(NonHomogeneousMeshError):
        kal.io.usd.import_mesh(p)
    out = kal.io.usd.import_mesh(
        p, heterogeneous_mesh_handler=heterogeneous_mesh_handler_naive_homogenize)
    # 3-gon stays, 4-gon fans into 2 triangles
    np.testing.assert_array_equal(
        out.faces, [[0, 1, 2], [1, 3, 4], [1, 4, 2]])


def test_usd_material_binding_roundtrip(tmp_path):
    """add_material(bind_to=...) authors a rel the importer reads back
    through import_mesh(with_materials=True), including the usda
    text round trip of the rel syntax."""
    from kaolin_tpu.io.materials import PBRMaterial
    p = str(tmp_path / 'mat.usda')
    verts = np.random.rand(3, 3).astype(np.float32)
    faces = np.asarray([[0, 1, 2]])
    kal.io.usd.export_mesh(p, '/World/mesh', vertices=verts, faces=faces)
    mat = PBRMaterial(name='red', diffuse_color=(1., 0., 0.),
                      metallic_value=0.25)
    kal.io.usd.add_material(p, '/World/Looks/red', mat,
                            bind_to='/World/mesh')
    out = kal.io.usd.import_mesh(p, scene_path='/World/mesh',
                                 with_materials=True)
    assert len(out.materials) == 1
    np.testing.assert_allclose(out.materials[0].diffuse_color,
                               (1., 0., 0.))


def test_usd_pointcloud_instancer_import(tmp_path):
    """import_pointcloud(s) reads PointInstancer-form pointclouds
    (positions attribute), the reference's default export form."""
    p = str(tmp_path / 'pi.usda')
    st = kal.io.usd.create_stage(p)
    prim = st.define_prim('/World/pc', 'PointInstancer')
    pts = np.random.rand(7, 3).astype(np.float32)
    prim.attrs['positions'] = ('point3f[]', pts)
    st.save()
    out = kal.io.usd.import_pointclouds(p)
    assert len(out) == 1
    np.testing.assert_allclose(out[0].points, pts, rtol=1e-6)


def test_register_backend_rejects_partial():
    from kaolin_tpu.render.camera import register_backend
    with pytest.raises(ValueError):
        register_backend('broken_test', params_from_mat=lambda m: m)
    with pytest.raises(ValueError):
        register_backend('broken_test2', mat_from_params=lambda p: p)


def test_usda_single_line_rel_metadata_does_not_truncate(tmp_path):
    """A balanced-paren rel metadata line must not swallow the file
    (review-confirmed parser bug)."""
    p = str(tmp_path / 'bal.usda')
    with open(p, 'w') as f:
        f.write('#usda 1.0\n(\n    upAxis = "Y"\n)\n'
                'def Xform "Root"\n{\n'
                '    def Mesh "m"\n    {\n'
                '        rel material:binding = </Root/Looks/M> '
                '(bindMaterialAs = "weakerThanDescendants")\n'
                '        point3f[] points = [(0, 0, 0), (1, 0, 0), '
                '(0, 1, 0)]\n'
                '        int[] faceVertexCounts = [3]\n'
                '        int[] faceVertexIndices = [0, 1, 2]\n'
                '    }\n'
                '    def Scope "Looks"\n    {\n'
                '        def Material "M"\n        {\n        }\n'
                '    }\n'
                '}\n')
    st = kal.io.usd.Stage.load(p)
    paths = {pp for pp, _ in st.walk()}
    assert '/Root/Looks/M' in paths
    out = kal.io.usd.import_mesh(p, '/Root/m')
    assert out.faces.shape == (1, 3)
    assert st.get_prim('/Root/m').attrs['material:binding'][1] \
        == '/Root/Looks/M'


def test_usd_vertex_interpolated_normals_and_implicit_uvs(tmp_path):
    """Vertex-interpolated normals (one per mesh vertex) and
    faceVarying uvs with no :indices dispatch by size instead of
    crashing or returning None (review-confirmed)."""
    p = str(tmp_path / 'vtx.usda')
    st = kal.io.usd.create_stage(p)
    prim = st.define_prim('/World/m', 'Mesh')
    verts = np.random.rand(4, 3).astype(np.float32)
    prim.attrs['points'] = ('point3f[]', verts)
    prim.attrs['faceVertexCounts'] = ('int[]', np.asarray([3, 3]))
    flat = np.asarray([0, 1, 2, 1, 3, 2])
    prim.attrs['faceVertexIndices'] = ('int[]', flat)
    vert_normals = np.random.rand(4, 3).astype(np.float32)   # per VERTEX
    prim.attrs['normals'] = ('normal3f[]', vert_normals)
    fv_uvs = np.random.rand(6, 2).astype(np.float32)         # faceVarying
    prim.attrs['primvars:st'] = ('texCoord2f[]', fv_uvs)
    st.save()
    out = kal.io.usd.import_mesh(p, '/World/m', with_normals=True)
    np.testing.assert_allclose(np.asarray(out.face_normals),
                               vert_normals[flat].reshape(2, 3, 3),
                               rtol=1e-6)
    # faceVarying st without :indices -> implicit arange indices
    np.testing.assert_array_equal(np.asarray(out.face_uvs_idx),
                                  np.arange(6).reshape(2, 3))
