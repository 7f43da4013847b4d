"""Full-pipeline golden-image regression.

The reference ships ``tests/samples/rasterization/*.png`` (depth,
face_idx, prob, texture, texture_light, vertex_color, vertex_normal per
view) but no test loads them and no script in its tree generates them —
the exact scene is unrecoverable. This suite guards the same pipeline
surface with its own checked-in fixtures: a deterministic UV-textured
icosphere driven through prepare_vertices -> rasterize -> dibr_soft_mask
-> texture_mapping -> SH lighting, quantized to uint8 PNGs and asserted
byte-exact (CPU/XLA order-exact path; deterministic across runs).

Regenerate with ``python tests/test_pipeline_golden.py`` after an
INTENTIONAL pipeline change (review the diff images first).
"""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), 'fixtures',
                      'rasterization')
H, W = 128, 256
QUANTITIES = ['depth', 'face_idx', 'prob', 'texture', 'texture_light',
              'vertex_color', 'vertex_normal']


def _icosphere(subdiv=2):
    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    for _ in range(subdiv):
        mid, nv, nf = {}, list(v), []

        def mp(a, b):
            k = (min(a, b), max(a, b))
            if k not in mid:
                m = (v[a] + v[b]) / 2
                mid[k] = len(nv)
                nv.append(m / np.linalg.norm(m))
            return mid[k]
        for a, b, c in f:
            ab, bc, ca = mp(a, b), mp(b, c), mp(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v, f = np.array(nv), np.array(nf)
    return v.astype(np.float32), f.astype(np.int32)


def _render_view(view):
    import kaolin_tpu as kal
    verts_np, faces_np = _icosphere(2)
    verts = jnp.asarray(verts_np)[None]
    faces = jnp.asarray(faces_np)
    F = faces_np.shape[0]

    angle = [0.3, 2.1][view]
    eye = jnp.asarray([[3 * math.sin(angle), 0.8, 3 * math.cos(angle)]],
                      jnp.float32)
    at = jnp.zeros((1, 3), jnp.float32)
    up = jnp.asarray([[0., 1., 0.]], jnp.float32)
    cam_rot, cam_trans = \
        kal.render.camera.generate_rotate_translate_matrices(eye, at, up)
    cam_proj = kal.render.camera.generate_perspective_projection(
        math.pi / 4., ratio=W / H)

    fvc, fvi, fnorm = kal.render.mesh.prepare_vertices(
        verts, faces, cam_proj, camera_rot=cam_rot, camera_trans=cam_trans)

    # spherical UVs + per-vertex colors + world normals as face features
    u = 0.5 + np.arctan2(verts_np[:, 2], verts_np[:, 0]) / (2 * np.pi)
    vv = 0.5 + np.arcsin(np.clip(verts_np[:, 1], -1, 1)) / np.pi
    uvs = jnp.asarray(np.stack([u, vv], -1), jnp.float32)
    vcol = jnp.asarray(verts_np * 0.5 + 0.5, jnp.float32)
    face_uvs = uvs[faces][None]
    face_vcol = vcol[faces][None]
    face_wnorm = jnp.asarray(verts_np, jnp.float32)[faces][None]

    features = [face_uvs, face_vcol, face_wnorm,
                jnp.ones((1, F, 3, 1), jnp.float32)]
    feats, soft_mask, face_idx = kal.render.mesh.dibr_rasterization(
        H, W, fvc[..., 2], fvi, features, fnorm[..., 2],
        rast_backend='xla', mask_backend='xla')
    uv_map, vcol_im, wnorm_im, hard = feats
    depth_feat, _ = kal.render.mesh.rasterize(
        H, W, fvc[..., 2], fvi, fvc[..., 2:], fnorm[..., 2] >= 0.,
        backend='xla')

    # procedural checkerboard texture (C-order, (1, 3, th, tw))
    th = tw = 64
    yy, xx = np.meshgrid(np.arange(th), np.arange(tw), indexing='ij')
    checker = ((xx // 8 + yy // 8) % 2).astype(np.float32)
    tex = np.stack([checker, 0.3 + 0.5 * (1 - checker),
                    np.linspace(0, 1, tw)[None].repeat(th, 0)], 0)
    texture = kal.render.mesh.texture_mapping(
        uv_map, jnp.asarray(tex)[None], mode='bilinear')
    texture = texture * hard[..., :1]

    # 9-coeff SH diffuse lighting on the interpolated world normals
    n = wnorm_im / jnp.maximum(
        jnp.linalg.norm(wnorm_im, axis=-1, keepdims=True), 1e-8)
    sh_coeffs = jnp.asarray(
        [2.0, 0.7, 0.4, -0.2, 0.1, 0.3, -0.1, 0.2, 0.05], jnp.float32)
    light = kal.render.lighting.sh9_irradiance(sh_coeffs,
                                               n.reshape(-1, 3))
    light = light.reshape(1, H, W, 1)
    texture_light = texture * light

    def q8(x, lo=0., hi=1.):
        arr = (np.asarray(x, np.float64) - lo) / (hi - lo)
        return np.clip(arr * 255., 0., 255.).astype(np.uint8)

    z = np.asarray(depth_feat[0, ..., 0])
    cover = np.asarray(face_idx[0]) >= 0
    zmin, zmax = -4.2, -1.8                    # fixed camera-z window
    out = {
        'depth': q8(np.where(cover, z, zmin), zmin, zmax),
        'face_idx': ((np.asarray(face_idx[0]) + 1) % 256).astype(np.uint8),
        'prob': q8(np.asarray(soft_mask[0])),
        'texture': q8(np.asarray(texture[0])),
        'texture_light': q8(np.asarray(texture_light[0]), 0., 2.5),
        'vertex_color': q8(np.asarray(vcol_im[0])),
        'vertex_normal': q8(np.asarray(wnorm_im[0]) * 0.5 + 0.5),
    }
    return out


def _fixture_path(name, view):
    return os.path.join(FIXDIR, f'{name}_{view}.png')


@pytest.mark.parametrize('view', [0, 1])
def test_full_pipeline_matches_golden_images(view):
    from PIL import Image
    missing = [q for q in QUANTITIES
               if not os.path.exists(_fixture_path(q, view))]
    assert not missing, (f'fixtures missing: {missing} — run '
                         f'python tests/test_pipeline_golden.py')
    out = _render_view(view)
    for name in QUANTITIES:
        golden = np.asarray(Image.open(_fixture_path(name, view)))
        np.testing.assert_array_equal(out[name], golden, err_msg=name)


def test_pipeline_quantities_sane():
    out = _render_view(0)
    # depth is quantized with uncovered pixels pinned to 0 (zmin); the
    # sphere's own z range sits strictly inside the window
    cover = out['depth'] > 0
    assert 0.05 < cover.mean() < 0.9
    assert out['prob'].max() == 255
    assert out['texture'][~np.broadcast_to(cover[..., None],
                                           out['texture'].shape)].max() == 0
    assert out['depth'].max() > 0


if __name__ == '__main__':
    # mirror conftest.py exactly — fixtures must be generated under the
    # same config the tests run with (x64 promotion changes texture
    # sampling by ~1 uint8 step on a fraction of pixels)
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from PIL import Image
    os.makedirs(FIXDIR, exist_ok=True)
    for view in (0, 1):
        for name, arr in _render_view(view).items():
            Image.fromarray(arr).save(_fixture_path(name, view))
            print('wrote', _fixture_path(name, view))
