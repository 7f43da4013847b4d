"""Parametric fish photo-fitting — the fork's flagship application.

Behavioral reference: ``examples/tutorial/ian_fish_body_mesh.py``,
``ian_fish_fin_mesh.py``, ``ian_fish_texture.py``,
``ian_fish_optimizer.py``, ``ian_cubic_spline_optimizer.py``.

The fish is a flat "card" body (roots swept along a learnable segment,
top/bottom silhouettes given by learnable cubic Hermite splines, z = 0)
plus fins grown from learnable uv-anchored root curves on the body, all
fitted to a single photo via DIB-R soft-silhouette, root-position, and
image losses.

TPU-native re-design: where the reference mutates per-object torch
tensors with one Adam optimizer *per tensor* and StepLR schedulers,
here every mesh is a pure jittable function of a parameter pytree,
each training stage is a single jitted ``optax`` step (adam +
staircase exponential decay == StepLR), and the staged schedule
(body -> fins -> texture) is explicit in ``fit_fish``.
"""

import json
import math

import numpy as np
import jax
import jax.numpy as jnp
import optax

import kaolin_tpu as kal
from . import utils
from .spline import interp_func_with_tangent

__all__ = [
    'make_spline', 'spline_ys', 'negative_ys_loss',
    'card_topology', 'make_body_params', 'fish_body_vertices',
    'position_by_uv', 'make_fin_params', 'fish_fin_vertices',
    'uv_bound_loss', 'uv_grid_boxes', 'FishMesh', 'fish_params_to_json',
    'fish_params_from_json', 'fit_fish',
]


# ---------------------------------------------------------------- splines

def make_spline(key_size, init_ys=1.0):
    """Learnable cubic Hermite spline over fixed knots x in [0, 1]
    (``ian_cubic_spline_optimizer.py:31``)."""
    return {
        'key_ys': jnp.full((key_size,), init_ys, jnp.float32),
        'key_ts': jnp.zeros((key_size,), jnp.float32),
    }


def spline_ys(spline, sample_xs):
    key_xs = jnp.linspace(0., 1., spline['key_ys'].shape[0])
    return interp_func_with_tangent(key_xs, spline['key_ys'],
                                    spline['key_ts'], sample_xs)


def spline_ys_lod(spline, lod_x):
    return spline_ys(spline, jnp.linspace(0., 1., lod_x))


def negative_ys_loss(spline, lod_x):
    """mean(exp(-ys)) — pushes silhouette heights positive
    (``ian_cubic_spline_optimizer.py:138``)."""
    return jnp.mean(jnp.exp(-spline_ys_lod(spline, lod_x)))


# ----------------------------------------------------------- card topology

def card_topology(lod_x, lod_y):
    """Faces + uv grid of an (lod_x columns) x (lod_y rows) card.

    Vertex v-fastest layout ``col * lod_y + row`` with the reference's
    quad split ([a, a+lod_y, a+1], [a+1, a+lod_y, a+lod_y+1];
    ``ian_fish_body_mesh.py:285-296``). Host-side static topology.
    """
    i, j = np.meshgrid(np.arange(lod_x - 1), np.arange(lod_y - 1),
                       indexing='ij')
    a = (i * lod_y + j).ravel()
    tri1 = np.stack([a, a + lod_y, a + 1], -1)
    tri2 = np.stack([a + 1, a + lod_y, a + lod_y + 1], -1)
    faces = np.stack([tri1, tri2], 1).reshape(-1, 3).astype(np.int64)
    u = np.repeat(np.arange(lod_x) / (lod_x - 1), lod_y)
    v = np.tile(np.arange(lod_y) / (lod_y - 1), lod_x)
    uvs = np.stack([u, v], -1).astype(np.float32)
    return faces, uvs[None], faces.copy()   # faces, uvs, face_uvs_idx


# ------------------------------------------------------------------- body

def make_body_params(key_size, init_height=1.0):
    """Learnable: origin_xy, length_x, two silhouette splines. origin_z
    and length_y/z stay fixed at 0 (``ian_fish_body_mesh.py:68-74``)."""
    return {
        'origin_xy': jnp.asarray([-1., 0.], jnp.float32),
        'length_x': jnp.asarray(2., jnp.float32),
        'top_spline': make_spline(key_size, init_height),
        'bottom_spline': make_spline(key_size, init_height),
    }


def _body_endpoints(params):
    start = jnp.concatenate([params['origin_xy'], jnp.zeros((1,))])
    length = jnp.stack([params['length_x'], jnp.asarray(0.),
                        jnp.asarray(0.)])
    return start, start + length


def fish_body_vertices(params, lod_x, lod_y):
    """(1, lod_x*lod_y, 3) card vertices: columns sweep the root
    segment; each column spans root - (0, bottom, 0) ->
    root + (0, top, 0) (``ian_fish_body_mesh.py:246-281``)."""
    start, end = _body_endpoints(params)
    frac_x = jnp.linspace(0., 1., lod_x)[:, None]
    roots = start + frac_x * (end - start)                 # (lod_x, 3)
    top = spline_ys_lod(params['top_spline'], lod_x)
    bottom = spline_ys_lod(params['bottom_spline'], lod_x)
    yoff = jnp.stack([jnp.zeros_like(top), top, jnp.zeros_like(top)], -1)
    boff = jnp.stack([jnp.zeros_like(bottom), -bottom,
                      jnp.zeros_like(bottom)], -1)
    lo = roots + boff                                      # (lod_x, 3)
    hi = roots + yoff
    frac_y = jnp.linspace(0., 1., lod_y)[None, :, None]
    verts = lo[:, None, :] + frac_y * (hi - lo)[:, None, :]
    return verts.reshape(1, lod_x * lod_y, 3)


def position_by_uv(vertices, lod_x, lod_y, uvs):
    """Bilinear body-surface positions at uv in [0,1]^2
    (``ian_fish_body_mesh.py:194-213``). ``uvs``: (K, 2) -> (K, 3)."""
    flat = vertices[0]
    lu = uvs[:, 0] * (lod_x - 1)
    lv = uvs[:, 1] * (lod_y - 1)
    fu = jnp.floor(lu).astype(jnp.int32)
    cu = jnp.ceil(lu).astype(jnp.int32)
    fv = jnp.floor(lv).astype(jnp.int32)
    cv = jnp.ceil(lv).astype(jnp.int32)
    ou = (lu - fu)[:, None]
    ov = (lv - fv)[:, None]
    bl = flat[fu * lod_y + fv]
    tl = flat[fu * lod_y + cv]
    br = flat[cu * lod_y + fv]
    tr = flat[cu * lod_y + cv]
    left = bl + (tl - bl) * ov
    right = br + (tr - br) * ov
    return left + (right - left) * ou


# -------------------------------------------------------------------- fins

def make_fin_params(key_size, start_uv=(0.5, 0.5), end_uv=(0.5, 0.5),
                    init_height=0.2):
    """Learnable: root-curve uv anchors, growth angles, silhouette
    spline (``ian_fish_fin_mesh.py:38-115``)."""
    return {
        'start_uv': jnp.asarray(start_uv, jnp.float32),
        'end_uv': jnp.asarray(end_uv, jnp.float32),
        'start_dir': jnp.zeros((1,), jnp.float32),
        'end_dir': jnp.zeros((1,), jnp.float32),
        'sil_spline': make_spline(key_size, init_height),
    }


def _fin_root_uvs(params, lod_x):
    s = jnp.clip(params['start_uv'], 0., 1.)
    e = jnp.clip(params['end_uv'], 0., 1.)
    return s + jnp.linspace(0., 1., lod_x)[:, None] * (e - s)


def fish_fin_vertices(params, body_vertices, body_lod, lod_x, lod_y,
                      z_scale=0.):
    """(1, lod_x*lod_y, 3) fin strip grown from the body surface.

    Root points sample the body at uv between start_uv and end_uv;
    growth directions are the xy-perpendicular of the root tangent
    scaled by the silhouette spline, rotated in-plane by angles lerped
    start_dir -> end_dir (``ian_fish_fin_mesh.py:315-404``). The first
    column keeps the reference's seam semantics: its growth vector is
    the raw (unscaled) first tangent. ``z_scale`` adds sideways growth
    (the reference's pectoral-fin ``z_scale`` attribute).
    """
    root_uvs = _fin_root_uvs(params, lod_x)
    roots = position_by_uv(body_vertices, body_lod[0], body_lod[1],
                           root_uvs)                        # (lod_x, 3)
    ys = spline_ys_lod(params['sil_spline'], lod_x)
    tang = roots[1:] - roots[:-1]                           # (lod_x-1, 3)
    perp = jnp.stack([-tang[:, 1], tang[:, 0],
                      jnp.zeros_like(tang[:, 0])], -1)
    # safe normalize: lax.rsqrt(max(n2, eps)) keeps the gradient finite
    # at zero-length tangents (degenerate start_uv == end_uv inits NaN
    # through jnp.linalg.norm's backward otherwise)
    n2 = jnp.sum(perp * perp, -1, keepdims=True)
    perp = perp * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    # the xy-perpendicular has z = 0, so z is always ys * z_scale
    # (identically 0 without a z_scale, as in the reference)
    grow = jnp.stack([perp[:, 0] * ys[1:], perp[:, 1] * ys[1:],
                      ys[1:] * z_scale], -1)
    grow = jnp.concatenate([tang[:1], grow], 0)             # (lod_x, 3)
    angles = (params['start_dir']
              + jnp.linspace(0., 1., lod_x)[:, None]
              * (params['end_dir'] - params['start_dir']))[:, 0]
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    grow = jnp.stack([grow[:, 0] * ca - grow[:, 1] * sa,
                      grow[:, 0] * sa + grow[:, 1] * ca,
                      grow[:, 2]], -1)
    frac_y = jnp.linspace(0., 1., lod_y)[None, :, None]
    verts = roots[:, None, :] + frac_y * grow[:, None, :]
    return verts.reshape(1, lod_x * lod_y, 3)


def uv_bound_loss(params):
    """Squared penalty for uv anchors outside [0, 1]
    (``ian_fish_fin_mesh.py:207-228``)."""
    def exceed(uv):
        return (jnp.sum(jnp.square(jnp.maximum(uv - 1., 0.)))
                + jnp.sum(jnp.square(jnp.maximum(-uv, 0.))))
    return exceed(params['start_uv']) + exceed(params['end_uv'])


# ------------------------------------------------------------- uv atlasing

def uv_grid_boxes(n_meshes):
    """Square-grid texture-atlas boxes (u0, v0, size, size)
    (``ian_fish_optimizer.py:243-254``)."""
    g = math.ceil(math.sqrt(n_meshes))
    s = 1. / g
    return [(u * s, v * s, s, s)
            for u in range(g) for v in range(g)][:n_meshes]


class FishMesh:
    """Adapter exposing the Renderer mesh protocol (vertices, faces,
    face_uvs, texture_map) over a generated card."""

    def __init__(self, vertices, faces, uvs, face_uvs_idx, uv_box=None):
        self.vertices = vertices
        self.faces = jnp.asarray(faces)
        if uv_box is not None:
            u0, v0, su, sv = uv_box
            uvs = uvs * jnp.asarray([su, sv]) + jnp.asarray([u0, v0])
        self.uvs = uvs
        self.face_uvs_idx = jnp.asarray(face_uvs_idx)
        self.face_uvs = kal.ops.mesh.index_vertices_by_faces(
            jnp.asarray(uvs), self.face_uvs_idx)
        self.texture_map = None


# ---------------------------------------------------------------- json i/o

def _tolist(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x).tolist(), tree)


def fish_params_to_json(path, body, fins, hyper=None):
    """Exports body/fin parameter pytrees (+hyperparameters) to JSON
    (``ian_fish_optimizer.py:609-625``)."""
    with open(path, 'w') as f:
        json.dump({'body': _tolist(body), 'fins': _tolist(fins),
                   'hyperparameter': hyper or {}}, f, indent=1)


def fish_params_from_json(path):
    with open(path) as f:
        blob = json.load(f)

    def asarrays(tree):
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), tree)

    return (asarrays(blob['body']), asarrays(blob['fins']),
            blob.get('hyperparameter', {}))


# ----------------------------------------------------------------- fitting

def _project_points(points, meta):
    """Projects (K, 3) world points to [0, 1]^2 image coords under the
    data view (``ian_renderer.py:project_vertices_with_camera_params``)."""
    transform = utils.get_camera_transform_from_view(
        meta['cam_elev'], meta['cam_azim'], meta['cam_radius'],
        meta['cam_look_at_height'])
    proj = utils.get_camera_projection(meta['cam_fovyangle'])
    padded = jnp.pad(points[None], ((0, 0), (0, 0), (0, 1)),
                     constant_values=1.)
    cam = jnp.matmul(padded, transform)
    img = kal.render.camera.perspective_camera(cam, proj)[0]
    return (img + 1.) / 2.


def _render_soft_mask(verts, faces, meta, height, width):
    transform = utils.get_camera_transform_from_view(
        meta['cam_elev'], meta['cam_azim'], meta['cam_radius'],
        meta['cam_look_at_height'])
    proj = utils.get_camera_projection(meta['cam_fovyangle'])
    fvc, fvi, fn = kal.render.mesh.prepare_vertices(
        verts, faces, proj, camera_transform=transform)
    attrs = [jnp.ones((1, faces.shape[0], 3, 1))]
    (feat,), soft_mask, face_idx = kal.render.mesh.dibr_rasterization(
        height, width, fvc[..., 2], fvi, attrs, fn[..., 2],
        sigmainv=meta['sigmainv'])
    return soft_mask, face_idx


def fit_fish(data, hyper, fin_z_scales=None):
    """Staged single-view fish fit: body silhouette -> fins -> texture.

    ``data``: dict with 'rgb' (H, W, 3), 'body_mask' (H, W), per-fin
    '<fin>_mask', 'root_segmentation' {name: [[x0,y0],[x1,y1]] in [0,1]
    image coords}, and 'metadata' (cam_elev/azim/radius/look_at_height/
    fovyangle, sigmainv). Returns (body, fins, texture, history).
    """
    meta = data['metadata']
    H, W = data['body_mask'].shape
    lod_x, lod_y = hyper['lod_x'], hyper['lod_y']
    key_size = hyper['key_size']
    fin_inits = hyper.get('fin_init_uv', {})
    fins = {name: make_fin_params(
                key_size, *fin_inits.get(name, ((0.4, 1.), (0.6, 1.))),
                init_height=hyper.get('fin_init_height', 0.2))
            for name in hyper['fin_list']}
    body = make_body_params(key_size, hyper.get('init_height', 1.0))
    z_scales = fin_z_scales or {}
    faces_np, uvs_np, fuv_np = card_topology(lod_x, lod_y)
    faces = jnp.asarray(faces_np)
    history = []

    def schedule(lr):
        return optax.exponential_decay(
            lr, hyper.get('scheduler_step_size', 1000),
            hyper.get('scheduler_gamma', 0.99), staircase=True)

    # ---- stage 1: body (alpha + negative-ys + root-position losses)
    gt_mask = jnp.asarray(data['body_mask'], jnp.float32)
    gt_roots = jnp.asarray(data['root_segmentation']['body_mask'],
                           jnp.float32)

    def body_loss(params):
        verts = fish_body_vertices(params, lod_x, lod_y)
        soft, _ = _render_soft_mask(verts, faces, meta, H, W)
        alpha = jnp.mean(jnp.abs(soft[0] - gt_mask))
        start, end = _body_endpoints(params)
        proj = _project_points(jnp.stack([start, end]), meta)
        root_pos = (jnp.mean(jnp.abs(proj[0] - gt_roots[0]))
                    + jnp.mean(jnp.abs(proj[1] - gt_roots[1])))
        neg = (negative_ys_loss(params['top_spline'], lod_x)
               + negative_ys_loss(params['bottom_spline'], lod_x))
        return (alpha * hyper['alpha_weight']
                + neg * hyper['negative_ys_weight']
                + root_pos * hyper['root_pos_weight'])

    opt = optax.adam(schedule(hyper.get('body_lr', 5e-3)))
    state = opt.init(body)

    @jax.jit
    def body_step(params, state):
        loss, g = jax.value_and_grad(body_loss)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    for _ in range(hyper['body_epochs']):
        body, state, loss = body_step(body, state)
        history.append(('body', float(loss)))

    body_verts = fish_body_vertices(body, lod_x, lod_y)

    # ---- stage 2: fins (alpha + negative-ys + uv-bound + root losses)
    def fin_loss(params, gt_fin_mask, gt_fin_roots, z_scale):
        verts = fish_fin_vertices(params, body_verts, (lod_x, lod_y),
                                  lod_x, lod_y, z_scale)
        soft, _ = _render_soft_mask(verts, faces, meta, H, W)
        alpha = jnp.mean(jnp.abs(soft[0] - gt_fin_mask))
        anchors = jnp.stack([jnp.clip(params['start_uv'], 0., 1.),
                             jnp.clip(params['end_uv'], 0., 1.)])
        pos = position_by_uv(body_verts, lod_x, lod_y, anchors)
        proj = _project_points(pos, meta)
        root_pos = (jnp.mean(jnp.abs(proj[0] - gt_fin_roots[0]))
                    + jnp.mean(jnp.abs(proj[1] - gt_fin_roots[1])))
        return (alpha * hyper['alpha_weight']
                + negative_ys_loss(params['sil_spline'], lod_x)
                * hyper['negative_ys_weight']
                + uv_bound_loss(params) * hyper['fin_uv_bound_weight']
                + root_pos * hyper['root_pos_weight'])

    fin_opt = optax.adam(schedule(hyper.get('fin_lr', 5e-3)))

    @jax.jit
    def fin_step(params, state, gt_fin_mask, gt_fin_roots, z_scale):
        loss, g = jax.value_and_grad(fin_loss)(params, gt_fin_mask,
                                               gt_fin_roots, z_scale)
        upd, state = fin_opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    for name in hyper['fin_list']:
        params = fins[name]
        state = fin_opt.init(params)
        gt_fin = jnp.asarray(data[name + '_mask'], jnp.float32)
        gt_fr = jnp.asarray(data['root_segmentation'][name + '_mask'],
                            jnp.float32)
        zs = jnp.asarray(z_scales.get(name, 0.), jnp.float32)
        for _ in range(hyper['fin_epochs']):
            params, state, loss = fin_step(params, state, gt_fin, gt_fr, zs)
            history.append((name, float(loss)))
        fins[name] = params

    # ---- stage 3: texture over the uv atlas (image L1)
    all_names = ['body'] + list(hyper['fin_list'])
    boxes = uv_grid_boxes(len(all_names))
    meshes = []
    for name, box in zip(all_names, boxes):
        if name == 'body':
            verts = body_verts
        else:
            verts = fish_fin_vertices(
                fins[name], body_verts, (lod_x, lod_y), lod_x, lod_y,
                float(z_scales.get(name, 0.)))
        meshes.append(FishMesh(verts, faces_np, jnp.asarray(uvs_np),
                               fuv_np, box))

    from .renderer import Renderer
    renderer = Renderer(1, (H, W))
    gt_rgb = jnp.asarray(data['rgb'], jnp.float32)
    texture = jnp.ones((1, 3, hyper['texture_res'], hyper['texture_res']),
                       jnp.float32)
    tex_opt = optax.adam(schedule(hyper.get('texture_lr', 5e-2)))
    tex_state = tex_opt.init(texture)
    cam_t = utils.get_camera_transform_from_view(
        meta['cam_elev'], meta['cam_azim'], meta['cam_radius'],
        meta['cam_look_at_height'])
    cam_p = utils.get_camera_projection(meta['cam_fovyangle'])

    def texture_loss(texture):
        loss = 0.
        for mesh in meshes:
            img, mask, _ = renderer.render_image_and_mask(
                cam_p, cam_t, H, W, mesh, meta['sigmainv'], texture)
            loss += jnp.mean(jnp.abs(img[0] - gt_rgb)) \
                * hyper['image_weight']
        return loss

    @jax.jit
    def tex_step(texture, state):
        loss, g = jax.value_and_grad(texture_loss)(texture)
        upd, state = tex_opt.update(g, state)
        return optax.apply_updates(texture, upd), state, loss

    for _ in range(hyper['texture_epochs']):
        texture, tex_state, loss = tex_step(texture, tex_state)
        history.append(('texture', float(loss)))

    return body, fins, texture, history


if __name__ == '__main__':
    # synthetic self-fit demo: render a ground-truth fish's masks, then
    # fit fresh parameters to them (see tests/test_fish.py for the
    # asserted version)
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--res', type=int, default=128)
    ap.add_argument('--epochs', type=int, default=100)
    args = ap.parse_args()

    lod_x, lod_y = 16, 8
    meta = {'cam_elev': 90., 'cam_azim': 0., 'cam_radius': 3.,
            'cam_look_at_height': 0., 'cam_fovyangle': 50.,
            'sigmainv': 7000}
    faces_np, _, _ = card_topology(lod_x, lod_y)
    faces = jnp.asarray(faces_np)
    gt_body = make_body_params(4, init_height=0.45)
    gt_body['origin_xy'] = jnp.asarray([-0.7, 0.1])
    gt_body['length_x'] = jnp.asarray(1.4)
    bv = fish_body_vertices(gt_body, lod_x, lod_y)
    body_soft, _ = _render_soft_mask(bv, faces, meta, args.res, args.res)
    gt_fin = make_fin_params(4, start_uv=(0.3, 1.), end_uv=(0.7, 1.),
                             init_height=0.35)
    fv = fish_fin_vertices(gt_fin, bv, (lod_x, lod_y), lod_x, lod_y)
    fin_soft, _ = _render_soft_mask(fv, faces, meta, args.res, args.res)
    start, end = _body_endpoints(gt_body)
    anchors = jnp.stack([gt_fin['start_uv'], gt_fin['end_uv']])
    data = {
        'rgb': np.tile(np.asarray(body_soft[0])[..., None], (1, 1, 3)) * .5,
        'body_mask': np.asarray(body_soft[0]),
        'dorsal_fin_mask': np.asarray(fin_soft[0]),
        'root_segmentation': {
            'body_mask': np.asarray(_project_points(
                jnp.stack([start, end]), meta)),
            'dorsal_fin_mask': np.asarray(_project_points(
                position_by_uv(bv, lod_x, lod_y, anchors), meta))},
        'metadata': meta,
    }
    hyper = {'lod_x': lod_x, 'lod_y': lod_y, 'key_size': 4,
             'init_height': 0.3, 'fin_list': ['dorsal_fin'],
             'alpha_weight': 200., 'negative_ys_weight': 0.9,
             'root_pos_weight': 100., 'fin_uv_bound_weight': 100.,
             'image_weight': 1., 'texture_res': 64,
             'body_epochs': args.epochs, 'fin_epochs': args.epochs // 2,
             'texture_epochs': 20, 'body_lr': 2e-2, 'fin_lr': 2e-2,
             'texture_lr': 0.1}
    body, fins, texture, history = fit_fish(data, hyper)
    for stage in ('body', 'dorsal_fin', 'texture'):
        losses = [l for s, l in history if s == stage]
        print(f'{stage}: {losses[0]:.4f} -> {losses[-1]:.4f} '
              f'({len(losses)} steps)')
