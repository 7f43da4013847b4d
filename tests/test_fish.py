"""Fish application layer: parametric card meshes + staged fitting.

Reference semantics: ``examples/tutorial/ian_fish_body_mesh.py``,
``ian_fish_fin_mesh.py``, ``ian_fish_optimizer.py``.
"""

import numpy as np
import jax.numpy as jnp

from examples import fish


def _reference_faces(lod_x, lod_y):
    """The reference's iterative quad-split loop
    (``ian_fish_body_mesh.py:285-296``), in numpy."""
    n = (lod_y - 1) * (lod_x - 1) * 2
    faces = np.zeros((n, 3), np.int64)
    faces[0] = [0, lod_y, 1]
    faces[1] = [1, lod_y, lod_y + 1]
    for t in range(2, n, 2):
        faces[t] = faces[t - 2] + 1
        faces[t + 1] = faces[t - 1] + 1
        if (t / 2) % (lod_y - 1) == 0:
            faces[t] += 1
            faces[t + 1] += 1
    return faces


def test_card_topology_matches_reference_loop():
    for lod_x, lod_y in [(3, 2), (5, 4), (40, 10)]:
        faces, uvs, fuv = fish.card_topology(lod_x, lod_y)
        np.testing.assert_array_equal(faces, _reference_faces(lod_x, lod_y))
        assert uvs.shape == (1, lod_x * lod_y, 2)
        np.testing.assert_array_equal(faces, fuv)
        # uv of vertex col*lod_y + row is (col/(lod_x-1), row/(lod_y-1))
        np.testing.assert_allclose(
            uvs[0, 1 * lod_y + 1], [1. / (lod_x - 1), 1. / (lod_y - 1)],
            atol=1e-7)


def test_body_vertices_geometry():
    p = fish.make_body_params(key_size=3, init_height=0.5)
    lod_x, lod_y = 5, 4
    v = np.asarray(fish.fish_body_vertices(p, lod_x, lod_y))[0]
    assert v.shape == (lod_x * lod_y, 3)
    np.testing.assert_allclose(v[:, 2], 0., atol=1e-7)     # flat card
    # column 0 bottom/top: origin -/+ spline height (flat splines = 0.5)
    np.testing.assert_allclose(v[0], [-1., -0.5, 0.], atol=1e-6)
    np.testing.assert_allclose(v[lod_y - 1], [-1., 0.5, 0.], atol=1e-6)
    # last column root x = origin_x + length_x
    np.testing.assert_allclose(v[-1], [1., 0.5, 0.], atol=1e-6)


def test_position_by_uv_bilinear():
    p = fish.make_body_params(key_size=3, init_height=0.5)
    lod_x, lod_y = 5, 4
    v = fish.fish_body_vertices(p, lod_x, lod_y)
    uvs = jnp.asarray([[0., 0.], [1., 1.], [0.5, 0.5], [0.25, 0.75]])
    pos = np.asarray(fish.position_by_uv(v, lod_x, lod_y, uvs))
    np.testing.assert_allclose(pos[0], np.asarray(v)[0, 0], atol=1e-6)
    np.testing.assert_allclose(pos[1], np.asarray(v)[0, -1], atol=1e-6)
    np.testing.assert_allclose(pos[2], [0., 0., 0.], atol=1e-6)
    np.testing.assert_allclose(pos[3], [-0.5, 0.25, 0.], atol=1e-6)


def test_fin_vertices_growth():
    body = fish.make_body_params(key_size=3, init_height=0.5)
    lod_x, lod_y = 9, 6
    bv = fish.fish_body_vertices(body, lod_x, lod_y)
    fin = fish.make_fin_params(3, start_uv=(0.25, 1.), end_uv=(0.75, 1.),
                               init_height=0.3)
    fv = np.asarray(fish.fish_fin_vertices(fin, bv, (lod_x, lod_y),
                                           lod_x, lod_y))[0]
    cols = fv.reshape(lod_x, lod_y, 3)
    # row 0 = roots on the body's top edge (y = 0.5)
    np.testing.assert_allclose(cols[:, 0, 1], 0.5, atol=1e-6)
    # columns past the seam grow perpendicular to the flat top edge
    # (straight up, height 0.3) — the seam column follows the tangent
    np.testing.assert_allclose(cols[1:, -1, 1] - cols[1:, 0, 1], 0.3,
                               atol=1e-5)
    np.testing.assert_allclose(cols[0, -1] - cols[0, 0],
                               cols[1, 0] - cols[0, 0], atol=1e-6)
    # z_scale grows sideways
    fvz = np.asarray(fish.fish_fin_vertices(fin, bv, (lod_x, lod_y),
                                            lod_x, lod_y, z_scale=0.5))[0]
    colz = fvz.reshape(lod_x, lod_y, 3)
    np.testing.assert_allclose(colz[1:, -1, 2], 0.3 * 0.5, atol=1e-5)


def test_uv_bound_and_negative_ys_losses():
    fin = fish.make_fin_params(3)
    assert float(fish.uv_bound_loss(fin)) == 0.
    fin['start_uv'] = jnp.asarray([1.5, -0.2])
    np.testing.assert_allclose(float(fish.uv_bound_loss(fin)),
                               0.5 ** 2 + 0.2 ** 2, rtol=1e-5)
    sp = fish.make_spline(4, init_ys=1.0)
    np.testing.assert_allclose(float(fish.negative_ys_loss(sp, 8)),
                               np.exp(-1.), rtol=1e-5)


def test_uv_grid_boxes():
    assert fish.uv_grid_boxes(1) == [(0., 0., 1., 1.)]
    boxes = fish.uv_grid_boxes(3)
    assert len(boxes) == 3 and boxes[0] == (0., 0., 0.5, 0.5)


def test_fish_params_json_roundtrip(tmp_path):
    body = fish.make_body_params(4)
    fins = {'dorsal_fin': fish.make_fin_params(4)}
    path = str(tmp_path / 'fish.json')
    fish.fish_params_to_json(path, body, fins, {'lod_x': 8})
    b2, f2, hyper = fish.fish_params_from_json(path)
    np.testing.assert_allclose(b2['origin_xy'], body['origin_xy'])
    np.testing.assert_allclose(f2['dorsal_fin']['sil_spline']['key_ys'],
                               fins['dorsal_fin']['sil_spline']['key_ys'])
    assert hyper['lod_x'] == 8


def test_fit_fish_synthetic_self_fit():
    """Generate a ground-truth fish, render its masks, fit fresh params:
    every stage's loss must drop and the fitted body must overlap GT."""
    lod_x, lod_y, res = 12, 6, 64
    meta = {'cam_elev': 90., 'cam_azim': 0., 'cam_radius': 3.,
            'cam_look_at_height': 0., 'cam_fovyangle': 50.,
            'sigmainv': 7000}
    faces_np, _, _ = fish.card_topology(lod_x, lod_y)
    faces = jnp.asarray(faces_np)

    gt_body = fish.make_body_params(3, init_height=0.45)
    gt_body['origin_xy'] = jnp.asarray([-0.7, 0.1])
    gt_body['length_x'] = jnp.asarray(1.4)
    bv = fish.fish_body_vertices(gt_body, lod_x, lod_y)
    body_soft, _ = fish._render_soft_mask(bv, faces, meta, res, res)
    gt_fin = fish.make_fin_params(3, start_uv=(0.3, 1.), end_uv=(0.7, 1.),
                                  init_height=0.35)
    fv = fish.fish_fin_vertices(gt_fin, bv, (lod_x, lod_y), lod_x, lod_y)
    fin_soft, _ = fish._render_soft_mask(fv, faces, meta, res, res)

    start, end = fish._body_endpoints(gt_body)
    body_roots = np.asarray(fish._project_points(jnp.stack([start, end]),
                                                 meta))
    anchors = jnp.stack([gt_fin['start_uv'], gt_fin['end_uv']])
    fin_roots = np.asarray(fish._project_points(
        fish.position_by_uv(bv, lod_x, lod_y, anchors), meta))

    data = {
        'rgb': np.tile(np.asarray(body_soft[0])[..., None], (1, 1, 3)) * 0.5,
        'body_mask': np.asarray(body_soft[0]),
        'dorsal_fin_mask': np.asarray(fin_soft[0]),
        'root_segmentation': {'body_mask': body_roots,
                              'dorsal_fin_mask': fin_roots},
        'metadata': meta,
    }
    hyper = {'lod_x': lod_x, 'lod_y': lod_y, 'key_size': 3,
             'init_height': 0.3, 'fin_list': ['dorsal_fin'],
             'alpha_weight': 200., 'negative_ys_weight': 0.9,
             'root_pos_weight': 100., 'fin_uv_bound_weight': 100.,
             'image_weight': 1., 'texture_res': 32,
             'body_epochs': 60, 'fin_epochs': 30, 'texture_epochs': 8,
             'body_lr': 2e-2, 'fin_lr': 2e-2, 'texture_lr': 0.1}

    body, fins, texture, history = fish.fit_fish(data, hyper)

    by_stage = {}
    for stage, loss in history:
        by_stage.setdefault(stage, []).append(loss)
    for stage, losses in by_stage.items():
        assert np.isfinite(losses).all(), stage
        assert losses[-1] < losses[0] * 0.9, \
            f'{stage}: {losses[0]} -> {losses[-1]}'

    fitted = fish.fish_body_vertices(body, lod_x, lod_y)
    fit_soft, _ = fish._render_soft_mask(fitted, faces, meta, res, res)
    a = np.asarray(fit_soft[0]) > 0.5
    b = np.asarray(body_soft[0]) > 0.5
    iou = (a & b).sum() / max((a | b).sum(), 1)
    assert iou > 0.7, f'body IoU {iou}'
