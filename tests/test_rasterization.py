"""Rasterizer correctness: XLA backend vs an independent naive numpy
implementation of the reference contract
(``kaolin/csrc/render/mesh/rasterization_cuda.cu``), plus finite-difference
gradient checks of the analytic custom VJP.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.mesh import rasterize


def naive_rasterize(height, width, fvz, fvi, ff, valid=None,
                    multiplier=1000., eps=1e-8):
    """Slow per-pixel loop replicating rasterization_cuda.cu semantics."""
    B, F, _ = fvz.shape
    D = ff.shape[-1]
    out_feat = np.zeros((B, height, width, D))
    out_idx = np.full((B, height, width), -1, dtype=np.int64)
    out_w = np.zeros((B, height, width, 3))
    img = np.asarray(fvi) * multiplier
    for b in range(B):
        for hy in range(height):
            for wx in range(width):
                x0 = multiplier / width * (2 * wx + 1 - width)
                y0 = multiplier / height * (height - 2 * hy - 1)
                max_z = -np.inf
                sel = -1
                selw = None
                for f in range(F):
                    if valid is not None and not valid[b, f]:
                        continue
                    verts = img[b, f]
                    xmin, ymin = verts.min(axis=0)
                    xmax, ymax = verts.max(axis=0)
                    if x0 < xmin or x0 >= xmax or y0 < ymin or y0 >= ymax:
                        continue
                    (ax, ay), (bx, by), (cx, cy) = verts
                    aex, aey = ax - x0, ay - y0
                    bex, bey = bx - x0, by - y0
                    cex, cey = cx - x0, cy - y0
                    w0 = bex * cey - bey * cex
                    w1 = cex * aey - cey * aex
                    w2 = aex * bey - aey * bex
                    norm = w0 + w1 + w2
                    norm += np.copysign(eps, norm)
                    w0, w1, w2 = w0 / norm, w1 / norm, w2 / norm
                    if w0 < 0 or w1 < 0 or w2 < 0:
                        continue
                    z0 = (w0 * fvz[b, f, 0] + w1 * fvz[b, f, 1]
                          + w2 * fvz[b, f, 2])
                    if z0 <= max_z:
                        continue
                    max_z = z0
                    sel = f
                    selw = (w0, w1, w2)
                if sel >= 0:
                    out_idx[b, hy, wx] = sel
                    out_w[b, hy, wx] = selw
                    for d in range(D):
                        out_feat[b, hy, wx, d] = (
                            selw[0] * ff[b, sel, 0, d]
                            + selw[1] * ff[b, sel, 1, d]
                            + selw[2] * ff[b, sel, 2, d])
    return out_feat, out_idx, out_w


@pytest.fixture
def simple_inputs():
    # same geometry as the reference simple DIB-R test
    # (tests/python/kaolin/render/mesh/test_dibr.py:44-61)
    fvi = jnp.asarray([
        [[[-0.7, 0.], [0., -0.7], [0., 0.7]],
         [[-0.7, 0.], [0., 0.7], [0., -0.7]],
         [[0., -0.7], [0., 0.7], [0.7, 0.]]],
        [[[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]],
         [[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]],
         [[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]]]], dtype=jnp.float64)
    fvz = jnp.asarray([
        [[-2., -1., -1.],
         [-2.5, -3., -3.],
         [-2., -2., -2.]],
        [[-2., -1., -3.],
         [-2., -2., -2.],
         [-2., -3., -1.]]], dtype=jnp.float64)
    rng = np.random.default_rng(42)
    ff = jnp.asarray(rng.normal(size=(2, 3, 3, 4)), dtype=jnp.float64)
    return fvz, fvi, ff


@pytest.mark.parametrize('height,width', [(35, 31), (16, 16)])
def test_rasterize_matches_naive(simple_inputs, height, width):
    fvz, fvi, ff = simple_inputs
    feat, idx = rasterize(height, width, fvz, fvi, ff, backend='xla')
    gt_feat, gt_idx, _ = naive_rasterize(height, width, np.asarray(fvz),
                                         np.asarray(fvi), np.asarray(ff))
    np.testing.assert_array_equal(np.asarray(idx), gt_idx)
    np.testing.assert_allclose(np.asarray(feat), gt_feat, rtol=1e-6,
                               atol=1e-10)


def test_rasterize_valid_faces(simple_inputs):
    fvz, fvi, ff = simple_inputs
    valid = jnp.asarray([[True, False, True], [False, True, True]])
    feat, idx = rasterize(17, 19, fvz, fvi, ff, valid_faces=valid,
                          backend='xla')
    gt_feat, gt_idx, _ = naive_rasterize(17, 19, np.asarray(fvz),
                                         np.asarray(fvi), np.asarray(ff),
                                         valid=np.asarray(valid))
    np.testing.assert_array_equal(np.asarray(idx), gt_idx)
    np.testing.assert_allclose(np.asarray(feat), gt_feat, rtol=1e-6,
                               atol=1e-10)


def test_rasterize_multi_features(simple_inputs):
    fvz, fvi, ff = simple_inputs
    feats = (ff[..., :1], ff[..., 1:])
    out, idx = rasterize(16, 16, fvz, fvi, feats, backend='xla')
    full, _ = rasterize(16, 16, fvz, fvi, ff, backend='xla')
    assert isinstance(out, tuple) and len(out) == 2
    np.testing.assert_allclose(np.asarray(jnp.concatenate(out, -1)),
                               np.asarray(full))


def test_rasterize_grad_finite_difference(simple_inputs):
    """Finite differences vs the analytic VJP, away from coverage edges."""
    fvz, fvi, ff = simple_inputs
    H = W = 16
    rng = np.random.default_rng(7)
    cot = jnp.asarray(rng.normal(size=(2, H, W, 4)), dtype=jnp.float64)

    @jax.jit
    def loss_img(fvi_):
        feat, _ = rasterize(H, W, fvz, fvi_, ff, backend='xla')
        return jnp.sum(feat * cot)

    @jax.jit
    def loss_feat(ff_):
        feat, _ = rasterize(H, W, fvz, fvi, ff_, backend='xla')
        return jnp.sum(feat * cot)

    g_img = jax.grad(loss_img)(fvi)
    g_feat = jax.grad(loss_feat)(ff)

    # feature grads are exactly linear -> tight check
    epsf = 1e-6
    num = np.zeros_like(np.asarray(g_feat))
    flat = np.asarray(ff).ravel()
    for k in range(flat.size):
        d = np.zeros_like(flat)
        d[k] = epsf
        fp = loss_feat(jnp.asarray((flat + d).reshape(ff.shape)))
        fm = loss_feat(jnp.asarray((flat - d).reshape(ff.shape)))
        num.ravel()[k] = (float(fp) - float(fm)) / (2 * epsf)
    np.testing.assert_allclose(np.asarray(g_feat), num, rtol=1e-4, atol=1e-6)

    # vertex grads: compare only where the coverage map (face_idx) is
    # unchanged under the perturbation — the analytic grad follows the
    # reference's fixed-coverage convention (coverage flips are
    # non-differentiable jumps by construction)
    @jax.jit
    def idx_map(fvi_):
        _, idx = rasterize(H, W, fvz, fvi_, ff, backend='xla')
        return idx

    base_idx = np.asarray(idx_map(fvi))
    epsv = 1e-6
    flat = np.asarray(fvi).ravel()
    checked = 0
    for k in range(flat.size):
        d = np.zeros_like(flat)
        d[k] = epsv
        xp = jnp.asarray((flat + d).reshape(fvi.shape))
        xm = jnp.asarray((flat - d).reshape(fvi.shape))
        if not (np.array_equal(np.asarray(idx_map(xp)), base_idx)
                and np.array_equal(np.asarray(idx_map(xm)), base_idx)):
            continue
        num_g = (float(loss_img(xp)) - float(loss_img(xm))) / (2 * epsv)
        ana_g = float(np.asarray(g_img).ravel()[k])
        np.testing.assert_allclose(ana_g, num_g, rtol=5e-3, atol=1e-5)
        checked += 1
    assert checked >= flat.size * 0.3, f"only {checked}/{flat.size} checked"


def test_pallas_interpret_matches_xla(simple_inputs):
    """The Pallas kernel path (interpret mode on CPU) vs the XLA backend."""
    fvz, fvi, ff = simple_inputs
    fvz32, fvi32, ff32 = (x.astype(jnp.float32) for x in (fvz, fvi, ff))
    feat_x, idx_x = rasterize(16, 128, fvz32, fvi32, ff32, backend='xla')
    feat_p, idx_p = rasterize(16, 128, fvz32, fvi32, ff32,
                              backend='pallas_interpret')
    np.testing.assert_array_equal(np.asarray(idx_x), np.asarray(idx_p))
    np.testing.assert_allclose(np.asarray(feat_x), np.asarray(feat_p),
                               rtol=1e-6, atol=1e-6)


def test_pallas_backward_matches_xla(simple_inputs):
    """Pallas band-accumulation backward (interpret) vs XLA segment_sum."""
    fvz, fvi, ff = simple_inputs
    rng = np.random.default_rng(5)
    H, W = 16, 128
    cot = jnp.asarray(rng.normal(size=(2, H, W, 4)))

    def mkloss(backend):
        def loss(fvi_, ff_):
            feat, _ = rasterize(H, W, fvz, fvi_, ff_, backend=backend)
            return jnp.sum(feat * cot)
        return loss

    gx = jax.grad(mkloss('xla'), argnums=(0, 1))(fvi, ff)
    gp = jax.grad(mkloss('pallas_interpret'), argnums=(0, 1))(fvi, ff)
    np.testing.assert_allclose(np.asarray(gx[0]), np.asarray(gp[0]),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]),
                               rtol=1e-6, atol=1e-9)


def test_pallas_face_segments_match_xla(monkeypatch):
    """Face counts beyond F_SEG stream the packed face table through the
    kernel in segments (the 20k-face ShapeNet scale VMEM fix): force
    S > 1 with a tiny F_SEG and check bit-parity with the XLA backend,
    fwd + bwd."""
    from kaolin_tpu.kernels import rasterize as rast_mod
    from kaolin_tpu.kernels import rasterize_bwd as rast_bwd_mod
    monkeypatch.setattr(rast_mod, 'F_SEG', 64)
    monkeypatch.setattr(rast_bwd_mod, 'F_SEG', 64)
    rng = np.random.default_rng(7)
    F = 200                      # -> 4 segments of 64 (padded 256)
    fvi = jnp.asarray(rng.uniform(-0.8, 0.8, (1, F, 1, 2))
                      + rng.uniform(-0.25, 0.25, (1, F, 3, 2)),
                      jnp.float32)
    fvz = jnp.asarray(-(rng.uniform(1.5, 3.0, (1, F, 1))
                        * np.ones((1, 1, 3))), jnp.float32)
    ff = jnp.asarray(rng.normal(size=(1, F, 3, 2)), jnp.float32)

    feat_x, idx_x = rasterize(16, 128, fvz, fvi, ff, backend='xla')
    feat_p, idx_p = rasterize(16, 128, fvz, fvi, ff,
                              backend='pallas_interpret')
    assert int(jnp.sum(idx_x >= 0)) > 50       # plenty of coverage
    np.testing.assert_array_equal(np.asarray(idx_x), np.asarray(idx_p))
    np.testing.assert_allclose(np.asarray(feat_x), np.asarray(feat_p),
                               rtol=1e-6, atol=1e-6)

    def loss(backend):
        def f(fvi, ff):
            feat, _ = rasterize(16, 128, fvz, fvi, ff, backend=backend)
            return jnp.sum(feat ** 2)
        return f
    gx = jax.grad(loss('xla'), argnums=(0, 1))(fvi, ff)
    gp = jax.grad(loss('pallas_interpret'), argnums=(0, 1))(fvi, ff)
    # fwd is bit-exact; bwd sums hundreds of per-pixel contributions in
    # a different order (per-band sequential vs segment_sum) -> f32
    # accumulation noise (measured max rel ~6e-6 at this scale)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
