"""DefTet sparse render vs a naive numpy oracle; marching tetrahedra vs
the reference's doctest example and consistency between variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.mesh.deftet import deftet_sparse_render
from kaolin_tpu.ops.conversions import (marching_tetrahedra,
                                        marching_tetrahedra_fixed)


def naive_deftet(pixel_coords, render_ranges, fvz, fvi, ff, knum,
                 eps=1e-8):
    B, P, _ = pixel_coords.shape
    F = fvz.shape[1]
    D = ff.shape[-1]
    out_idx = np.full((B, P, knum), -1, dtype=np.int64)
    out_feat = np.zeros((B, P, knum, D))
    for b in range(B):
        fmin = fvi[b].min(1)
        fmax = fvi[b].max(1)
        for j in range(P):
            px, py = pixel_coords[b, j]
            cands = []
            for f in range(F):
                if not (fmin[f, 0] <= px < fmax[f, 0]
                        and fmin[f, 1] <= py < fmax[f, 1]):
                    continue
                (ax, ay), (bx, by), (cx, cy) = fvi[b, f]
                aex, aey = ax - px, ay - py
                bex, bey = bx - px, by - py
                cex, cey = cx - px, cy - py
                w0 = bex * cey - bey * cex
                w1 = cex * aey - cey * aex
                w2 = aex * bey - aey * bex
                norm = w0 + w1 + w2
                norm += eps * np.sign(norm)
                w0, w1, w2 = w0 / norm, w1 / norm, w2 / norm
                if w0 < 0 or w1 < 0 or w2 < 0:
                    continue
                depth = w0 * fvz[b, f, 0] + w1 * fvz[b, f, 1] \
                    + w2 * fvz[b, f, 2]
                if not (render_ranges[b, j, 0] < depth
                        < render_ranges[b, j, 1]):
                    continue
                cands.append((depth, f, (w0, w1, w2)))
            cands.sort(key=lambda c: -c[0])
            for k, (depth, f, w) in enumerate(cands[:knum]):
                out_idx[b, j, k] = f
                for dd in range(D):
                    out_feat[b, j, k, dd] = (w[0] * ff[b, f, 0, dd]
                                             + w[1] * ff[b, f, 1, dd]
                                             + w[2] * ff[b, f, 2, dd])
    return out_feat, out_idx


@pytest.fixture
def deftet_inputs():
    rng = np.random.default_rng(0)
    B, F, P = 2, 30, 50
    centers = rng.uniform(-0.7, 0.7, (B, F, 1, 2))
    fvi = centers + rng.uniform(-0.3, 0.3, (B, F, 3, 2))
    fvz = -rng.uniform(1., 3., (B, F, 3))
    ff = rng.normal(size=(B, F, 3, 4))
    pc = rng.uniform(-1., 1., (B, P, 2))
    rr = np.tile(np.array([-1e10, 0.]), (B, P, 1))
    return (jnp.asarray(pc), jnp.asarray(rr), jnp.asarray(fvz),
            jnp.asarray(fvi), jnp.asarray(ff))


def test_deftet_matches_naive(deftet_inputs):
    pc, rr, fvz, fvi, ff = deftet_inputs
    feat, idx = deftet_sparse_render(pc, rr, fvz, fvi, ff, knum=10)
    gt_feat, gt_idx = naive_deftet(np.asarray(pc), np.asarray(rr),
                                   np.asarray(fvz), np.asarray(fvi),
                                   np.asarray(ff), 10)
    np.testing.assert_array_equal(np.asarray(idx), gt_idx)
    np.testing.assert_allclose(np.asarray(feat), gt_feat, rtol=1e-5,
                               atol=1e-8)


def test_deftet_gradients(deftet_inputs):
    pc, rr, fvz, fvi, ff = deftet_inputs
    cot = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 50, 10, 4)))

    def loss(fvi_, ff_):
        feat, _ = deftet_sparse_render(pc, rr, fvz, fvi_, ff_, knum=10)
        return jnp.sum(feat * cot)

    g_img, g_feat = jax.grad(loss, argnums=(0, 1))(fvi, ff)
    assert bool(jnp.isfinite(g_img).all()) and bool(
        jnp.isfinite(g_feat).all())
    eps = 1e-6
    flat = np.asarray(ff).ravel()
    for k in [3, 100, 250]:
        d = np.zeros_like(flat)
        d[k] = eps
        fp = loss(fvi, jnp.asarray((flat + d).reshape(ff.shape)))
        fm = loss(fvi, jnp.asarray((flat - d).reshape(ff.shape)))
        np.testing.assert_allclose(float(np.asarray(g_feat).ravel()[k]),
                                   (float(fp) - float(fm)) / (2 * eps),
                                   rtol=1e-4, atol=1e-7)


def test_marching_tetrahedra_reference_example():
    vertices = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                           dtype=jnp.float64)
    tets = np.array([[0, 1, 2, 3]])
    sdf = jnp.asarray([[-1., -1., 0.5, 0.5]])
    verts_list, faces_list, tet_idx_list = marching_tetrahedra(
        vertices, tets, sdf, True)
    np.testing.assert_allclose(
        np.asarray(verts_list[0]),
        [[0., 2/3, 0.], [0., 0., 2/3], [1/3, 2/3, 0.], [1/3, 0., 2/3]],
        atol=1e-6)
    np.testing.assert_array_equal(np.asarray(faces_list[0]),
                                  [[3, 0, 1], [3, 2, 0]])
    np.testing.assert_array_equal(np.asarray(tet_idx_list[0]), [0, 0])


def test_marching_tetrahedra_fixed_consistency():
    """Fixed-capacity variant produces the same surface as the eager one."""
    rng = np.random.default_rng(0)
    # small tet grid from subdividing a cube into 6 tets per cell
    from kaolin_tpu.ops.mesh import subdivide_tetmesh
    verts0 = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                           [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]]],
                         dtype=jnp.float64)
    tets0 = np.array([[0, 1, 2, 3], [1, 4, 2, 5], [2, 6, 3, 5],
                      [1, 2, 3, 5], [2, 4, 7, 5], [2, 7, 6, 5]])
    verts, tets = subdivide_tetmesh(verts0, tets0)
    tets = np.asarray(tets)
    v = np.asarray(verts)[0]
    sdf = jnp.asarray(np.linalg.norm(v - 0.5, axis=-1) - 0.35)

    ev, ef = marching_tetrahedra(verts, tets, sdf[None])
    ev, ef = np.asarray(ev[0]), np.asarray(ef[0])

    fv, cross, ff, fmask, tidx = marching_tetrahedra_fixed(
        jnp.asarray(v), tets, sdf)
    fv, cross = np.asarray(fv), np.asarray(cross)
    ff, fmask = np.asarray(ff), np.asarray(fmask)
    # same number of active faces and crossing vertices
    assert fmask.sum() == ef.shape[0]
    assert cross.sum() == ev.shape[0]
    # vertex sets match
    active = np.sort(fv[cross], axis=0)
    np.testing.assert_allclose(active, np.sort(ev, axis=0), atol=1e-6)
    # each active face's vertex triple matches some eager face triple
    tri_fixed = np.sort(fv[ff[fmask]].reshape(-1, 9), axis=1)
    tri_eager = np.sort(ev[ef].reshape(-1, 9), axis=1)
    np.testing.assert_allclose(np.sort(tri_fixed, axis=0),
                               np.sort(tri_eager, axis=0), atol=1e-6)


def test_marching_tetrahedra_grad():
    vertices = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                           dtype=jnp.float64)
    tets = np.array([[0, 1, 2, 3]])

    def loss(sdf):
        v, c, f, fm, ti = marching_tetrahedra_fixed(vertices[0], tets, sdf)
        return jnp.sum(jnp.where(c[:, None], v, 0.) ** 2)

    sdf = jnp.asarray([-1., -1., 0.5, 0.5])
    g = jax.grad(loss)(sdf)
    assert bool(jnp.isfinite(g).all())
    eps = 1e-6
    for k in range(4):
        d = np.zeros(4)
        d[k] = eps
        fp = loss(sdf + jnp.asarray(d))
        fm = loss(sdf - jnp.asarray(d))
        np.testing.assert_allclose(float(np.asarray(g)[k]),
                                   (float(fp) - float(fm)) / (2 * eps),
                                   rtol=1e-5, atol=1e-9)


def test_deftet_pallas_topk_matches_xla():
    """The Pallas k-buffer selection (interpret mode on CPU) equals the
    XLA lax.top_k path bit-for-bit, ties included."""
    from kaolin_tpu.render.mesh.deftet import _select_topk
    rng = np.random.default_rng(7)
    B, P, F, K = 1, 200, 96, 17
    pc = jnp.asarray(rng.uniform(-1, 1, (B, P, 2)), jnp.float32)
    rr = jnp.stack([jnp.full((B, P), -1e6), jnp.zeros((B, P))],
                   -1).astype(jnp.float32)
    fvi = jnp.asarray(rng.uniform(-1, 1, (B, F, 3, 2)) * 0.5
                      + rng.uniform(-0.6, 0.6, (B, F, 1, 2)), jnp.float32)
    # duplicated faces -> exactly tied depths straddling the K boundary
    fvi = jnp.concatenate([fvi[:, :F // 2]] * 2, axis=1)
    fvz = jnp.asarray(-rng.uniform(0.5, 3.0, (B, F // 2, 3)), jnp.float32)
    fvz = jnp.concatenate([fvz] * 2, axis=1)
    valid = jnp.asarray(rng.random((B, F)) > 0.1)
    ref = _select_topk(pc, rr, fvz, fvi, valid, K, 1e-8, backend='xla',
                       tie_exact=True)
    out = _select_topk(pc, rr, fvz, fvi, valid, K, 1e-8,
                       backend='pallas_interpret')
    assert np.array_equal(np.asarray(ref), np.asarray(out))
