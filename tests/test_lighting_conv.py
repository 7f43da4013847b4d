"""SH/SG lighting and SPC convolutions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.lighting import (project_onto_sh9, sh9_irradiance,
                                        sh9_diffuse, sg_diffuse_inner_product,
                                        sg_warp_specular_term,
                                        unbatched_sg_inner_product,
                                        unbatched_reduced_sg_inner_product,
                                        sg_irradiance_fitted)
from kaolin_tpu.ops.spc import (quantize_points, unbatched_points_to_octree,
                                scan_octrees, generate_points, conv3d,
                                conv_transpose3d, to_dense,
                                unbatched_get_level_points)


def test_project_onto_sh9_z():
    out = np.asarray(project_onto_sh9(jnp.asarray([0., 0., 1.])))
    assert out.shape == (9,)
    np.testing.assert_allclose(out[0], 0.28209479177, rtol=1e-6)
    np.testing.assert_allclose(out[2], 0.4886025119, rtol=1e-6)
    np.testing.assert_allclose(out[6], 0.94617469575 - 0.31539156525,
                               rtol=1e-5)


def test_sh9_irradiance_cosine_like():
    # light along +z: irradiance maximal for normals facing +z
    lights = project_onto_sh9(jnp.asarray([0., 0., 1.]))
    normals = jnp.asarray([[0., 0., 1.], [0., 0., -1.], [1., 0., 0.]])
    irr = np.asarray(sh9_irradiance(lights, normals))
    assert irr[0] > irr[2] > irr[1]
    d = sh9_diffuse(jnp.asarray([0., 0., 1.]), normals,
                    jnp.ones((3, 3)))
    assert np.asarray(d).shape == (3, 3)


def test_reduced_sg_inner_product_matches_sum():
    rng = np.random.default_rng(0)
    ns, no = 7, 1200
    a = jnp.asarray(np.abs(rng.normal(size=(ns, 3))), jnp.float32)
    d = jnp.asarray(rng.normal(size=(ns, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    s = jnp.asarray(np.abs(rng.normal(size=(ns,))) + 1., jnp.float32)
    oa = jnp.asarray(np.abs(rng.normal(size=(no, 3))), jnp.float32)
    od = jnp.asarray(rng.normal(size=(no, 3)), jnp.float32)
    od = od / jnp.linalg.norm(od, axis=-1, keepdims=True)
    os_ = jnp.asarray(np.abs(rng.normal(size=(no,))) + 1., jnp.float32)
    full = np.asarray(unbatched_sg_inner_product(a, d, s, oa, od, os_)
                      ).sum(1)
    red = np.asarray(unbatched_reduced_sg_inner_product(a, d, s, oa, od,
                                                        os_))
    np.testing.assert_allclose(red, full, rtol=1e-4, atol=1e-4)


def test_sg_diffuse_and_specular_finite():
    rng = np.random.default_rng(1)
    n = 16
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = jnp.asarray(normals, jnp.float32)
    amp = jnp.asarray(np.abs(rng.normal(size=(4, 3))), jnp.float32)
    dirs = rng.normal(size=(4, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs, jnp.float32)
    sharp = jnp.asarray(np.abs(rng.normal(size=(4,))) + 2., jnp.float32)
    albedo = jnp.ones((n, 3)) * 0.5
    diff = sg_diffuse_inner_product(amp, dirs, sharp, normals, albedo)
    assert bool(jnp.isfinite(diff).all()) and bool((diff >= 0).all())
    fitted = sg_irradiance_fitted(amp, dirs, sharp, normals)
    assert bool(jnp.isfinite(fitted).all())
    view = normals  # viewing along normals
    rough = jnp.full((n,), 0.4)
    spec = sg_warp_specular_term(amp, dirs, sharp, normals, rough, view,
                                 albedo)
    assert bool(jnp.isfinite(spec).all()) and bool((spec >= 0).all())


@pytest.fixture(scope='module')
def spc_grid():
    """Dense level-3 SPC so dense-conv comparison is exact."""
    level = 3
    res = 2 ** level
    ii, jj, kk = np.meshgrid(*([np.arange(res)] * 3), indexing='ij')
    pts = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    octree = unbatched_points_to_octree(jnp.asarray(pts, jnp.int16), level)
    lengths = np.array([len(np.asarray(octree))])
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    return octree, ph, pyramids, exsum, level, res


def test_conv3d_matches_dense(spc_grid):
    octree, ph, pyramids, exsum, level, res = spc_grid
    rng = np.random.default_rng(0)
    n_in = int(pyramids[0, 0, level])
    Cin, Cout = 2, 3
    feats = jnp.asarray(rng.normal(size=(n_in, Cin)), jnp.float32)
    kv = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                   [-1, 0, 0]])
    w = jnp.asarray(rng.normal(size=(len(kv), Cin, Cout)), jnp.float32)
    out, out_level = conv3d(octree, ph, level, pyramids, exsum, feats, w,
                            kv, jump=0)
    assert out_level == level
    # dense check
    pts = np.asarray(unbatched_get_level_points(ph, pyramids[0], level))
    dense = np.zeros((res, res, res, Cin), np.float32)
    dense[pts[:, 0], pts[:, 1], pts[:, 2]] = np.asarray(feats)
    expected = np.zeros((res, res, res, Cout), np.float32)
    for k, off in enumerate(kv):
        src_lo = np.maximum(off, 0)
        src_hi = res + np.minimum(off, 0)
        dst_lo = np.maximum(-off, 0)
        dst_hi = res + np.minimum(-off, 0)
        # value at p comes from dense[p + off]
        sl_src = tuple(slice(int(l), int(h)) for l, h in zip(src_lo, src_hi))
        sl_dst = tuple(slice(int(l), int(h)) for l, h in zip(dst_lo, dst_hi))
        tmp = np.zeros_like(dense)
        tmp[sl_dst] = dense[sl_src]
        expected += tmp @ np.asarray(w[k])
    got = np.zeros_like(expected)
    got[pts[:, 0], pts[:, 1], pts[:, 2]] = np.asarray(out)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_conv3d_jump_downsample(spc_grid):
    octree, ph, pyramids, exsum, level, res = spc_grid
    rng = np.random.default_rng(1)
    n_in = int(pyramids[0, 0, level])
    feats = jnp.asarray(rng.normal(size=(n_in, 2)), jnp.float32)
    kv = np.array([[dx, dy, dz] for dx in range(2) for dy in range(2)
                   for dz in range(2)])
    w = jnp.asarray(rng.normal(size=(8, 2, 4)), jnp.float32)
    out, out_level = conv3d(octree, ph, level, pyramids, exsum, feats, w,
                            kv, jump=1)
    assert out_level == level - 1
    n_out = int(pyramids[0, 0, level - 1])
    assert out.shape == (n_out, 4)
    # stride-2 dense conv equivalent (sum over the 2x2x2 children)
    pts = np.asarray(unbatched_get_level_points(ph, pyramids[0], level))
    dense = np.zeros((res, res, res, 2), np.float32)
    dense[pts[:, 0], pts[:, 1], pts[:, 2]] = np.asarray(feats)
    coarse_pts = np.asarray(unbatched_get_level_points(ph, pyramids[0],
                                                       level - 1))
    for i, cp in enumerate(coarse_pts[:10]):
        acc = np.zeros(4, np.float32)
        for k, off in enumerate(kv):
            q = 2 * cp + off
            acc += dense[q[0], q[1], q[2]] @ np.asarray(w[k])
        np.testing.assert_allclose(np.asarray(out)[i], acc, rtol=1e-4,
                                   atol=1e-5)


def test_conv_transpose_adjoint(spc_grid):
    """<conv(x), y> == <x, conv_transpose(y)> for matching kernels."""
    octree, ph, pyramids, exsum, level, res = spc_grid
    rng = np.random.default_rng(2)
    n_fine = int(pyramids[0, 0, level])
    n_coarse = int(pyramids[0, 0, level - 1])
    Cin, Cout = 2, 3
    x = jnp.asarray(rng.normal(size=(n_fine, Cin)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n_coarse, Cout)), jnp.float32)
    kv = np.array([[dx, dy, dz] for dx in range(2) for dy in range(2)
                   for dz in range(2)])
    w = jnp.asarray(rng.normal(size=(8, Cin, Cout)), jnp.float32)
    cx, _ = conv3d(octree, ph, level, pyramids, exsum, x, w, kv, jump=1)
    wT = jnp.swapaxes(w, 1, 2)
    cty, lvl = conv_transpose3d(octree, ph, level - 1, pyramids, exsum, y,
                                wT, kv, jump=1)
    assert lvl == level
    lhs = float(jnp.sum(cx * y))
    rhs = float(jnp.sum(x * cty))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
