"""Extended mesh ops: adjacency/Laplacian algebraic properties,
check_sign on a genus-1 torus (the parity test's hard case), area
conservation under subdivision, and packed-vs-looped face areas."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

import kaolin_tpu as kal
from kaolin_tpu.ops.mesh import (adjacency_matrix, uniform_laplacian,
                                 index_vertices_by_faces, face_areas,
                                 packed_face_areas, face_normals,
                                 subdivide_trianglemesh, check_sign)


def icosphere(subdiv=2):
    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(subdiv):
        mid, nv, nf = {}, list(map(list, v)), []

        def mp(a, b):
            k = (min(a, b), max(a, b))
            if k not in mid:
                m = (v[a] + v[b]) / 2
                mid[k] = len(nv)
                nv.append(list(m / np.linalg.norm(m)))
            return mid[k]
        for a, b, c in f:
            ab, bc, ca = mp(a, b), mp(b, c), mp(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v, f = np.array(nv), np.array(nf)
    return (jnp.asarray(v, jnp.float32), jnp.asarray(f, jnp.int32))


def torus(R=0.6, r=0.25, nu=24, nv=12):
    iu, iv = np.meshgrid(np.arange(nu), np.arange(nv), indexing='ij')
    tu = iu / nu * 2 * np.pi
    tv = iv / nv * 2 * np.pi
    x = (R + r * np.cos(tv)) * np.cos(tu)
    y = (R + r * np.cos(tv)) * np.sin(tu)
    z = r * np.sin(tv)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [[a, b, c], [a, c, d]]
    return (jnp.asarray(verts, jnp.float32),
            jnp.asarray(np.asarray(faces), jnp.int32))


def test_adjacency_matrix_symmetric_and_degrees():
    v, f = icosphere(0)
    adj = np.asarray(adjacency_matrix(12, f))
    np.testing.assert_array_equal(adj, adj.T)
    assert (np.diag(adj) == 0).all()
    # icosahedron: every vertex has degree 5
    np.testing.assert_array_equal(adj.sum(1), np.full(12, 5.))
    # edge count: E = 3F/2 = 30
    assert adj.sum() == 60


def test_uniform_laplacian_annihilates_constants():
    v, f = icosphere(1)
    L = np.asarray(uniform_laplacian(v.shape[0], f))
    const = np.ones((v.shape[0], 3))
    np.testing.assert_allclose(L @ const, 0., atol=1e-6)
    # row sums zero; off-diagonals of a row sum to -diagonal
    np.testing.assert_allclose(L.sum(1), 0., atol=1e-6)


def test_index_vertices_by_faces_matches_numpy():
    v, f = icosphere(1)
    fv = np.asarray(index_vertices_by_faces(v[None], f))
    np.testing.assert_array_equal(fv[0], np.asarray(v)[np.asarray(f)])


def test_subdivision_alpha_zero_pins_original_vertices():
    """alpha=0 pins the original vertices exactly (the reference's
    differentiable-alpha contract); each round quadruples the faces
    and the total area stays within the Loop-smoothing envelope."""
    v, f = icosphere(1)
    a0 = float(face_areas(v[None], f).sum())
    nv_, nf_ = subdivide_trianglemesh(v[None], f, 1,
                                      alpha=jnp.zeros((1, v.shape[0], 1)))
    np.testing.assert_allclose(np.asarray(nv_)[0, :v.shape[0]],
                               np.asarray(v), atol=1e-7)
    a1 = float(face_areas(nv_, nf_).sum())
    assert abs(a1 - a0) / a0 < 0.1
    assert nf_.shape[0] == 4 * f.shape[0]


def test_packed_face_areas_matches_batched():
    v1, f1 = icosphere(0)
    v2, f2 = torus()
    packed_v = jnp.concatenate([v1, v2])
    first_idx = jnp.asarray([0, v1.shape[0], v1.shape[0] + v2.shape[0]])
    packed_f = jnp.concatenate([f1, f2])
    nfp = jnp.asarray([f1.shape[0], f2.shape[0]])
    pa = np.asarray(packed_face_areas(packed_v, first_idx, packed_f, nfp))
    ref = np.concatenate([np.asarray(face_areas(v1[None], f1))[0],
                          np.asarray(face_areas(v2[None], f2))[0]])
    np.testing.assert_allclose(pa, ref, rtol=1e-5)


def test_face_normals_outward_on_sphere():
    v, f = icosphere(1)
    fv = index_vertices_by_faces(v[None], f)
    n = np.asarray(face_normals(fv, unit=True))[0]
    centers = np.asarray(fv[0]).mean(1)
    # outward: normal . center > 0 for a centered sphere
    assert (np.einsum('fd,fd->f', n, centers) > 0).all()
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1., rtol=1e-5)


def test_check_sign_torus_hole():
    """A genus-1 torus: points in the TUBE are inside, points in the
    central HOLE are outside — the case a bounding-volume test would
    get wrong and ray parity must get right."""
    v, f = torus()
    pts = jnp.asarray([
        [0.6, 0.0, 0.0],          # tube center: inside
        [0.0, 0.6, 0.0],          # tube center, other side: inside
        [0.0, 0.0, 0.0],          # central hole: outside
        [0.0, 0.0, 0.2],          # above the hole: outside
        [1.2, 0.0, 0.0],          # beyond: outside
    ], jnp.float32)[None]
    sign = np.asarray(check_sign(v[None], f, pts))[0]
    np.testing.assert_array_equal(sign, [True, True, False, False, False])


def test_check_sign_agrees_with_analytic_torus():
    v, f = torus(nu=48, nv=24)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    d = np.sqrt((np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2) - 0.6) ** 2
                + pts[:, 2] ** 2)
    margin = 0.05                 # skip near-surface ambiguity
    keep = np.abs(d - 0.25) > margin
    expected = d[keep] < 0.25
    sign = np.asarray(check_sign(v[None], f,
                                 jnp.asarray(pts[keep])[None]))[0]
    np.testing.assert_array_equal(sign, expected)
