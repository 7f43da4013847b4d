"""Pallas TPU kernel for point-to-triangle-mesh closest-feature queries.

TPU-native replacement for the HBM-bound XLA scan in
``metrics/trianglemesh._select_faces`` (reference CUDA kernel
``kaolin/csrc/metrics/unbatched_triangle_distance_cuda.cu:238-479``).
Per-face geometry (vertices, edges, reciprocal edge norms, edge-plane
normals, unit face normal) is packed by an XLA prepass into a
(B, 40, F) constant table that lives in VMEM for the whole pass; the
kernel streams (T1, T2) point x face tiles through registers carrying
only a (T1, 1) running (distance, face*32+type) minimum.

Classification replicates ``_classify_and_distance``: the same six
region flags, the same *sum* of flags as the type code (so flag
overlaps produce the same summed code). All distances are computed in
GEOMETRIC form from per-pair deltas ``p - v`` (vertex ``|p-v|^2``,
edge ``|e*u - (p-v)|^2``, face ``(n.(p-v))^2``) — the algebraically
expanded ``|p|^2 - 2 p.v + |v|^2`` form loses ~1e-7 absolute to
cancellation, enough to misrank faces whose true distances are close
(observed 2%-relative winner errors at 4k x 2k random pairs). With the
geometric form, winners can differ from the XLA path only on genuine
float ties between equally-near features. Ties keep the lowest face
index (strict ``<`` across chunks, lowest lane within one).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['p2m_select_pallas']

T1 = 512      # points per grid step
T2 = 512      # faces per inner chunk
_BIG = 2 ** 30

# constant-table row indices
_E21, _E32, _E13 = 0, 3, 6
_INV21, _INV32, _INV13 = 9, 10, 11
_EN1, _EN2, _EN3 = 12, 15, 18
_V1, _V2, _V3 = 21, 24, 27
_UN = 30
_VALID = 33
_ROWS = 40


def face_constants(face_vertices):
    """(B, F, 3, 3) -> (B, 40, F) packed per-face constants."""
    v1 = face_vertices[..., 0, :]
    v2 = face_vertices[..., 1, :]
    v3 = face_vertices[..., 2, :]
    e21 = v2 - v1
    e32 = v3 - v2
    e13 = v1 - v3
    normals = -jnp.cross(e21, e13)
    unit_n = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    en1 = jnp.cross(normals, e21)
    en2 = jnp.cross(normals, e32)
    en3 = jnp.cross(normals, e13)

    def dot(a, b):
        return jnp.sum(a * b, axis=-1)

    rows = [
        e21[..., 0], e21[..., 1], e21[..., 2],
        e32[..., 0], e32[..., 1], e32[..., 2],
        e13[..., 0], e13[..., 1], e13[..., 2],
        1. / dot(e21, e21), 1. / dot(e32, e32), 1. / dot(e13, e13),
        en1[..., 0], en1[..., 1], en1[..., 2],
        en2[..., 0], en2[..., 1], en2[..., 2],
        en3[..., 0], en3[..., 1], en3[..., 2],
        v1[..., 0], v1[..., 1], v1[..., 2],
        v2[..., 0], v2[..., 1], v2[..., 2],
        v3[..., 0], v3[..., 1], v3[..., 2],
        unit_n[..., 0], unit_n[..., 1], unit_n[..., 2],
        jnp.ones_like(v1[..., 0]),
    ]
    rows += [jnp.zeros_like(rows[0])] * (_ROWS - len(rows))
    return jnp.stack(rows, axis=1)


def _p2m_kernel(p_ref, tbl_ref, out_ref, *, n2_chunks):
    px = p_ref[0, :, 0:1]
    py = p_ref[0, :, 1:2]
    pz = p_ref[0, :, 2:3]
    # region flags can overlap and the type code is their SUM
    # (e.g. 4 + 6 = 10 for a point above a shared vertex), so the
    # packed code reserves 5 bits for the type
    code32 = 32 * jax.lax.broadcasted_iota(jnp.int32, (T1, T2), 1)

    def row(k, c):
        return tbl_ref[0, k:k + 1, pl.ds(c * T2, T2)]

    def chunk(c, carry):
        best_d, best_c = carry

        def delta(k):       # p - v for vertex row base k
            return (px - row(k, c), py - row(k + 1, c), pz - row(k + 2, c))

        def dot3(a, k):     # a . table-vector at row base k
            return (a[0] * row(k, c) + a[1] * row(k + 1, c)
                    + a[2] * row(k + 2, c))

        def norm2(a):
            return a[0] * a[0] + a[1] * a[1] + a[2] * a[2]

        d1 = delta(_V1)
        d2 = delta(_V2)
        d3 = delta(_V3)
        uab_n = dot3(d1, _E21)
        ubc_n = dot3(d2, _E32)
        uca_n = dot3(d3, _E13)
        uab = uab_n * row(_INV21, c)
        ubc = ubc_n * row(_INV32, c)
        uca = uca_n * row(_INV13, c)
        below1 = dot3(d1, _EN1) <= 0.
        below2 = dot3(d2, _EN2) <= 0.
        below3 = dot3(d3, _EN3) <= 0.
        is1 = (uca > 1.) & (uab < 0.)
        is2 = (uab > 1.) & (ubc < 0.)
        is3 = (ubc > 1.) & (uca < 0.)
        is4 = (uab >= 0.) & (uab <= 1.) & below1
        is5 = (ubc >= 0.) & (ubc <= 1.) & below2
        is6 = (uca >= 0.) & (uca <= 1.) & below3
        t = (is1 * 1 + is2 * 2 + is3 * 3 + is4 * 4 + is5 * 5
             + is6 * 6).astype(jnp.int32)
        dv1 = norm2(d1)
        dv2 = norm2(d2)
        dv3 = norm2(d3)

        def edge_d(dx, u, k):   # |e*u - (p-v)|^2
            return norm2((row(k, c) * u - dx[0], row(k + 1, c) * u - dx[1],
                          row(k + 2, c) * u - dx[2]))

        de1 = edge_d(d1, uab, _E21)
        de2 = edge_d(d2, ubc, _E32)
        de3 = edge_d(d3, uca, _E13)
        dfn = dot3(d1, _UN)
        dfc = dfn * dfn
        d = jnp.where(t == 1, dv1,
            jnp.where(t == 2, dv2,
            jnp.where(t == 3, dv3,
            jnp.where(t == 4, de1,
            jnp.where(t == 5, de2,
            jnp.where(t == 6, de3, dfc))))))
        ok = (row(_VALID, c) > 0.5) & ~jnp.isnan(d)
        d = jnp.where(ok, d, jnp.inf)
        dmin = jnp.min(d, axis=1, keepdims=True)
        code = jnp.min(jnp.where(d == dmin, code32 + t, jnp.int32(_BIG)),
                       axis=1, keepdims=True)
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d),
                jnp.where(take, code + 32 * T2 * c, best_c))

    init = (jnp.full((T1, 1), jnp.inf, jnp.float32),
            jnp.zeros((T1, 1), jnp.int32))
    _, best_c = jax.lax.fori_loop(0, n2_chunks, chunk, init)
    out_ref[0, :, :] = best_c


@functools.partial(jax.jit, static_argnames=('interpret',))
def p2m_select_pallas(points, face_vertices, interpret=False):
    """Winner face + distance-type selection per point.

    ``points`` (B, N, 3), ``face_vertices`` (B, F, 3, 3). Returns
    (face_idx (B, N) int32, dist_type (B, N) int32), matching the XLA
    ``_select_faces`` scan (up to float ties between equally-near
    faces).
    """
    B, N, _ = points.shape
    F = face_vertices.shape[1]
    n1p = (-N) % T1
    n2p = (-F) % T2
    pp = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, n1p), (0, 0)))
    tbl = face_constants(face_vertices.astype(jnp.float32))
    tbl = jnp.pad(tbl, ((0, 0), (0, 0), (0, n2p)))
    Np, Fp = N + n1p, F + n2p
    kernel = functools.partial(_p2m_kernel, n2_chunks=Fp // T2)
    code = pl.pallas_call(
        kernel,
        grid=(B, Np // T1),
        in_specs=[
            pl.BlockSpec((1, T1, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, Fp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T1, 1), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, 1), jnp.int32),
        interpret=interpret,
    )(pp, tbl)
    code = code[:, :N, 0]
    return code >> 5, code & 31
