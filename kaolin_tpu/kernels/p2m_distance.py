"""Pallas TPU kernel for point-to-triangle-mesh closest-feature queries.

TPU-native replacement for the HBM-bound XLA scan in
``metrics/trianglemesh._select_faces`` (reference CUDA kernel
``kaolin/csrc/metrics/unbatched_triangle_distance_cuda.cu:238-479``).
All per-face geometry (edges, reciprocal edge norms, edge-plane
normals, vertex norms, unit face normal) is packed by an XLA prepass
into a (B, 48, F) constant table that lives in VMEM for the whole
pass; the kernel streams (T1, T2) point x face tiles through registers
carrying only a (T1, 1) running (distance, face*32+type) minimum.

Classification replicates ``_classify_and_distance`` exactly: the same
six region flags, the same *sum* of flags as the type code (so flag
overlaps produce the same summed code), and distances selected by code
equality — indices and types are bit-identical to the XLA path, and
the differentiable recompute downstream is unchanged. Ties keep the
lowest face index (strict ``<`` across chunks, lowest lane within one).
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
_C21, _C32, _C13 = 12, 13, 14
_EN1, _CEN1 = 15, 18
_EN2, _CEN2 = 19, 22
_EN3, _CEN3 = 23, 26
_V1, _V1SQ = 27, 30
_V2, _V2SQ = 31, 34
_V3, _V3SQ = 35, 38
_UN, _CN = 39, 42
_VALID = 43
_ROWS = 48


def face_constants(face_vertices):
    """(B, F, 3, 3) -> (B, 48, F) packed per-face constants."""
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
        dot(v1, e21), dot(v2, e32), dot(v3, e13),
        en1[..., 0], en1[..., 1], en1[..., 2], dot(en1, v1),
        en2[..., 0], en2[..., 1], en2[..., 2], dot(en2, v2),
        en3[..., 0], en3[..., 1], en3[..., 2], dot(en3, v3),
        v1[..., 0], v1[..., 1], v1[..., 2], dot(v1, v1),
        v2[..., 0], v2[..., 1], v2[..., 2], dot(v2, v2),
        v3[..., 0], v3[..., 1], v3[..., 2], dot(v3, v3),
        unit_n[..., 0], unit_n[..., 1], unit_n[..., 2], dot(unit_n, v1),
        jnp.ones_like(v1[..., 0]),
    ]
    rows += [jnp.zeros_like(rows[0])] * (_ROWS - len(rows))
    return jnp.stack(rows, axis=1)


def _p2m_kernel(p_ref, tbl_ref, out_ref, *, n2_chunks):
    px = p_ref[0, :, 0:1]
    py = p_ref[0, :, 1:2]
    pz = p_ref[0, :, 2:3]
    psq = px * px + py * py + pz * pz
    # region flags can overlap and the type code is their SUM
    # (e.g. 4 + 6 = 10 for a point above a shared vertex), so the
    # packed code reserves 5 bits for the type
    code32 = 32 * jax.lax.broadcasted_iota(jnp.int32, (T1, T2), 1)

    def row(k, c):
        return tbl_ref[0, k:k + 1, pl.ds(c * T2, T2)]

    def pdot(k, c):
        return px * row(k, c) + py * row(k + 1, c) + pz * row(k + 2, c)

    def chunk(c, carry):
        best_d, best_c = carry
        uab_n = pdot(_E21, c) - row(_C21, c)
        ubc_n = pdot(_E32, c) - row(_C32, c)
        uca_n = pdot(_E13, c) - row(_C13, c)
        inv21 = row(_INV21, c)
        inv32 = row(_INV32, c)
        inv13 = row(_INV13, c)
        uab = uab_n * inv21
        ubc = ubc_n * inv32
        uca = uca_n * inv13
        below1 = (pdot(_EN1, c) - row(_CEN1, c)) <= 0.
        below2 = (pdot(_EN2, c) - row(_CEN2, c)) <= 0.
        below3 = (pdot(_EN3, c) - row(_CEN3, c)) <= 0.
        is1 = (uca > 1.) & (uab < 0.)
        is2 = (uab > 1.) & (ubc < 0.)
        is3 = (ubc > 1.) & (uca < 0.)
        is4 = (uab >= 0.) & (uab <= 1.) & below1
        is5 = (ubc >= 0.) & (ubc <= 1.) & below2
        is6 = (uca >= 0.) & (uca <= 1.) & below3
        t = (is1 * 1 + is2 * 2 + is3 * 3 + is4 * 4 + is5 * 5
             + is6 * 6).astype(jnp.int32)
        dv1 = psq - 2. * pdot(_V1, c) + row(_V1SQ, c)
        dv2 = psq - 2. * pdot(_V2, c) + row(_V2SQ, c)
        dv3 = psq - 2. * pdot(_V3, c) + row(_V3SQ, c)
        de1 = dv1 - uab_n * uab_n * inv21
        de2 = dv2 - ubc_n * ubc_n * inv32
        de3 = dv3 - uca_n * uca_n * inv13
        dfn = pdot(_UN, c) - row(_CN, c)
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
    (face_idx (B, N) int32, dist_type (B, N) int32), identical to the
    XLA ``_select_faces`` scan.
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
