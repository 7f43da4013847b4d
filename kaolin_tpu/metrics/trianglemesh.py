"""Point-to-mesh distance and mesh regularizers.

TPU-native re-design of ``kaolin/metrics/trianglemesh.py:20-342`` (CUDA
kernel ``kaolin/csrc/metrics/unbatched_triangle_distance_cuda.cu``). The
per-(point, face) closest-feature classification follows the reference's
naive formulation (``metrics/trianglemesh.py:143``, the cross-implementation
test anchor): 7 distance types (face interior, 3 vertices, 3 edges). The
selection runs as a non-differentiable scan over face chunks; the distance
is recomputed differentiably from the winning face/type, giving the same
O(num_points) backward as the reference.
"""

import functools

import jax
import jax.numpy as jnp

from ..ops.mesh.mesh import uniform_laplacian
from ..ops.mesh.trianglemesh import average_edge_length

__all__ = [
    'point_to_mesh_distance',
    'average_edge_length',
    'uniform_laplacian_smoothing',
]


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _classify_and_distance(points, v1, v2, v3):
    """Distance + type of each (point, face) pair.

    ``points``: (..., 3) broadcastable against v1/v2/v3 (..., 3).
    Returns (dist, dtype_code) with codes matching the reference
    (``metrics/trianglemesh.py:276-296``): 0 face, 1-3 vertex, 4-6 edge.
    """
    e21 = v2 - v1
    e32 = v3 - v2
    e13 = v1 - v3
    normals = -jnp.cross(e21, e13)

    uab = _dot(points - v1, e21) / _dot(e21, e21)
    ubc = _dot(points - v2, e32) / _dot(e32, e32)
    uca = _dot(points - v3, e13) / _dot(e13, e13)

    def not_above(vertex, edge):
        edge_norm = jnp.cross(normals, edge)
        return _dot(edge_norm, points - vertex) <= 0

    is_type1 = (uca > 1.) & (uab < 0.)
    is_type2 = (uab > 1.) & (ubc < 0.)
    is_type3 = (ubc > 1.) & (uca < 0.)
    is_type4 = (uab >= 0.) & (uab <= 1.) & not_above(v1, e21)
    is_type5 = (ubc >= 0.) & (ubc <= 1.) & not_above(v2, e32)
    is_type6 = (uca >= 0.) & (uca <= 1.) & not_above(v3, e13)

    types = (is_type1 * 1 + is_type2 * 2 + is_type3 * 3
             + is_type4 * 4 + is_type5 * 5 + is_type6 * 6).astype(jnp.int32)

    unit_n = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    plane_pt = points - unit_n * _dot(points - v1, unit_n)[..., None]

    closest = jnp.where(is_type1[..., None], v1,
              jnp.where(is_type2[..., None], v2,
              jnp.where(is_type3[..., None], v3,
              jnp.where(is_type4[..., None], v1 + e21 * uab[..., None],
              jnp.where(is_type5[..., None], v2 + e32 * ubc[..., None],
              jnp.where(is_type6[..., None], v3 + e13 * uca[..., None],
                        plane_pt))))))
    dist = _dot(closest - points, closest - points)
    return dist, types


@functools.partial(jax.jit, static_argnames=('chunk',))
def _select_faces(points, face_vertices, chunk=256):
    """Non-differentiable winner-face + type selection per point.

    ``points`` (B, N, 3), ``face_vertices`` (B, F, 3, 3).
    Ties keep the lowest face index (torch.min convention)."""
    B, N, _ = points.shape
    F = face_vertices.shape[1]
    pad = (-F) % chunk
    fv = face_vertices
    if pad:
        fv = jnp.pad(fv, ((0, 0), (0, pad), (0, 0), (0, 0)))
    num_chunks = (F + pad) // chunk
    fvc = fv.reshape(B, num_chunks, chunk, 3, 3).transpose(1, 0, 2, 3, 4)
    lane = jnp.arange(chunk)

    def body(carry, inp):
        best_d, best_i, best_t = carry
        fv_k, base = inp
        d, t = _classify_and_distance(
            points[:, :, None, :], fv_k[:, None, :, 0], fv_k[:, None, :, 1],
            fv_k[:, None, :, 2])
        # padded (zero-degenerate) faces produce NaN -> mask them out
        valid = (base + lane) < F
        d = jnp.where(valid[None, None, :] & ~jnp.isnan(d), d, jnp.inf)
        dmin = jnp.min(d, axis=-1)
        imin = jnp.argmin(d, axis=-1).astype(jnp.int32)
        tmin = jnp.take_along_axis(t, imin[..., None], axis=-1)[..., 0]
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d),
                jnp.where(take, imin + base, best_i),
                jnp.where(take, tmin, best_t)), None

    init = (jnp.full((B, N), jnp.inf, points.dtype),
            jnp.zeros((B, N), jnp.int32),
            jnp.zeros((B, N), jnp.int32))
    bases = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (_, idx, types), _ = jax.lax.scan(body, init, (fvc, bases))
    return idx, types


def point_to_mesh_distance(pointclouds, face_vertices, backend='auto'):
    """Squared distance from each point to the nearest triangle of a mesh.

    Reference: ``kaolin/metrics/trianglemesh.py:20``.

    Args:
        pointclouds: (batch_size, num_points, 3).
        face_vertices: (batch_size, num_faces, 3, 3).
        backend: 'auto' (Pallas VMEM-tiled kernel on TPU, XLA scan
            elsewhere), 'pallas', 'pallas_interpret', or 'xla'; the
            kernel selects the same winner faces/types (same flags,
            summed type code and tie rule; tested on exact-tie grids).

    Returns:
        (distance (B, N), face_idx (B, N) int32, dist_type (B, N) int32):
        type 0 = face interior, 1-3 = vertex, 4-6 = edge (flag overlaps
        keep the reference's summed codes, e.g. 10). Distance is
        differentiable w.r.t. both inputs through the fixed assignment.
    
    Example:
        >>> import jax.numpy as jnp
        >>> pts = jnp.asarray([[[0.25, 0.25, 1.0]]])
        >>> tri = jnp.asarray([[[[0., 0., 0.], [1., 0., 0.],
        ...                      [0., 1., 0.]]]])
        >>> d, idx, dtype_ = point_to_mesh_distance(pts, tri)
        >>> print(round(float(d[0, 0]), 5), int(idx[0, 0]))
        1.0 0
    """
    pts_ng = jax.lax.stop_gradient(pointclouds)
    fv_ng = jax.lax.stop_gradient(face_vertices)
    if backend == 'auto':
        # the kernel keeps a (40, F) f32 constant table resident in
        # VMEM (~160*F bytes); past ~64k faces fall back to the scan
        backend = ('pallas' if jax.default_backend() == 'tpu'
                   and face_vertices.shape[1] <= 65536 else 'xla')
    if backend in ('pallas', 'pallas_interpret'):
        from ..kernels.p2m_distance import p2m_select_pallas
        idx, types = p2m_select_pallas(
            pts_ng, fv_ng, interpret=(backend == 'pallas_interpret'))
    else:
        idx, types = _select_faces(pts_ng, fv_ng)
    # differentiable recompute on the winning faces only (O(num_points))
    sel = jnp.take_along_axis(face_vertices, idx[..., None, None], axis=1)
    v1, v2, v3 = sel[..., 0, :], sel[..., 1, :], sel[..., 2, :]
    e21 = v2 - v1
    e32 = v3 - v2
    e13 = v1 - v3
    normals = -jnp.cross(e21, e13)
    uab = _dot(pointclouds - v1, e21) / _dot(e21, e21)
    ubc = _dot(pointclouds - v2, e32) / _dot(e32, e32)
    uca = _dot(pointclouds - v3, e13) / _dot(e13, e13)
    unit_n = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    plane_pt = pointclouds - unit_n * _dot(pointclouds - v1, unit_n)[..., None]
    t = types[..., None]
    counter_p = jnp.where(t == 1, v1,
                jnp.where(t == 2, v2,
                jnp.where(t == 3, v3,
                jnp.where(t == 4, v1 + e21 * uab[..., None],
                jnp.where(t == 5, v2 + e32 * ubc[..., None],
                jnp.where(t == 6, v3 + e13 * uca[..., None],
                          plane_pt))))))
    dist = jnp.sum((counter_p - pointclouds) ** 2, axis=-1)
    return dist, idx, types


def uniform_laplacian_smoothing(vertices, faces):
    """Uniform-laplacian smoothed vertex positions (average of neighbours).

    Reference: ``kaolin/metrics/trianglemesh.py:310``.
    """
    num_vertices = vertices.shape[1]
    L = uniform_laplacian(num_vertices, faces).astype(vertices.dtype)
    return jnp.matmul(L, vertices) + vertices
