"""Point-in-watertight-mesh test via axis-ray crossing parity.

TPU-native re-design of ``kaolin/ops/mesh/check_sign.py:61`` (CUDA kernel
``kaolin/csrc/ops/mesh/mesh_intersection_cuda.cu:105-253``): a ray is shot
from each point along +x; the parity of triangle crossings decides
inside/outside. The kernel's degenerate-case rules (projection landing on
an edge or vertex of the (y,z) silhouette must not be double counted) are
replicated vectorized; the face loop is a ``lax.scan`` over chunks.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['check_sign']


def _signed_volume(a, b, c, d):
    return jnp.sum(jnp.cross(b - a, c - a) * (d - a), axis=-1)


def _signed_area(ax, ay, bx, by, cx, cy):
    """Direction-stable 2D signed area (3d_math.cuh ``signed_area``):
    canonicalizes the edge b-c so numerics match regardless of winding."""
    flip = (cx > bx) | ((bx == cx) & (cy < by))
    pos = (cy - by) * (ax - bx) + (bx - cx) * (ay - by)
    neg = -((by - cy) * (ax - cx) + (cx - bx) * (ay - cy))
    return jnp.where(flip, neg, pos)


def _is_point_above_line(vx, vy, lx, ly, rx, ry):
    return ((rx - lx) * (vy - ly) - (ry - ly) * (vx - lx)) > 0.


def _crossings_chunk(points, v1, v2, v3):
    """Crossing counts for a chunk of faces against all points.

    ``points``: (N, 1, 3); v1/v2/v3: (1, C, 3). Returns (N,) int32.
    Mirrors mesh_intersection_cuda.cu:136-216.
    """
    q1 = points
    q2 = points + jnp.asarray([10., 0., 0.], points.dtype)

    # bbox rejection on (y, z)
    y = jnp.stack([v1[..., 1], v2[..., 1], v3[..., 1]], axis=-1)
    z = jnp.stack([v1[..., 2], v2[..., 2], v3[..., 2]], axis=-1)
    in_bbox = ((q1[..., 1] >= y.min(-1)) & (q1[..., 1] <= y.max(-1))
               & (q1[..., 2] >= z.min(-1)) & (q1[..., 2] <= z.max(-1)))

    cond1 = _signed_volume(q1, v1, v2, v3) > 0.
    cond2 = _signed_volume(q2, v1, v2, v3) > 0.
    between = cond1 != cond2

    # 2D projection on (y, z)
    qx, qy = q1[..., 1], q1[..., 2]
    p1x, p1y = v1[..., 1], v1[..., 2]
    p2x, p2y = v2[..., 1], v2[..., 2]
    p3x, p3y = v3[..., 1], v3[..., 2]
    d1 = _signed_area(qx, qy, p1x, p1y, p2x, p2y)
    d2 = _signed_area(qx, qy, p2x, p2y, p3x, p3y)
    d3 = _signed_area(qx, qy, p3x, p3y, p1x, p1y)
    inside2d = (d1 * d2 >= 0) & (d3 * d1 >= 0) & (d2 * d3 >= 0)

    # degenerate handling (mesh_intersection_cuda.cu:158-216): if the
    # projected point lies on a vertex or edge of the 2D triangle, count
    # only the canonical face (below the point / left of a vertical edge)
    on_v1 = (qx == p1x) & (qy == p1y)
    on_v2 = (qx == p2x) & (qy == p2y)
    on_v3 = (qx == p3x) & (qy == p3y)
    on_vert = on_v1 | on_v2 | on_v3
    on_e1 = (~on_vert) & (d1 == 0.)
    on_e2 = (~on_vert) & (~on_e1) & (d2 == 0.)
    on_e3 = (~on_vert) & (~on_e1) & (~on_e2) & (d3 == 0.)

    def pick(c1, a1, c2, a2, a3):
        return jnp.where(c1, a1, jnp.where(c2, a2, a3))

    # (v1', v2') pair for the vertex / edge case; 'other' for edges
    vax = pick(on_v1, p2x, on_v2, p1x, jnp.where(on_v3, p1x,
               pick(on_e1, p1x, on_e2, p2x, p3x)))
    vay = pick(on_v1, p2y, on_v2, p1y, jnp.where(on_v3, p1y,
               pick(on_e1, p1y, on_e2, p2y, p3y)))
    vbx = pick(on_v1, p3x, on_v2, p3x, jnp.where(on_v3, p2x,
               pick(on_e1, p2x, on_e2, p3x, p1x)))
    vby = pick(on_v1, p3y, on_v2, p3y, jnp.where(on_v3, p2y,
               pick(on_e1, p2y, on_e2, p3y, p1y)))
    otx = pick(on_e1, p3x, on_e2, p1x, p2x)
    oty = pick(on_e1, p3y, on_e2, p1y, p2y)

    swap = (vax > vbx) | ((vax == vbx) & (vay > vby))
    lx = jnp.where(swap, vbx, vax)
    ly = jnp.where(swap, vby, vay)
    rx = jnp.where(swap, vax, vbx)
    ry = jnp.where(swap, vay, vby)

    on_edge = on_e1 | on_e2 | on_e3
    edge_invalid = on_edge & _is_point_above_line(otx, oty, lx, ly, rx, ry)
    vert_valid = (_is_point_above_line(qx, qy, lx, ly, rx, ry)
                  & (lx < qx) & (rx >= qx))
    vert_invalid = on_vert & ~vert_valid

    valid = in_bbox & between & inside2d & ~edge_invalid & ~vert_invalid
    return jnp.sum(valid.astype(jnp.int32), axis=-1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=('chunk',))
def _count_intersections(points, v1, v2, v3, chunk=256):
    N = points.shape[0]
    F = v1.shape[0]
    pad = (-F) % chunk
    if pad:
        # degenerate far-away padding faces never hit
        v1 = jnp.pad(v1, ((0, pad), (0, 0)), constant_values=1e30)
        v2 = jnp.pad(v2, ((0, pad), (0, 0)), constant_values=1e30)
        v3 = jnp.pad(v3, ((0, pad), (0, 0)), constant_values=1e30)
    num_chunks = (F + pad) // chunk
    v1c = v1.reshape(num_chunks, chunk, 3)
    v2c = v2.reshape(num_chunks, chunk, 3)
    v3c = v3.reshape(num_chunks, chunk, 3)
    pts = points[:, None, :]

    def body(count, inp):
        a, b, c = inp
        return count + _crossings_chunk(pts, a[None], b[None], c[None]), None

    count, _ = jax.lax.scan(body, jnp.zeros((N,), jnp.int32),
                            (v1c, v2c, v3c))
    return count


def check_sign(verts, faces, points, hash_resolution=512):
    """True for points contained inside a watertight triangle mesh.

    Reference: ``kaolin/ops/mesh/check_sign.py:61``. ``hash_resolution``
    is accepted for API parity (the reference's CPU spatial-hash path; the
    vectorized crossing count here covers both devices).

    Args:
        verts: (batch_size, num_vertices, 3).
        faces: (num_faces, 3) int.
        points: (batch_size, num_points, 3).

    Returns:
        (batch_size, num_points) bool.
    """
    if verts.ndim != 3:
        raise ValueError(f"Expected verts to have 3 dimensions "
                         f"but got {verts.ndim} dimensions.")
    if faces.ndim != 2:
        raise ValueError(f"Expected faces to have 2 dimensions "
                         f"but got {faces.ndim} dimensions.")
    if points.ndim != 3:
        raise ValueError(f"Expected points to have 3 dimensions "
                         f"but got {points.ndim} dimensions.")
    if verts.shape[2] != 3 or faces.shape[1] != 3 or points.shape[2] != 3:
        raise ValueError("verts/faces/points must have 3 coordinates")

    # normalize by the largest bbox extent (check_sign.py:146-151)
    extent = jnp.max(verts, axis=1) - jnp.min(verts, axis=1)
    maxlen = jnp.max(extent, axis=-1)
    verts = verts / maxlen[:, None, None]
    points = points / maxlen[:, None, None]

    def one(v, p):
        v1 = jnp.take(v, faces[:, 0], axis=0)
        v2 = jnp.take(v, faces[:, 1], axis=0)
        v3 = jnp.take(v, faces[:, 2], axis=0)
        return _count_intersections(p, v1, v2, v3) % 2 == 1

    return jax.vmap(one)(verts, points)
