"""Triangle-mesh geometry ops: areas, normals, point sampling.

Reference: ``kaolin/ops/mesh/trianglemesh.py:29-336``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..batch import get_first_idx, segment_ids_from_numel

__all__ = [
    'face_areas',
    'packed_face_areas',
    'sample_points',
    'packed_sample_points',
    'face_normals',
    'average_edge_length',
]


def _base_face_areas(v0, v1, v2):
    """Face areas from the three per-face vertex arrays.

    Reference: ``kaolin/ops/mesh/trianglemesh.py:29``.
    """
    x1, x2, x3 = jnp.split(v0 - v1, 3, axis=-1)
    y1, y2, y3 = jnp.split(v1 - v2, 3, axis=-1)
    a = (x2 * y3 - x3 * y2) ** 2
    b = (x3 * y1 - x1 * y3) ** 2
    c = (x1 * y2 - x2 * y1) ** 2
    return jnp.sqrt(a + b + c) * 0.5


def face_areas(vertices, faces):
    """Areas of each face of batched triangle meshes.

    Reference: ``kaolin/ops/mesh/trianglemesh.py:97``.

    Args:
        vertices: (batch_size, num_vertices, 3).
        faces: (num_faces, 3) int.

    Returns:
        (batch_size, num_faces).
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> verts = jnp.asarray([[[0., 0., 0.], [2., 0., 0.],
        ...                       [0., 2., 0.]]])
        >>> faces = jnp.asarray([[0, 1, 2]])
        >>> print(np.asarray(face_areas(verts, faces)))
        [[2.]]
    """
    if faces.shape[-1] != 3:
        raise NotImplementedError("face_areas is only implemented for triangle meshes")
    v0 = jnp.take(vertices, faces[:, 0], axis=1)
    v1 = jnp.take(vertices, faces[:, 1], axis=1)
    v2 = jnp.take(vertices, faces[:, 2], axis=1)
    return _base_face_areas(v0, v1, v2)[..., 0]


def packed_face_areas(vertices, first_idx_vertices, faces, num_faces_per_mesh):
    """Areas of each face of packed triangle meshes.

    Reference: ``kaolin/ops/mesh/trianglemesh.py:124``.
    """
    if faces.shape[-1] != 3:
        raise NotImplementedError(
            "packed_face_areas is only implemented for triangle meshes")
    first_idx_vertices = np.asarray(first_idx_vertices)
    offset = jnp.take(jnp.asarray(first_idx_vertices[:-1]),
                      segment_ids_from_numel(num_faces_per_mesh), axis=0)
    merged_faces = faces + offset[:, None]
    v0 = jnp.take(vertices, merged_faces[:, 0], axis=0)
    v1 = jnp.take(vertices, merged_faces[:, 1], axis=0)
    v2 = jnp.take(vertices, merged_faces[:, 2], axis=0)
    return _base_face_areas(v0, v1, v2).reshape(-1)


def _sample_barycentric(key, shape, dtype):
    """Uniform barycentric weights over triangles.

    Same change-of-variable as the reference
    (``kaolin/ops/mesh/trianglemesh.py:41-96``): ``u = sqrt(U)``,
    ``w = (1-u, u(1-v), uv)``.
    """
    k1, k2 = jax.random.split(key)
    u = jnp.sqrt(jax.random.uniform(k1, shape, dtype=dtype))
    v = jax.random.uniform(k2, shape, dtype=dtype)
    w0 = 1. - u
    w1 = u * (1. - v)
    w2 = u * v
    return w0, w1, w2


def _weighted_face_choices(key, areas, num_samples):
    """Area-weighted face sampling by inverse-CDF (cumsum + searchsorted).

    O(F + S log F) per mesh, replacing the Gumbel ``categorical`` trick
    whose (S, F) noise matrix dominates runtime for large meshes.
    Zero-area faces are never selected (``side='right'`` skips repeated
    cdf values).
    """
    areas = jax.lax.stop_gradient(areas)          # selection is non-diff
    cdf = jnp.cumsum(jnp.maximum(areas, 0.), axis=-1)       # (B, F)
    u = jax.random.uniform(key, (areas.shape[0], num_samples),
                           dtype=cdf.dtype) * cdf[:, -1:]
    return _picks_from_cdf(cdf, u)


def _picks_from_cdf(cdf, q):
    """Inverse-CDF picks. ``q`` in [0, total] — q that rounds UP to
    exactly the total (u = 1 - 2^-25 observed from jax.random.uniform)
    falls past the end of ``searchsorted``; clamp to the LAST
    positive-area face (first index where cdf reaches the total), so
    zero-area (masked/padded) faces are never selected."""
    pick = jax.vmap(lambda c, qq: jnp.searchsorted(c, qq, side='right'))(
        cdf, q)
    last_pos = jax.vmap(lambda c: jnp.searchsorted(c, c[-1], side='left'))(
        cdf)
    return jnp.minimum(pick, last_pos[:, None]).astype(jnp.int32)


def sample_points(vertices, faces, num_samples, areas=None, face_features=None,
                  key=None):
    """Uniformly samples points on the surface of batched triangle meshes.

    Faces are picked with probability proportional to area, then barycentric
    coordinates uniformly. Reference: ``kaolin/ops/mesh/trianglemesh.py:158``.
    JAX-native: takes an explicit PRNG ``key`` (falls back to the module
    PRNG state from :mod:`kaolin_tpu.ops.random`).

    Returns:
        (points, face_choices[, point_features]):
        points (batch_size, num_samples, 3), face_choices
        (batch_size, num_samples) int32, and interpolated features
        (batch_size, num_samples, feat_dim) if ``face_features`` was given.
    """
    if faces.shape[-1] != 3:
        raise NotImplementedError("sample_points is only implemented for triangle meshes")
    if key is None:
        from .. import random as krandom
        key = krandom.get_key()
    batch_size = vertices.shape[0]
    v0 = jnp.take(vertices, faces[:, 0], axis=1)
    v1 = jnp.take(vertices, faces[:, 1], axis=1)
    v2 = jnp.take(vertices, faces[:, 2], axis=1)
    if areas is None:
        areas = _base_face_areas(v0, v1, v2)[..., 0]
    k_face, k_bary = jax.random.split(key)
    face_choices = _weighted_face_choices(k_face, areas, num_samples)
    sv0 = jnp.take_along_axis(v0, face_choices[..., None], axis=1)
    sv1 = jnp.take_along_axis(v1, face_choices[..., None], axis=1)
    sv2 = jnp.take_along_axis(v2, face_choices[..., None], axis=1)
    w0, w1, w2 = _sample_barycentric(k_bary, (batch_size, num_samples, 1),
                                     vertices.dtype)
    points = w0 * sv0 + w1 * sv1 + w2 * sv2
    if face_features is not None:
        feats = jnp.take_along_axis(face_features,
                                    face_choices[..., None, None], axis=1)
        point_features = (w0 * feats[:, :, 0] + w1 * feats[:, :, 1]
                          + w2 * feats[:, :, 2])
        return points, face_choices, point_features
    return points, face_choices


def packed_sample_points(vertices, first_idx_vertices, faces,
                         num_faces_per_mesh, num_samples, areas=None, key=None):
    """Uniformly samples points on the surface of packed triangle meshes.

    Reference: ``kaolin/ops/mesh/trianglemesh.py:245``.

    Returns:
        (points, merged_face_choices): points (batch_size, num_samples, 3)
        and selected face indices into the packed faces.
    """
    if faces.shape[-1] != 3:
        raise NotImplementedError(
            "packed_sample_points is only implemented for triangle meshes")
    if key is None:
        from .. import random as krandom
        key = krandom.get_key()
    num_faces_per_mesh = np.asarray(num_faces_per_mesh)
    batch_size = num_faces_per_mesh.shape[0]
    first_idx_vertices = np.asarray(first_idx_vertices)
    offset = jnp.take(jnp.asarray(first_idx_vertices[:-1]),
                      segment_ids_from_numel(num_faces_per_mesh), axis=0)
    merged_faces = faces + offset[:, None]
    v0 = jnp.take(vertices, merged_faces[:, 0], axis=0)
    v1 = jnp.take(vertices, merged_faces[:, 1], axis=0)
    v2 = jnp.take(vertices, merged_faces[:, 2], axis=0)
    if areas is None:
        areas = _base_face_areas(v0, v1, v2)[..., 0]
    first_idx_faces = get_first_idx(num_faces_per_mesh)
    max_faces = int(num_faces_per_mesh.max())
    # pad per-mesh areas to (batch, max_faces); zero-area pads are never picked
    idx = first_idx_faces[:-1, None] + np.arange(max_faces)[None, :]
    valid = np.arange(max_faces)[None, :] < num_faces_per_mesh[:, None]
    idx = np.where(valid, idx, 0)
    padded_areas = jnp.where(jnp.asarray(valid),
                             jnp.take(areas, jnp.asarray(idx)), 0.)
    k_face, k_bary = jax.random.split(key)
    face_choices = _weighted_face_choices(k_face, padded_areas, num_samples)
    merged_face_choices = (face_choices
                           + jnp.asarray(first_idx_faces[:-1])[:, None]).reshape(-1)
    sv0 = jnp.take(v0, merged_face_choices, axis=0).reshape(batch_size, num_samples, 3)
    sv1 = jnp.take(v1, merged_face_choices, axis=0).reshape(batch_size, num_samples, 3)
    sv2 = jnp.take(v2, merged_face_choices, axis=0).reshape(batch_size, num_samples, 3)
    w0, w1, w2 = _sample_barycentric(k_bary, (batch_size, num_samples, 1),
                                     vertices.dtype)
    points = w0 * sv0 + w1 * sv1 + w2 * sv2
    return points, merged_face_choices.reshape(batch_size, num_samples)


def face_normals(face_vertices, unit=False):
    """Normals of triangle faces: ``cross(v1 - v0, v2 - v0)``.

    Reference: ``kaolin/ops/mesh/trianglemesh.py:313``.

    Args:
        face_vertices: (batch_size, num_faces, 3, 3).
        unit: normalize to unit length (with the reference's 1e-10 guard).

    Returns:
        (batch_size, num_faces, 3).
    """
    if face_vertices.shape[-2] != 3:
        raise NotImplementedError("face_normals is only implemented for triangle meshes")
    edges0 = face_vertices[:, :, 1] - face_vertices[:, :, 0]
    edges1 = face_vertices[:, :, 2] - face_vertices[:, :, 0]
    normals = jnp.cross(edges0, edges1)
    if unit:
        length = jnp.linalg.norm(normals, axis=2, keepdims=True)
        normals = normals / (length + 1e-10)
    return normals


def average_edge_length(vertices, faces):
    """Average edge length of each face.

    Reference: ``kaolin/metrics/trianglemesh.py:271`` (exposed from the ops
    layer here as it is pure geometry).
    """
    p1 = jnp.take(vertices, faces[:, 0], axis=1)
    p2 = jnp.take(vertices, faces[:, 1], axis=1)
    p3 = jnp.take(vertices, faces[:, 2], axis=1)
    el1 = jnp.linalg.norm(p2 - p1, axis=2)
    el2 = jnp.linalg.norm(p3 - p1, axis=2)
    el3 = jnp.linalg.norm(p2 - p3, axis=2)
    return (el1 + el2 + el3) / 3.
