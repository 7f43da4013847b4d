"""Mesh indexing and graph structure ops.

Reference: ``kaolin/ops/mesh/mesh.py:24-121``.
"""

import numpy as np
import jax.numpy as jnp

__all__ = [
    'index_vertices_by_faces',
    'adjacency_matrix',
    'uniform_laplacian',
]


def index_vertices_by_faces(vertices_features, faces):
    """Gathers per-vertex features into per-face per-vertex layout.

    Reference: ``kaolin/ops/mesh/mesh.py:24``.

    Args:
        vertices_features: (batch_size, num_vertices, feat_dim).
        faces: (num_faces, face_size) int array.

    Returns:
        (batch_size, num_faces, face_size, feat_dim).
    
    Example:
        >>> import jax.numpy as jnp
        >>> verts = jnp.asarray([[[0., 0., 0.], [1., 0., 0.],
        ...                       [0., 1., 0.]]])
        >>> faces = jnp.asarray([[0, 1, 2]])
        >>> print(index_vertices_by_faces(verts, faces).shape)
        (1, 1, 3, 3)
    """
    assert vertices_features.ndim == 3, \
        "vertices_features must have 3 dimensions (batch_size, num_points, knum)"
    assert faces.ndim == 2, "faces must have 2 dimensions (num_faces, num_vertices)"
    return jnp.take(vertices_features, faces, axis=1)


def adjacency_matrix(num_vertices, faces, sparse=False):
    """Vertex adjacency matrix of a mesh.

    Reference: ``kaolin/ops/mesh/mesh.py:48``. On TPU a dense matrix is
    returned by default (XLA has no sparse tensors; laplacian products stay
    on the MXU as dense matmuls). ``sparse=True`` returns
    ``(indices, values)`` COO host arrays for callers that want them.
    """
    faces_np = np.asarray(faces)
    fwd = np.stack([faces_np, np.roll(faces_np, 1, axis=-1)], axis=-1)
    bwd = np.stack([np.roll(faces_np, 1, axis=-1), faces_np], axis=-1)
    indices = np.concatenate([fwd, bwd], axis=1).reshape(-1, 2)
    indices = np.unique(indices, axis=0)
    if sparse:
        values = np.ones(indices.shape[0], dtype=np.float32)
        return jnp.asarray(indices.T), jnp.asarray(values)
    adj = np.zeros((num_vertices, num_vertices), dtype=np.float32)
    adj[indices[:, 0], indices[:, 1]] = 1.
    return jnp.asarray(adj)


def uniform_laplacian(num_vertices, faces):
    """Uniform graph laplacian: ``L[i,j] = 1/deg(i)`` for neighbours,
    ``-1`` on the diagonal, ``0`` elsewhere (off-diagonal entries of
    isolated vertices are zeroed, matching the reference's NaN-to-zero
    handling).

    Reference: ``kaolin/ops/mesh/mesh.py:86``.
    """
    adj = adjacency_matrix(num_vertices, faces, sparse=False)
    num_neighbour = jnp.sum(adj, axis=1, keepdims=True)
    L = jnp.where(num_neighbour > 0, adj / num_neighbour, 0.)
    L = L.at[jnp.arange(num_vertices), jnp.arange(num_vertices)].set(-1.)
    return L
