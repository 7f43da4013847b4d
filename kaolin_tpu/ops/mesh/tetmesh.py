"""Tetrahedral-mesh utilities.

Reference: ``kaolin/ops/mesh/tetmesh.py:41-181``.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ['inverse_vertices_offset', 'subdivide_tetmesh']

# pairs (A,B),(A,C),(A,D),(B,C),(B,D),(C,D) — kaolin/ops/mesh/tetmesh.py:19
BASE_TET_EDGES = np.array([0, 1, 0, 2, 0, 3, 1, 2, 1, 3, 2, 3],
                          dtype=np.int64)


def _validate_tet_vertices(tet_vertices):
    assert tet_vertices.ndim == 4, \
        f"tetrahedrons has {tet_vertices.ndim} but must have 4 dimensions."
    assert tet_vertices.shape[2] == 4, \
        "the third dimension of the tetrahedrons must be 4"
    assert tet_vertices.shape[3] == 3, \
        "the fourth dimension of the tetrahedrons must be 3"


def inverse_vertices_offset(tet_vertices):
    """Inverse of the per-tet offset matrix [B-A; C-A; D-A].

    Reference: ``kaolin/ops/mesh/tetmesh.py:41``.

    Args:
        tet_vertices: (batch_size, num_tetrahedrons, 4, 3).

    Returns:
        (batch_size, num_tetrahedrons, 3, 3).
    
    Example:
        >>> import jax.numpy as jnp
        >>> tet = jnp.asarray([[[[0., 0., 0.], [1., 0., 0.],
        ...                      [0., 1., 0.], [0., 0., 1.]]]])
        >>> print(inverse_vertices_offset(tet).shape)
        (1, 1, 3, 3)
    """
    _validate_tet_vertices(tet_vertices)
    A = tet_vertices[:, :, 0:1]
    offset = jnp.concatenate([tet_vertices[:, :, 1:2] - A,
                              tet_vertices[:, :, 2:3] - A,
                              tet_vertices[:, :, 3:4] - A], axis=2)
    return jnp.linalg.inv(offset)


def subdivide_tetmesh(vertices, tetrahedrons, features=None):
    """Subdivides each tetrahedron into 8 by adding edge midpoints
    (DMTet-style); features of new vertices are edge averages.

    Reference: ``kaolin/ops/mesh/tetmesh.py:85``. The edge dedup runs on
    host numpy (topology is static metadata under jit).

    Args:
        vertices: (batch_size, num_vertices, 3).
        tetrahedrons: (num_tetrahedrons, 4) int (host or device).
        features: optional (batch_size, num_vertices, feat_dim).

    Returns:
        (new_vertices, new_tetrahedrons[, new_features]).
    """
    tets_np = np.asarray(tetrahedrons)
    num_vertices = vertices.shape[1]
    all_edges = tets_np[:, BASE_TET_EDGES].reshape(-1, 2)
    all_edges = np.sort(all_edges, axis=1)
    unique_edges, idx_map = np.unique(all_edges, axis=0, return_inverse=True)
    idx_map = idx_map + num_vertices

    pos_feature = vertices if features is None else \
        jnp.concatenate([vertices, features], axis=-1)
    gathered = jnp.take(pos_feature, jnp.asarray(unique_edges.reshape(-1)),
                        axis=1)
    mid = gathered.reshape(pos_feature.shape[0], -1, 2,
                           pos_feature.shape[-1]).mean(axis=2)
    new_pos_feature = jnp.concatenate([pos_feature, mid], axis=1)
    new_pos = new_pos_feature[..., :3]
    new_features = new_pos_feature[..., 3:]

    idx_a, idx_b, idx_c, idx_d = np.split(tets_np, 4, axis=-1)
    (idx_ab, idx_ac, idx_ad, idx_bc, idx_bd,
     idx_cd) = np.split(idx_map.reshape(-1, 6), 6, axis=-1)
    tets = np.concatenate([
        np.concatenate([idx_a, idx_ab, idx_ac, idx_ad], axis=1),
        np.concatenate([idx_b, idx_bc, idx_ab, idx_bd], axis=1),
        np.concatenate([idx_c, idx_ac, idx_bc, idx_cd], axis=1),
        np.concatenate([idx_d, idx_ad, idx_cd, idx_bd], axis=1),
        np.concatenate([idx_ab, idx_ac, idx_ad, idx_bd], axis=1),
        np.concatenate([idx_ab, idx_ac, idx_bd, idx_bc], axis=1),
        np.concatenate([idx_cd, idx_ac, idx_bd, idx_ad], axis=1),
        np.concatenate([idx_cd, idx_ac, idx_bc, idx_bd], axis=1),
    ], axis=0)
    new_tets = jnp.asarray(tets)
    if features is None:
        return new_pos, new_tets
    return new_pos, new_tets, new_features
