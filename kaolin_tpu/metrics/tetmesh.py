"""Tetrahedral-mesh quality losses.

Reference: ``kaolin/metrics/tetmesh.py:20-195``.
"""

import jax.numpy as jnp

from ..ops.mesh.tetmesh import _validate_tet_vertices

__all__ = ['tetrahedron_volume', 'equivolume', 'amips']


def tetrahedron_volume(tet_vertices):
    """Signed volume of each tetrahedron: ``(A-D)·((B-D)x(C-D)) / 6``.

    Reference: ``kaolin/metrics/tetmesh.py:20``.
    
    Example:
        >>> import jax.numpy as jnp
        >>> tet = jnp.asarray([[[[0., 0., 0.], [1., 0., 0.],
        ...                      [0., 1., 0.], [0., 0., 1.]]]])
        >>> print(round(float(tetrahedron_volume(tet)[0, 0]), 6))
        -0.166667
    """
    _validate_tet_vertices(tet_vertices)
    A = tet_vertices[:, :, 0]
    B = tet_vertices[:, :, 1]
    C = tet_vertices[:, :, 2]
    D = tet_vertices[:, :, 3]
    return jnp.sum((A - D) * jnp.cross(B - D, C - D), axis=2) / 6.


def equivolume(tet_vertices, tetrahedrons_mean=None, pow=4):
    """EquiVolume loss (Gao et al., DefTet NeurIPS 2020).

    Reference: ``kaolin/metrics/tetmesh.py:52``.
    """
    _validate_tet_vertices(tet_vertices)
    volumes = tetrahedron_volume(tet_vertices)
    if tetrahedrons_mean is None:
        tetrahedrons_mean = jnp.mean(volumes, axis=-1)
    tetrahedrons_mean = jnp.reshape(tetrahedrons_mean, (1, -1))
    return jnp.mean(jnp.abs(volumes - tetrahedrons_mean) ** pow, axis=-1,
                    keepdims=True)


def amips(tet_vertices, inverse_offset_matrix):
    """AMIPS energy (Fu et al. SIGGRAPH 2015), over tets with positive
    Jacobian determinant.

    Reference: ``kaolin/metrics/tetmesh.py:112``.
    """
    _validate_tet_vertices(tet_vertices)
    A = tet_vertices[:, :, 0:1]
    offset = jnp.concatenate([tet_vertices[:, :, 1:2] - A,
                              tet_vertices[:, :, 2:3] - A,
                              tet_vertices[:, :, 3:4] - A], axis=2)
    jacobian = jnp.matmul(offset, inverse_offset_matrix)
    j_det = jnp.linalg.det(jacobian)
    jj = jnp.matmul(jacobian, jnp.swapaxes(jacobian, -2, -1))
    trace = jnp.trace(jj, axis1=-2, axis2=-1)
    EPS = 1e-10
    denominator = (j_det ** 2 + EPS) ** (1. / 3.)
    return jnp.mean((trace / denominator) * (j_det >= 0), axis=1,
                    keepdims=True)
