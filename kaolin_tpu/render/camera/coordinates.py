"""Canonical world coordinate-system bases.

Reference: ``kaolin/render/camera/coordinates.py:32-63``.
"""

import jax.numpy as jnp

__all__ = ['blender_coords', 'opengl_coords']


def blender_coords():
    """Blender: right-handed, z up.
    Example:
        >>> print(blender_coords().astype(int).tolist())
        [[1, 0, 0], [0, 0, 1], [0, -1, 0]]
    """
    return jnp.asarray([[1, 0, 0],
                        [0, 0, 1],
                        [0, -1, 0]], jnp.float32)


def opengl_coords():
    """OpenGL convention: right-handed, y up."""
    return jnp.asarray([[1, 0, 0],
                        [0, 1, 0],
                        [0, 0, 1]], jnp.float32)
