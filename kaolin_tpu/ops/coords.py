"""Coordinate-system conversions (spherical <-> cartesian).

Reference: ``kaolin/ops/coords.py:20-61``.
"""

import jax.numpy as jnp

__all__ = ['spherical2cartesian', 'cartesian2spherical']


def spherical2cartesian(azimuth, elevation, distance=None):
    """Converts spherical coordinates to cartesian.

    Follows the reference convention (``kaolin/ops/coords.py:20``):
    ``z = cos(elevation) * cos(azimuth)``, ``x = cos(elevation) * sin(azimuth)``,
    ``y = sin(elevation)``, all scaled by ``distance``.
    """
    if distance is None:
        distance = jnp.ones_like(azimuth)
    proj = jnp.cos(elevation) * distance
    x = proj * jnp.sin(azimuth)
    y = jnp.sin(elevation) * distance
    z = proj * jnp.cos(azimuth)
    return x, y, z


def cartesian2spherical(x, y, z):
    """Converts cartesian coordinates to spherical (azimuth, elevation, distance).

    Reference: ``kaolin/ops/coords.py:44``.
    """
    distance = jnp.sqrt(x * x + y * y + z * z)
    elevation = jnp.arcsin(y / distance)
    azimuth = jnp.arctan2(x, z)
    return azimuth, elevation, distance
