"""Coordinate-system conversions (spherical <-> cartesian).

Reference: ``kaolin/ops/coords.py:20-61``.
"""

import jax.numpy as jnp

__all__ = ['spherical2cartesian', 'cartesian2spherical']


def spherical2cartesian(azimuth, elevation, distance=None):
    """Converts spherical coordinates to cartesian.

    Reference convention (``kaolin/ops/coords.py:20``): X toward the
    camera, Z up, Y right — ``x = cos(elevation) * cos(azimuth)``,
    ``y = cos(elevation) * sin(azimuth)``, ``z = sin(elevation)``,
    all scaled by ``distance``.

    Returns:
        (x, y, z) arrays of the input shape.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> x, y, z = spherical2cartesian(jnp.asarray(0.),
        ...                               jnp.asarray(0.),
        ...                               jnp.asarray(2.))
        >>> print(round(float(x), 5), round(float(y), 5),
        ...       round(float(z), 5))
        2.0 0.0 0.0
    """
    if distance is None:
        z = jnp.sin(elevation)
        proj = jnp.cos(elevation)
    else:
        z = jnp.sin(elevation) * distance
        proj = jnp.cos(elevation) * distance
    x = proj * jnp.cos(azimuth)
    y = proj * jnp.sin(azimuth)
    return x, y, z


def cartesian2spherical(x, y, z):
    """Converts cartesian coordinates to spherical
    (azimuth, elevation, distance).

    Reference: ``kaolin/ops/coords.py:44`` (same X-toward-camera /
    Z-up / Y-right convention as :func:`spherical2cartesian`).
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> az, el, d = cartesian2spherical(jnp.asarray(0.),
        ...                                 jnp.asarray(0.),
        ...                                 jnp.asarray(3.))
        >>> print(round(float(el), 5), round(float(d), 5))
        1.5708 3.0
    """
    distance = jnp.sqrt(x * x + y * y + z * z)
    elevation = jnp.arcsin(z / distance)
    azimuth = jnp.arctan2(y, x)
    return azimuth, elevation, distance
