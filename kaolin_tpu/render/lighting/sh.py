"""Spherical harmonics lighting (9 coefficients, degree 3).

Reference: ``kaolin/render/lighting/sh.py:28-123``.
"""

import math

import jax.numpy as jnp

__all__ = ['project_onto_sh9', 'sh9_irradiance', 'sh9_diffuse']


def project_onto_sh9(directions):
    """Projects cartesian directions onto degree-3 SH coefficients.

    Reference: ``kaolin/render/lighting/sh.py:28``.

    Args:
        directions: array with last dimension 3 (or a list of 3 floats).

    Returns:
        array of shape ``directions.shape[:-1] + (9,)``.
    
    Example:
        >>> import jax.numpy as jnp
        >>> sh = project_onto_sh9(jnp.asarray([[0., 0., 1.]]))
        >>> print(sh.shape, round(float(sh[0, 0]), 4))
        (1, 9) 0.2821
    """
    if isinstance(directions, (list, tuple)):
        directions = jnp.asarray(directions, jnp.float32)
    x = directions[..., 0:1]
    y = directions[..., 1:2]
    z = directions[..., 2:3]
    band0 = jnp.full_like(x, 0.28209479177)
    band1_m1 = -0.4886025119 * y
    band1_0 = 0.4886025119 * z
    band1_p1 = -0.4886025119 * x
    band2_m2 = 1.0925484305920792 * (x * y)
    band2_m1 = -1.0925484305920792 * (y * z)
    band2_0 = 0.94617469575 * (z * z) - 0.31539156525
    band2_p1 = -1.0925484305920792 * x * z
    band2_p2 = 0.5462742152960396 * (x * x - y * y)
    return jnp.concatenate([band0, band1_m1, band1_0, band1_p1, band2_m2,
                            band2_m1, band2_0, band2_p1, band2_p2], axis=-1)


def sh9_irradiance(lights, normals):
    """Approximate incident irradiance from one SH lobe of degree 3
    (clamped cosine lobe as SH).

    Reference: ``kaolin/render/lighting/sh.py:78``.

    Args:
        lights: (9,) SH coefficients.
        normals: (num_points, 3).

    Returns:
        (num_points,) irradiance.
    """
    assert lights.shape == (9,)
    assert normals.ndim == 2 and normals.shape[-1] == 3
    bands = project_onto_sh9(normals)
    scale = jnp.concatenate([
        jnp.full((1,), math.pi),
        jnp.full((3,), 2. * math.pi / 3.),
        jnp.full((5,), math.pi / 4.)]).astype(bands.dtype)
    bands = bands * scale
    return jnp.sum(bands * lights[None, :], axis=-1)


def sh9_diffuse(directions, normals, albedo):
    """Lambertian diffuse radiance from a single SH lobe.

    Reference: ``kaolin/render/lighting/sh.py:104``.
    """
    assert directions.shape == (3,)
    assert normals.ndim == 2 and normals.shape[1] == 3
    assert normals.shape == albedo.shape
    lights = project_onto_sh9(directions)
    irradiance = sh9_irradiance(lights, normals)
    return albedo * irradiance[..., None]
