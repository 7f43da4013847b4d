"""Lighting correctness anchored to numeric sphere quadrature: SG
integrals / inner products and SH projections are checked against
brute-force Fibonacci-sphere integration, independent of any closed
form (the reference anchors these only against its own torch
formulation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.lighting import (project_onto_sh9, sh9_irradiance,
                                        unbatched_sg_inner_product,
                                        approximate_sg_integral)
from kaolin_tpu.render.lighting.sg import cosine_lobe_sg


def fib_sphere(n=200_000):
    i = np.arange(n, dtype=np.float64)
    phi = (1 + 5 ** 0.5) / 2
    z = 1 - 2 * (i + 0.5) / n
    r = np.sqrt(1 - z * z)
    th = 2 * np.pi * i / phi
    return np.stack([r * np.cos(th), r * np.sin(th), z], -1)


def sg_eval(dirs, amp, mu, sharp):
    """G(v) = amp * exp(sharp * (mu . v - 1)) on (N, 3) dirs."""
    return amp[None] * np.exp(sharp * (dirs @ mu - 1.0))[:, None]


def test_sg_integral_matches_quadrature():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=3)
    mu /= np.linalg.norm(mu)
    amp = np.asarray([1.3, 0.7, 2.0])
    for sharp in (2.0, 8.0, 40.0):
        dirs = fib_sphere()
        quad = sg_eval(dirs, amp, mu, sharp).mean(0) * 4 * np.pi
        # the implementation is the reference's APPROXIMATE form
        # 2*pi*a/lambda, which drops the exp(-2*lambda) tail: divide
        # the quadrature by (1 - exp(-2*lambda)) to compare exactly
        exact_factor = 1.0 - np.exp(-2.0 * sharp)
        closed = np.asarray(approximate_sg_integral(
            jnp.asarray(amp, jnp.float32), jnp.asarray(sharp, jnp.float32)))
        np.testing.assert_allclose(closed, quad / exact_factor, rtol=2e-3)


def test_sg_inner_product_matches_quadrature():
    """<G1, G2> over the sphere equals the analytic inner product."""
    rng = np.random.default_rng(1)
    m1 = rng.normal(size=3)
    m1 /= np.linalg.norm(m1)
    m2 = rng.normal(size=3)
    m2 /= np.linalg.norm(m2)
    a1 = np.asarray([0.8, 1.1, 0.3])
    a2 = np.asarray([1.5, 0.2, 0.9])
    s1, s2 = 6.0, 11.0
    dirs = fib_sphere()
    quad = (sg_eval(dirs, a1, m1, s1)
            * sg_eval(dirs, a2, m2, s2)).mean(0) * 4 * np.pi
    out = np.asarray(unbatched_sg_inner_product(
        jnp.asarray(a1, jnp.float32)[None], jnp.asarray(m1, jnp.float32)[None],
        jnp.asarray([s1], jnp.float32),
        jnp.asarray(a2, jnp.float32)[None], jnp.asarray(m2, jnp.float32)[None],
        jnp.asarray([s2], jnp.float32)))[0, 0]
    np.testing.assert_allclose(out, quad, rtol=5e-3)


def test_cosine_lobe_sg_approximates_clamped_cosine():
    """The fitted cosine-lobe SG integrates like the clamped cosine
    (pi over the hemisphere) within the published fit error."""
    n = jnp.asarray([[0., 0., 1.]])
    amp, mu, sharp = cosine_lobe_sg(n)
    dirs = fib_sphere()
    vals = sg_eval(dirs, np.asarray(amp, np.float64).reshape(-1),
                   np.asarray(mu, np.float64).reshape(3),
                   float(np.asarray(sharp).reshape(())))
    integral = vals.mean(0) * 4 * np.pi
    # published coarse fit (amp 1.17, sharpness 2.133): ~8% high
    np.testing.assert_allclose(integral, np.pi, rtol=0.12)
    # peaks along the normal, falls off away from it
    up = sg_eval(np.asarray([[0., 0., 1.]]), np.asarray(amp).reshape(-1),
                 np.asarray(mu).reshape(3), float(np.asarray(sharp).reshape(-1)[0]))
    side = sg_eval(np.asarray([[1., 0., 0.]]), np.asarray(amp).reshape(-1),
                   np.asarray(mu).reshape(3), float(np.asarray(sharp).reshape(-1)[0]))
    assert (up > side).all()


def test_sh9_projection_matches_quadrature():
    """project_onto_sh9 evaluates the real SH basis: integrating
    basis_i * basis_j over the sphere gives the orthonormality
    relation (identity matrix / (4 pi) scaling convention checked
    empirically)."""
    dirs = fib_sphere(50_000)
    B = np.asarray(project_onto_sh9(jnp.asarray(dirs, jnp.float32)),
                   np.float64)                       # (N, 9)
    gram = (B[:, :, None] * B[:, None, :]).mean(0) * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=5e-3)


def test_sh9_irradiance_lambert_anchor():
    """A single SH light along +z produces irradiance proportional to
    the clamped cosine's SH reconstruction — peak at aligned normals,
    monotone falloff."""
    coeffs = np.zeros(9)
    coeffs[2] = 1.0               # the z-linear band
    thetas = np.linspace(0, np.pi, 9)
    normals = np.stack([np.sin(thetas), np.zeros(9), np.cos(thetas)], -1)
    ir = np.asarray(sh9_irradiance(jnp.asarray(coeffs, jnp.float32),
                                   jnp.asarray(normals, jnp.float32)))
    assert (np.diff(ir) < 1e-6).all()
    assert ir[0] > 0
