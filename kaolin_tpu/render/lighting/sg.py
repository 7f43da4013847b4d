"""Spherical gaussians lighting: distribution, warping, fresnel,
specular/diffuse reflectance, inner products.

Reference: ``kaolin/render/lighting/sg.py:36-511`` (CUDA kernel
``kaolin/csrc/render/sg/unbatched_reduced_sg_inner_product_cuda.cu``).
The fused reduced inner product is a broadcast-and-reduce that XLA fuses
on its own (chunked over lights via ``lax.scan`` to bound memory);
autodiff supplies the backward, replacing the analytic CUDA kernel.
"""

import math
import functools

import jax
import jax.numpy as jnp

__all__ = [
    'sg_distribution_term',
    'sg_warp_distribution',
    'fresnel',
    'sg_warp_specular_term',
    'cosine_lobe_sg',
    'approximate_sg_integral',
    'sg_irradiance_fitted',
    'sg_diffuse_fitted',
    'sg_irradiance_inner_product',
    'sg_diffuse_inner_product',
    'unbatched_sg_inner_product',
    'unbatched_reduced_sg_inner_product',
]


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _reflect(direction, normal):
    return direction - 2 * _dot(direction, normal) * normal


def _ggx_v1(m2, nDotX):
    return 1. / (nDotX + jnp.sqrt(m2 + (1. - m2) * nDotX * nDotX))


def sg_distribution_term(direction, roughness):
    """SG approximation of the Trowbridge-Reitz (GGX) distribution.

    Reference: ``kaolin/render/lighting/sg.py:51``.
    """
    m2 = roughness * roughness
    sharpness = 2. / m2
    amplitude = jnp.broadcast_to((1. / (math.pi * m2))[:, None],
                                 direction.shape)
    return amplitude, direction, sharpness


def sg_warp_distribution(amplitude, direction, sharpness, view):
    """Warps SG lobes toward the current BRDF slice (Wang et al.).

    Reference: ``kaolin/render/lighting/sg.py:81``.
    """
    warp_direction = _reflect(-view, direction)
    warp_sharpness = sharpness / (
        4. * jnp.clip(_dot(direction, view)[..., 0], 1e-4, None))
    return amplitude, warp_direction, warp_sharpness


def fresnel(ldh, spec_albedo):
    """Schlick fresnel (``sg.py:120``)."""
    powTerm = (1. - ldh) ** 5
    return spec_albedo + (1. - spec_albedo) * powTerm


def sg_warp_specular_term(amplitude, direction, sharpness, normal,
                          roughness, view, spec_albedo):
    """Cook-Torrance specular reflectance from SG lights.

    Reference: ``kaolin/render/lighting/sg.py:124``.
    """
    ndf_a, ndf_d, ndf_s = sg_distribution_term(normal, roughness)
    ndf_a, ndf_d, ndf_s = sg_warp_distribution(ndf_a, ndf_d, ndf_s, view)
    ndl = jnp.clip(_dot(normal, ndf_d), 0., 1.)
    ndv = jnp.clip(_dot(normal, view), 0., 1.)
    h = ndf_d + view
    h = h / jnp.sqrt(_dot(h, h))
    ldh = jnp.clip(_dot(ndf_d, h), 0., 1.)
    output = unbatched_reduced_sg_inner_product(
        ndf_a, ndf_d, ndf_s, amplitude, direction, sharpness)
    m2 = (roughness * roughness)[:, None]
    output = output * _ggx_v1(m2, ndl) * _ggx_v1(m2, ndv)
    output = output * fresnel(ldh, spec_albedo)
    output = output * ndl
    return jnp.clip(output, 0., None)


def cosine_lobe_sg(direction):
    """Clamped-cosine lobe as an SG (``sg.py:184``).

    Example:
        >>> import jax.numpy as jnp
        >>> amp, dirn, sharp = cosine_lobe_sg(jnp.asarray([[0., 0., 1.]]))
        >>> amp.shape, dirn.shape, sharp.shape
        ((1, 3), (1, 3), (1,))
        >>> import math
        >>> integ = approximate_sg_integral(amp, sharp)
        >>> bool(jnp.allclose(integ, 2 * math.pi * 1.17 / 2.133,
        ...                   rtol=1e-5))
        True
    """
    amplitude = jnp.full_like(direction, 1.17)
    sharpness = jnp.full_like(direction[:, 0], 2.133)
    return amplitude, direction, sharpness


def approximate_sg_integral(amplitude, sharpness):
    """Approximate SG integral (``sg.py:205``)."""
    return 2. * math.pi * (amplitude / sharpness[..., None])


def sg_irradiance_fitted(amplitude, direction, sharpness, normal):
    """Fitted-polynomial irradiance per (point, SG) (``sg.py:220``)."""
    mu_n = jnp.einsum('ik,jk->ij', normal, direction)
    lbda = sharpness[None, :]
    c0 = 0.36
    c1 = 1. / (4. * c0)
    eml = jnp.exp(-lbda)
    em2l = eml * eml
    rl = 1. / lbda
    scale = 1. + 2. * em2l - rl
    bias = (eml - em2l) * rl - em2l
    x = jnp.sqrt(1. - scale)
    x0 = c0 * mu_n
    x1 = c1 * x
    n = x0 + x1
    y = jnp.where(jnp.abs(x0) <= x1, n * n / x, jnp.clip(mu_n, 0., 1.))
    result = scale * y + bias
    return result[..., None] * approximate_sg_integral(
        amplitude, sharpness)[None]


def sg_diffuse_fitted(amplitude, direction, sharpness, normal, albedo):
    """Lambertian diffuse with the fitted irradiance (``sg.py:279``)."""
    brdf = albedo / math.pi
    return jnp.clip(
        sg_irradiance_fitted(amplitude, direction, sharpness,
                             normal).mean(1), 0., None) * brdf


def sg_irradiance_inner_product(amplitude, direction, sharpness, normal):
    """Irradiance via SG inner product with a cosine lobe (``sg.py:318``)."""
    la, ld, ls = cosine_lobe_sg(normal)
    return jnp.clip(unbatched_reduced_sg_inner_product(
        la, ld, ls, amplitude, direction, sharpness), 0., None)


def sg_diffuse_inner_product(amplitude, direction, sharpness, normal,
                             albedo):
    """DIB-R++ diffuse reflectance (``sg.py:351``)."""
    brdf = albedo / math.pi
    return sg_irradiance_inner_product(amplitude, direction, sharpness,
                                       normal) * brdf


def unbatched_sg_inner_product(amplitude, direction, sharpness,
                               other_amplitude, other_direction,
                               other_sharpness):
    """Pairwise SG inner products, (num_sg, num_other, 3).

    Reference: ``kaolin/render/lighting/sg.py:392``.
    """
    ns = amplitude.shape[0]
    no = other_amplitude.shape[0]
    a = amplitude.reshape(ns, 1, 3)
    d = direction.reshape(ns, 1, 3)
    s = sharpness.reshape(ns, 1, 1)
    oa = other_amplitude.reshape(1, no, 3)
    od = other_direction.reshape(1, no, 3)
    os_ = other_sharpness.reshape(1, no, 1)
    dm = s * d + os_ * od
    dm = jnp.sqrt(_dot(dm, dm))
    lm = s + os_
    expo = jnp.exp(dm - lm) * (a * oa)
    other = 1.0 - jnp.exp(-2.0 * dm)
    return 2.0 * math.pi * expo * other / dm


def unbatched_reduced_sg_inner_product(amplitude, direction, sharpness,
                                       other_amplitude, other_direction,
                                       other_sharpness, chunk=512):
    """Sum over the 'other' SGs of the pairwise inner product, fused.

    Reference: ``kaolin/render/lighting/sg.py:472`` (CUDA kernel); here a
    lax.scan over light chunks so memory stays O(num_sg * chunk).
    """
    no = other_amplitude.shape[0]
    if no <= chunk:
        return unbatched_sg_inner_product(
            amplitude, direction, sharpness, other_amplitude,
            other_direction, other_sharpness).sum(1)
    pad = (-no) % chunk
    oa = jnp.pad(other_amplitude, ((0, pad), (0, 0)))
    od = jnp.pad(other_direction, ((0, pad), (0, 0)),
                 constant_values=1.)   # dummy direction, zero amplitude
    os_ = jnp.pad(other_sharpness, (0, pad), constant_values=1.)
    n_chunks = (no + pad) // chunk

    def body(acc, inp):
        a_k, d_k, s_k = inp
        out = unbatched_sg_inner_product(amplitude, direction, sharpness,
                                         a_k, d_k, s_k).sum(1)
        return acc + out, None

    init = jnp.zeros_like(amplitude)
    acc, _ = jax.lax.scan(body, init,
                          (oa.reshape(n_chunks, chunk, 3),
                           od.reshape(n_chunks, chunk, 3),
                           os_.reshape(n_chunks, chunk)))
    return acc
