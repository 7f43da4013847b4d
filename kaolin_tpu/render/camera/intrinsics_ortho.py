"""Orthographic camera intrinsics.

Reference: ``kaolin/render/camera/intrinsics_ortho.py:35-254``.
Single parameter per camera: ``fov_distance`` (view scale).
"""

import jax
import jax.numpy as jnp

from .intrinsics import (CameraIntrinsics, up_to_homogeneous,
                         down_from_homogeneous)

__all__ = ['OrthographicIntrinsics']


@jax.tree_util.register_pytree_node_class
class OrthographicIntrinsics(CameraIntrinsics):

    PARAM_NAMES = ('fov_distance',)

    @classmethod
    def from_frustum(cls, width, height, fov_distance=1.0, near=1e-2,
                     far=1e2, num_cameras=1, dtype=jnp.float32):
        """Reference: ``intrinsics_ortho.py:73``."""
        params = jnp.full((num_cameras, 1), fov_distance, dtype)
        return cls(width, height, params, near=near, far=far)

    @property
    def fov_distance(self):
        return self._get('fov_distance')

    def zoom(self, amount):
        """Scales fov_distance down (closer view); returns new instance."""
        return self._set('fov_distance',
                         jnp.maximum(self.fov_distance - amount, 1e-6))

    def orthographic_matrix(self, left, right, bottom, top, near, far):
        """(C, 4, 4) orthographic projection
        (``intrinsics_ortho.py:107``)."""
        fov = self.fov_distance
        zero = jnp.zeros_like(fov)
        one = jnp.ones_like(fov)
        W = (right - left) / 2.
        H = (top - bottom) / 2.
        D = far - near
        tx = jnp.full_like(fov, -(right + left) / (right - left))
        ty = jnp.full_like(fov, -(top + bottom) / (top - bottom))
        tz = jnp.full_like(fov, -(far + near) / (far - near))
        rows = [
            jnp.stack([2.0 / (fov * W), zero, zero, tx], axis=-1),
            jnp.stack([zero, 2.0 / (fov * H), zero, ty], axis=-1),
            jnp.stack([zero, zero, -2.0 / D * one, tz], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
        ]
        return jnp.stack(rows, axis=1)

    def projection_matrix(self):
        """Reference: ``intrinsics_ortho.py:163``."""
        top = 1.0
        right = 1.0 * self.width / self.height
        return self.orthographic_matrix(-right, right, -top, top,
                                        self.near, self.far)

    def transform(self, vectors):
        if vectors.ndim == 2:
            vectors = vectors[None]
        proj = self.projection_matrix()[:, None]
        v = up_to_homogeneous(vectors)[..., None]
        out = (proj @ v)[..., 0]
        return out[..., :3]

    def normalize_depth(self, depth):
        ndc_depth = jnp.clip(depth, self.ndc_min, self.ndc_max)
        if self.ndc_min == -1 and self.ndc_max == 1:
            return (ndc_depth + 1.) / 2.
        elif self.ndc_min == 1 and self.ndc_max == 0:
            return 1. - ndc_depth
        return ndc_depth

    @property
    def lens_type(self):
        return 'ortho'
