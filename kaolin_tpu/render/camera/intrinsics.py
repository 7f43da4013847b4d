"""Camera intrinsics base: shared lens-parameter management.

Reference: ``kaolin/render/camera/intrinsics.py:72-497``. Functional
pytree design (see :mod:`.extrinsics`).
"""

import enum

import jax
import jax.numpy as jnp

__all__ = ['CameraIntrinsics', 'CameraFOV', 'up_to_homogeneous',
           'down_from_homogeneous']


class CameraFOV(enum.Enum):
    """Camera field-of-view direction (``intrinsics.py:72``)."""
    HORIZONTAL = 0
    VERTICAL = 1
    DIAGONAL = 2


def up_to_homogeneous(vectors):
    """Appends w=1 if the last dim is 3."""
    if vectors.shape[-1] == 4:
        return vectors
    return jnp.concatenate(
        [vectors, jnp.ones_like(vectors[..., :1])], axis=-1)


def down_from_homogeneous(vectors):
    """Perspective division by the homogeneous coordinate."""
    return vectors[..., :-1] / vectors[..., -1:]


class CameraIntrinsics:
    """Base class for camera lenses (pinhole / orthographic).

    Subclasses hold a per-camera param array and static image/clip
    settings. Pytree registration happens per subclass.
    """

    PARAM_NAMES = ()          # subclass: ordered names of params columns

    def __init__(self, width, height, params, near=1e-2, far=1e2,
                 ndc_min=-1., ndc_max=1.):
        self.width = int(width)
        self.height = int(height)
        self.params = params
        self.near = float(near)
        self.far = float(far)
        self.ndc_min = float(ndc_min)
        self.ndc_max = float(ndc_max)

    # --- pytree protocol (shared) ---------------------------------------
    def tree_flatten(self):
        aux = (self.width, self.height, self.near, self.far, self.ndc_min,
               self.ndc_max)
        return (self.params,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], children[0], near=aux[2], far=aux[3],
                   ndc_min=aux[4], ndc_max=aux[5])

    def _replace_params(self, params):
        return type(self)(self.width, self.height, params, near=self.near,
                          far=self.far, ndc_min=self.ndc_min,
                          ndc_max=self.ndc_max)

    def __len__(self):
        return self.params.shape[0]

    @property
    def dtype(self):
        return self.params.dtype

    def parameters(self):
        return self.params

    def _get(self, name):
        return self.params[:, self.PARAM_NAMES.index(name)]

    def _set(self, name, val):
        col = self.PARAM_NAMES.index(name)
        return self._replace_params(
            self.params.at[:, col].set(jnp.asarray(val, self.dtype)))

    def gradient_mask(self, *args):
        """Boolean mask over params for the named lens parameters
        (``intrinsics.py:268``)."""
        want = set(args) if args else set(self.PARAM_NAMES)
        import numpy as np
        mask = np.array([n in want for n in self.PARAM_NAMES])
        return jnp.broadcast_to(jnp.asarray(mask), self.params.shape)

    @classmethod
    def cat(cls, intrinsics_list):
        first = intrinsics_list[0]
        return first._replace_params(
            jnp.concatenate([i.params for i in intrinsics_list]))

    def __getitem__(self, idx):
        if isinstance(idx, int):
            idx = slice(idx, idx + 1)
        return self._replace_params(self.params[idx])

    def allclose(self, other, rtol=1e-5, atol=1e-8):
        return (type(self) is type(other)
                and (self.width, self.height) == (other.width, other.height)
                and bool(jnp.allclose(self.params, other.params, rtol=rtol,
                                      atol=atol)))

    # --- interface -------------------------------------------------------
    def projection_matrix(self):
        raise NotImplementedError

    def transform(self, vectors):
        raise NotImplementedError

    def zoom(self, amount):
        raise NotImplementedError

    def __repr__(self):
        return (f"{type(self).__name__}(num_cameras={len(self)}, "
                f"width={self.width}, height={self.height})")
