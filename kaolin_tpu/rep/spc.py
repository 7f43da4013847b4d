"""Structured Point Cloud (SPC) container.

Reference: ``kaolin/rep/spc.py:24-304``. Octrees + lengths are eager;
``max_level`` / ``pyramids`` / ``exsum`` / ``point_hierarchies`` are
computed lazily via :func:`kaolin_tpu.ops.spc.scan_octrees` /
:func:`generate_points`. Device-placement methods (``to/cuda/cpu``) are
dropped — JAX arrays are placed by the runtime.
"""

import numpy as np

from ..ops import spc as spc_ops

__all__ = ['Spc']


class Spc:
    """Batched structured point clouds (sparse octrees).

    Args:
        octrees: packed uint8 byte stream.
        lengths: (batch_size,) host int byte counts.
        max_level / pyramids / exsum / point_hierarchies: optional
            precomputed structure (see ``scan_octrees``).
    """

    KEYS = {'octrees', 'lengths', 'max_level', 'pyramids', 'exsum',
            'point_hierarchies'}

    def __init__(self, octrees, lengths, max_level=None, pyramids=None,
                 exsum=None, point_hierarchies=None, features=None):
        assert (max_level is None) == (pyramids is None) == (exsum is None), \
            "max_level, pyramids and exsum must be provided together"
        self.octrees = octrees
        self.lengths = np.asarray(lengths)
        self.features = features
        self._max_level = max_level
        self._pyramids = pyramids
        self._exsum = exsum
        self._point_hierarchies = point_hierarchies

    @property
    def batch_size(self):
        return self.lengths.shape[0]

    def _apply_scan_octrees(self):
        max_level, pyramids, exsum = spc_ops.scan_octrees(self.octrees,
                                                          self.lengths)
        self._max_level = max_level
        self._pyramids = pyramids
        self._exsum = exsum

    @property
    def max_level(self):
        if self._max_level is None:
            self._apply_scan_octrees()
        return self._max_level

    @property
    def pyramids(self):
        if self._pyramids is None:
            self._apply_scan_octrees()
        return self._pyramids

    @property
    def exsum(self):
        if self._exsum is None:
            self._apply_scan_octrees()
        return self._exsum

    @property
    def point_hierarchies(self):
        if self._point_hierarchies is None:
            self._point_hierarchies = spc_ops.generate_points(
                self.octrees, self.pyramids, self.exsum)
        return self._point_hierarchies

    @classmethod
    def make_dense(cls, level):
        """Fully-dense SPC at ``level`` (reference ``rep/spc.py:142``)."""
        from ..ops.spc.points import create_dense_spc
        octree, lengths = create_dense_spc(level)
        return cls(octree, lengths)

    @classmethod
    def from_features(cls, feature_grids, masks=None):
        """SPC with coalesced features from dense feature grids
        (reference ``rep/spc.py:160``)."""
        octrees, lengths, features = spc_ops.feature_grids_to_spc(
            feature_grids, masks)
        return cls(octrees, lengths, features=features)

    @classmethod
    def from_list(cls, octrees_list):
        """SPC from a list of single octree byte arrays
        (reference ``rep/spc.py:230``)."""
        import jax.numpy as jnp
        lengths = np.array([len(o) for o in octrees_list], dtype=np.int32)
        return cls(jnp.concatenate([jnp.asarray(o) for o in octrees_list]),
                   lengths)

    def to_dense(self, input, level=-1):
        """Scatter features into a dense grid (reference ``rep/spc.py``)."""
        return spc_ops.to_dense(self.point_hierarchies, self.pyramids,
                                input, level)

    def num_points(self, lod):
        return self.pyramids[:, 0, lod]
