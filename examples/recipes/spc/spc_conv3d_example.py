"""SPC 3D convolutions as a sparse mipmap: average colors down the tree.

Mirrors reference ``examples/recipes/spc/spc_conv3d_example.py``: apply
a 2x2x2 averaging ``conv3d`` with ``jump=1`` repeatedly, filtering the
finest-level colors down to the root — the 3D analog of a 2D mipmap
chain for level-of-detail rendering.
"""

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.ops.conversions import unbatched_pointcloud_to_spc
from kaolin_tpu.ops.spc import conv3d


def encode(colors, octree, point_hierarchy, pyramids, exsum, level):
    """Filters `colors` at `level` down to level 0, returning the full
    colored hierarchy (one row per octree node, coarsest first)."""
    kernel_vectors = jnp.asarray(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
         [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], jnp.int32)
    # one input channel group; each of the 8 taps contributes 1/8
    weight = jnp.full((8, colors.shape[1], colors.shape[1]), 0.0)
    weight = weight.at[:, jnp.arange(colors.shape[1]),
                       jnp.arange(colors.shape[1])].set(1.0 / 8.0)

    per_level = [colors]
    feats = colors
    for lod in range(level, 0, -1):
        feats, out_level = conv3d(octree, point_hierarchy, lod, pyramids,
                                  exsum, feats, weight, kernel_vectors,
                                  jump=1)
        per_level.append(feats)
        print(f'conv3d: level {lod} ({per_level[-2].shape[0]} cells) -> '
              f'level {out_level} ({feats.shape[0]} cells)')
    per_level.reverse()
    return jnp.concatenate(per_level, axis=0)


level = 3
rng = np.random.default_rng(0)
points = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, size=(points.shape[0], 3)),
                     jnp.float32)

spc = unbatched_pointcloud_to_spc(pointcloud=points, level=level,
                                  features=colors)
hierarchy_colors = encode(spc.features, spc.octrees,
                          spc.point_hierarchies, spc.pyramids, spc.exsum,
                          level)
print(f'colored hierarchy: {hierarchy_colors.shape[0]} nodes '
      f'({spc.point_hierarchies.shape[0]} in the SPC)')
# Note: empty cells contribute zeros to the averaging kernel, so the
# root is the leaf mean scaled by the occupancy of the tree — exactly
# the reference's conv3d semantics.
print('root color:', hierarchy_colors[0])
print('leaf mean :', jnp.mean(spc.features, axis=0))
