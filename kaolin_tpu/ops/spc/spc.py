"""SPC octree scan / points / query / dual ops.

Reference: ``kaolin/ops/spc/spc.py:38-467`` (CUDA
``kaolin/csrc/ops/spc/{scan_octrees,generate_points,query}.cu``).

Layout contracts (matching ``spc_math.h`` / ``spc_utils.cuh``):

- ``octrees``: packed uint8 byte stream, breadth-first levels 0..L-1; bit i
  of a byte = occupancy of child octant ``i = x<<2 | y<<1 | z``.
- ``exsum``: per-octree EXCLUSIVE prefix sum of byte popcounts, size
  ``osize + 1`` (``exsum[i]`` = children before byte i; a node's children
  start at byte ``exsum[i] + bits_before_child + 1`` via the identify walk,
  ``spc_utils.cuh:32-67``).
- ``pyramids``: (batch, 2, max_level + 2) int32; ``[:, 0, l]`` = number of
  nodes at level l, ``[:, 1, l]`` = offset of level l in the point
  hierarchy, ``[:, 1, max_level + 1]`` = total points.
- ``point_hierarchies``: packed (num_points_total, 3) int16, all levels
  concatenated per octree, morton-sorted within each level.

Structure construction (scan / generate / dual / trinkets) runs on host
numpy — data-dependent shapes, preprocessing. The hot query path
(:func:`unbatched_query`) is jittable XLA.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from .points import (points_to_morton, morton_to_points, points_to_corners,
                     quantize_points, _morton_np)
from .uint8 import bits_to_uint8

__all__ = [
    'scan_octrees',
    'generate_points',
    'to_dense',
    'feature_grids_to_spc',
    'unbatched_query',
    'unbatched_get_level_points',
    'unbatched_make_dual',
    'unbatched_make_trinkets',
]


def scan_octrees(octrees, lengths):
    """Scans batched octree byte streams.

    Reference: ``kaolin/ops/spc/spc.py:38`` (CUDA ``scan_octrees.cu``).

    Args:
        octrees: packed uint8 byte stream (jnp or numpy).
        lengths: (batch_size,) host int byte counts.

    Returns:
        (max_level (int), pyramids (host numpy int32 (B, 2, L+2)),
        exsum (jnp int32, size total_bytes + batch_size)).
    
    Example:
        >>> import numpy as np, jax.numpy as jnp
        >>> octree = jnp.asarray([255], jnp.uint8)   # root, 8 children
        >>> max_level, pyramids, exsum = scan_octrees(
        ...     octree, np.array([1]))
        >>> int(max_level), int(exsum[-1])
        (1, 8)
    """
    octrees_np = np.asarray(octrees)
    lengths_np = np.asarray(lengths)
    batch_size = lengths_np.shape[0]
    pyramids = []
    exsums = []
    max_level = 0
    start = 0
    level_counts_all = []
    for b in range(batch_size):
        osize = int(lengths_np[b])
        octree = octrees_np[start:start + osize]
        start += osize
        popc = np.bitwise_count(octree).astype(np.int64)
        exsum = np.zeros(osize + 1, dtype=np.int32)
        np.cumsum(popc, out=exsum[1:])
        exsums.append(exsum)
        # walk level sizes (scan_octrees.cu:91-105)
        level_counts = [1]
        total = 1
        while total <= osize:
            lsize = int(exsum[total] - exsum[total - level_counts[-1]])
            level_counts.append(lsize)
            total += lsize
        level_counts_all.append(level_counts)
        max_level = max(max_level, len(level_counts) - 1)
    for level_counts in level_counts_all:
        pyr = np.zeros((2, max_level + 2), dtype=np.int32)
        pyr[0, :len(level_counts)] = level_counts
        pyr[1, 1:] = np.cumsum(pyr[0, :-1])
        pyramids.append(pyr)
    return max_level, np.stack(pyramids), jnp.asarray(np.concatenate(exsums))


def generate_points(octrees, pyramids, exsum):
    """Expands octree bytes into explicit point hierarchies (host numpy).

    Reference: ``kaolin/ops/spc/spc.py:73`` (CUDA ``generate_points.cu``).

    Returns:
        jnp int16 (total_points, 3) packed point hierarchies.
    """
    octrees_np = np.asarray(octrees)
    pyramids_np = np.asarray(pyramids)
    batch_size = pyramids_np.shape[0]
    max_level = pyramids_np.shape[2] - 2
    out = []
    start = 0
    for b in range(batch_size):
        osize = int(pyramids_np[b, 1, max_level])  # bytes = nodes thru L-1
        octree = octrees_np[start:start + osize]
        start += osize
        mortons = [np.zeros(1, dtype=np.int64)]
        byte_off = 0
        for l in range(max_level):
            n_l = int(pyramids_np[b, 0, l])
            bytes_l = octree[byte_off:byte_off + n_l]
            byte_off += n_l
            parent_m = mortons[l]
            bits = np.unpackbits(bytes_l[:, None], axis=1, bitorder='little')
            par_idx, child = np.nonzero(bits)
            mortons.append((parent_m[par_idx] << 3) | child.astype(np.int64))
        pts = [np.stack([_compact3_np(m >> 2), _compact3_np(m >> 1),
                         _compact3_np(m)], axis=-1).astype(np.int16)
               for m in mortons]
        out.append(np.concatenate(pts, axis=0))
    return jnp.asarray(np.concatenate(out, axis=0))


def _compact3_np(v):
    m = np.asarray(v, dtype=np.int64) & 0x249249249249
    m = (m | (m >> 2)) & 0x0C30C30C30C3
    m = (m | (m >> 4)) & 0x00F00F00F00F
    m = (m | (m >> 8)) & 0x0000FF0000FF
    m = (m | (m >> 16)) & 0xFFFF
    return m


def unbatched_get_level_points(point_hierarchy, pyramid, level):
    """Point set of one level from the hierarchy.

    Reference: ``kaolin/ops/spc/spc.py:300``.
    """
    pyramid = np.asarray(pyramid)
    return point_hierarchy[int(pyramid[1, level]):int(pyramid[1, level + 1])]


def unbatched_query(octree, exsum, query_coords, level, with_parents=False):
    """Queries point-hierarchy indices from coordinates (jittable XLA).

    Reference: ``kaolin/ops/spc/spc.py:250`` (CUDA ``query_cuda.cu`` /
    ``spc_utils.cuh identify``). The walk over levels is a static unrolled
    loop of gathers + popcounts — fully vectorized over queries.

    Args:
        octree: (num_bytes,) uint8.
        exsum: (num_bytes + 1,) int32 exclusive popcount prefix sum.
        query_coords: (num_query, 3); float in [-1, 1] or int in
            [0, 2^level].
        level (int): query level.
        with_parents: also return indices at every ancestor level.

    Returns:
        (num_query,) int32, or (num_query, level + 1) if ``with_parents``;
        -1 where empty.
    """
    if jnp.issubdtype(query_coords.dtype, jnp.floating):
        coords = jnp.floor((query_coords * 0.5 + 0.5) * (2 ** level)
                           ).astype(jnp.int32)
    else:
        coords = query_coords.astype(jnp.int32)
    maxval = (1 << level) - 1
    in_bounds = jnp.all((coords >= 0) & (coords <= maxval), axis=-1)

    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    ord_ = jnp.zeros(coords.shape[0], jnp.int32)
    alive = in_bounds
    results = [jnp.where(in_bounds, 0, -1).astype(jnp.int32)]
    for l in range(level):
        depth = level - l - 1
        child = (((x >> depth) & 1) << 2) | (((y >> depth) & 1) << 1) \
            | ((z >> depth) & 1)
        bits = jnp.take(octree, ord_, axis=0).astype(jnp.int32)
        has = ((bits >> child) & 1) > 0
        cnt = jnp.bitwise_count(
            (bits & ((2 << child) - 1)).astype(jnp.uint8)).astype(jnp.int32)
        nxt = jnp.take(exsum, ord_, axis=0).astype(jnp.int32) + cnt
        alive = alive & has
        ord_ = jnp.where(alive, nxt, ord_)
        results.append(jnp.where(alive, ord_, -1))
    if with_parents:
        return jnp.stack(results, axis=-1)
    return results[-1]


def unbatched_make_dual(point_hierarchy, pyramid):
    """Dual octree (voxel corners) point hierarchy + pyramid (host numpy).

    Reference: ``kaolin/ops/spc/spc.py:320``.
    """
    pyramid = np.asarray(pyramid)
    ph = np.asarray(point_hierarchy).astype(np.int64)
    levels = pyramid.shape[1] - 1
    pyramid_dual = np.zeros_like(pyramid)
    duals = []
    for i in range(levels):
        pts = ph[int(pyramid[1, i]):int(pyramid[1, i + 1])]
        offs = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                    indexing='ij'), axis=-1).reshape(8, 3)
        corners = (pts[:, None, :] + offs[None]).reshape(-1, 3)
        m = np.unique(_morton_np(corners))
        pts_dual = np.stack([_compact3_np(m >> 2), _compact3_np(m >> 1),
                             _compact3_np(m)], axis=-1).astype(np.int16)
        duals.append(pts_dual)
        pyramid_dual[0, i] = pts_dual.shape[0]
        if i > 0:
            pyramid_dual[1, i] = pyramid_dual[0, i - 1] + pyramid_dual[1, i - 1]
    pyramid_dual[1, levels] = (pyramid_dual[0, levels - 1]
                               + pyramid_dual[1, levels - 1])
    return jnp.asarray(np.concatenate(duals, axis=0)), pyramid_dual


def unbatched_make_trinkets(point_hierarchy, pyramid, point_hierarchy_dual,
                            pyramid_dual):
    """Indices of each primary node's 8 corners in the dual hierarchy
    (host numpy), plus parent trinket indirections.

    Reference: ``kaolin/ops/spc/spc.py:396``.

    Returns:
        (trinkets (num_points, 8) int32 jnp,
        parents (num_points,) int32 jnp — index of each point's parent in
        the point hierarchy, -1 for the root).
    """
    pyramid = np.asarray(pyramid)
    pyramid_dual = np.asarray(pyramid_dual)
    ph = np.asarray(point_hierarchy).astype(np.int64)
    phd = np.asarray(point_hierarchy_dual).astype(np.int64)
    levels = pyramid.shape[1] - 1
    trinkets = []
    parents = []
    offs = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                indexing='ij'), axis=-1).reshape(8, 3)
    for i in range(levels):
        pts = ph[int(pyramid[1, i]):int(pyramid[1, i + 1])]
        dual_lvl = phd[int(pyramid_dual[1, i]):
                       int(pyramid_dual[1, i]) + int(pyramid_dual[0, i])]
        dual_m = _morton_np(dual_lvl)
        corners = (pts[:, None, :] + offs[None]).reshape(-1, 3)
        cm = _morton_np(corners)
        loc = np.searchsorted(dual_m, cm)
        trinkets.append((loc + int(pyramid_dual[1, i])
                         ).reshape(-1, 8).astype(np.int32))
        if i == 0:
            parents.append(np.full(pts.shape[0], -1, dtype=np.int32))
        else:
            parent_pts = ph[int(pyramid[1, i - 1]):int(pyramid[1, i])]
            pm = _morton_np(parent_pts)
            my_parent_m = _morton_np(pts >> 1)
            loc = np.searchsorted(pm, my_parent_m)
            parents.append((loc + int(pyramid[1, i - 1])).astype(np.int32))
    return (jnp.asarray(np.concatenate(trinkets, axis=0)),
            jnp.asarray(np.concatenate(parents, axis=0)))


def to_dense(point_hierarchies, pyramids, input, level=-1):
    """Scatters SPC features at ``level`` into dense (B, C, D, D, D) grids.

    Reference: ``kaolin/ops/spc/spc.py:120``. Differentiable w.r.t.
    ``input`` (XLA scatter; the inverse gather is its autodiff transpose,
    replacing the reference's ToDenseFunction custom backward).
    """
    pyramids_np = np.asarray(pyramids)
    batch_size = pyramids_np.shape[0]
    max_level = pyramids_np.shape[2] - 2
    if level < 0:
        level = max_level + 1 + level
    dim = 2 ** level
    feat_dim = input.shape[-1]
    outs = []
    in_off = 0
    ph_off = 0
    for b in range(batch_size):
        n = int(pyramids_np[b, 0, level])
        off = int(pyramids_np[b, 1, level])
        total = int(pyramids_np[b, 1, max_level + 1])
        pts = point_hierarchies[ph_off + off:ph_off + off + n].astype(jnp.int32)
        feats = input[in_off:in_off + n]
        flat_idx = (pts[:, 0] * dim + pts[:, 1]) * dim + pts[:, 2]
        grid = jnp.zeros((dim * dim * dim, feat_dim), input.dtype)
        grid = grid.at[flat_idx].set(feats)
        outs.append(jnp.transpose(grid.reshape(dim, dim, dim, feat_dim),
                                  (3, 0, 1, 2)))
        in_off += n
        ph_off += total
    return jnp.stack(outs)


def feature_grids_to_spc(feature_grids, masks=None):
    """Converts dense feature grids to SPC (octree, lengths, features).

    Reference: ``kaolin/ops/spc/spc.py:171``. Host-side structure build;
    features are coalesced in morton order.
    """
    fg = np.asarray(feature_grids)
    batch_size, feat_dim = fg.shape[0], fg.shape[1]
    x_dim, y_dim, z_dim = fg.shape[2:5]
    fg = np.transpose(fg, (0, 2, 3, 4, 1))
    level = int(math.ceil(math.log2(max(x_dim, y_dim, z_dim))))
    max_dim = 2 ** level
    padded = np.zeros((batch_size, max_dim, max_dim, max_dim, feat_dim),
                      dtype=fg.dtype)
    padded[:, :x_dim, :y_dim, :z_dim] = fg
    if masks is None:
        masks_np = np.any(padded != 0, axis=-1)
    else:
        masks_np = np.zeros((batch_size, max_dim, max_dim, max_dim),
                            dtype=bool)
        masks_np[:, :x_dim, :y_dim, :z_dim] = np.asarray(masks)
    octrees = []
    lengths = []
    features = []
    for b in range(batch_size):
        occ = masks_np[b]
        idx = np.argwhere(occ)
        if idx.shape[0] == 0:
            octrees.append(np.zeros(1, dtype=np.uint8))
            lengths.append(1)
            features.append(np.zeros((0, feat_dim), dtype=fg.dtype))
            continue
        morton = np.sort(_morton_np(idx))
        pts = np.stack([_compact3_np(morton >> 2), _compact3_np(morton >> 1),
                        _compact3_np(morton)], axis=-1)
        feats = padded[b][pts[:, 0], pts[:, 1], pts[:, 2]]
        # build bytes bottom-up
        levels_bytes = []
        cur = morton
        for _ in range(level):
            parents = cur >> 3
            child = (cur & 7).astype(np.int64)
            uniq, inverse = np.unique(parents, return_inverse=True)
            by = np.zeros(uniq.shape[0], dtype=np.uint8)
            np.bitwise_or.at(by, inverse, (1 << child).astype(np.uint8))
            levels_bytes.append(by)
            cur = uniq
        levels_bytes.reverse()
        octree = np.concatenate(levels_bytes)
        octrees.append(octree)
        lengths.append(octree.shape[0])
        features.append(feats)
    return (jnp.asarray(np.concatenate(octrees)),
            np.asarray(lengths, dtype=np.int32),
            jnp.asarray(np.concatenate(features, axis=0)))
