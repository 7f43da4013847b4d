"""Pointcloud nearest-neighbour metrics: sided / Chamfer distance, f-score.

TPU-native re-design of ``kaolin/metrics/pointcloud.py:20-197`` (CUDA
kernels ``kaolin/csrc/metrics/sided_distance_cuda.cu``). The selection pass
(argmin over the brute-force pairwise distances) runs as a non-differentiable
``lax.scan`` over chunks of p2; the distance is then recomputed
differentiably from the gathered winner, so JAX autodiff reproduces the
reference's analytic backward (grad to p1 and scatter to p2) exactly
without a custom VJP.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['sided_distance', 'chamfer_distance', 'f_score']


@functools.partial(jax.jit, static_argnames=('chunk',))
def _nearest_idx(p1, p2, chunk=1024):
    """For each point of p1 (B, N1, 3), the index of the closest point of
    p2 (B, N2, 3). Non-differentiable selection; ties keep the lowest
    index (matching the CUDA sequential scan)."""
    B, N1, _ = p1.shape
    N2 = p2.shape[1]
    pad = (-N2) % chunk
    if pad:
        p2 = jnp.pad(p2, ((0, 0), (0, pad), (0, 0)),
                     constant_values=jnp.inf)
    num_chunks = (N2 + pad) // chunk
    p2c = p2.reshape(B, num_chunks, chunk, 3).transpose(1, 0, 2, 3)

    def body(carry, inp):
        best_d, best_i = carry
        p2_k, base = inp
        d = jnp.sum((p1[:, :, None, :] - p2_k[:, None, :, :]) ** 2, axis=-1)
        dmin = jnp.min(d, axis=-1)
        imin = jnp.argmin(d, axis=-1).astype(jnp.int32) + base
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d),
                jnp.where(take, imin, best_i)), None

    init = (jnp.full((B, N1), jnp.inf,
                     jnp.promote_types(p1.dtype, p2.dtype)),
            jnp.zeros((B, N1), jnp.int32))
    bases = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (_, idx), _ = jax.lax.scan(body, init, (p2c, bases))
    return idx


def _nearest(p1, p2, backend='auto'):
    # selection is non-differentiable: stop gradients on the *inputs* so
    # AD never linearizes through the pallas_call
    p1 = jax.lax.stop_gradient(p1)
    p2 = jax.lax.stop_gradient(p2)
    if backend == 'auto':
        backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    if backend in ('pallas', 'pallas_interpret', 'pallas_pruned'):
        from ..kernels.nn_distance import (nearest_idx_pallas,
                                           nearest_idx_pruned,
                                           T1, T2, MAX_REF_POINTS)
        interpret = backend == 'pallas_interpret'
        # both kernels hold the whole reference cloud in VMEM
        # (12-16 B/point); beyond that the compile fails — auto-route
        # falls back to the any-size XLA scan
        if backend != 'pallas_pruned' and p2.shape[1] > MAX_REF_POINTS:
            return _nearest_idx(p1, p2)
        # Morton-banded pruning pays once both clouds span several
        # tiles (prepass sorts cost ~3 ms fixed each); results are
        # bit-identical either way
        if (backend == 'pallas_pruned'
                or (p1.shape[1] >= 8 * T1 and p2.shape[1] >= 16 * T2)):
            return nearest_idx_pruned(p1, p2, interpret=interpret)
        return nearest_idx_pallas(p1, p2, interpret=interpret)
    return _nearest_idx(p1, p2)


def sided_distance(p1, p2, backend='auto'):
    """Squared distance (and index) from each point of p1 to its closest
    point in p2.

    Reference: ``kaolin/metrics/pointcloud.py:52``.

    Args:
        p1: (batch_size, num_points1, 3).
        p2: (batch_size, num_points2, 3).
        backend: 'auto' (Pallas VMEM-tiled kernel on TPU, XLA scan
            elsewhere), 'pallas', 'pallas_interpret', or 'xla'; all
            select identical indices (same distance form and tie rule).

    Returns:
        (dist (B, N1), idx (B, N1) int32). Differentiable w.r.t. both
        pointclouds (through the fixed nearest assignment, as in the
        reference's analytic backward).
    """
    idx = jax.lax.stop_gradient(_nearest(p1, p2, backend))
    nearest = jnp.take_along_axis(p2, idx[..., None], axis=1)
    dist = jnp.sum((p1 - nearest) ** 2, axis=-1)
    return dist, idx


def chamfer_distance(p1, p2, w1=1., w2=1., squared=True):
    """Chamfer distance between two batched pointclouds.

    Reference: ``kaolin/metrics/pointcloud.py:89``.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> p1 = jnp.asarray([[[0., 0., 0.], [1., 0., 0.]]])
        >>> p2 = jnp.asarray([[[0., 0., 1.]]])
        >>> print(round(float(chamfer_distance(p1, p2)[0]), 5))
        2.5
    """
    sdist1 = sided_distance(p1, p2)[0]
    sdist2 = sided_distance(p2, p1)[0]
    if not squared:
        sdist1 = jnp.sqrt(sdist1)
        sdist2 = jnp.sqrt(sdist2)
    dist_to_p2 = jnp.mean(sdist1, axis=-1)
    dist_to_p1 = jnp.mean(sdist2, axis=-1)
    return w1 * dist_to_p2 + w2 * dist_to_p1


def f_score(gt_points, pred_points, radius=0.01, eps=1e-8):
    """F-score of two point sets with a radius hit threshold.

    Reference: ``kaolin/metrics/pointcloud.py:138``.
    
    Example:
        >>> import numpy as np
        >>> import jax.numpy as jnp
        >>> gt = jnp.asarray([[[0., 0., 0.], [1., 0., 0.]]])
        >>> pred = jnp.asarray([[[0., 0., 0.], [5., 0., 0.]]])
        >>> print(round(float(f_score(gt, pred, radius=0.5)[0]), 5))
        0.5
    """
    pred_distances = jnp.sqrt(sided_distance(gt_points, pred_points)[0])
    gt_distances = jnp.sqrt(sided_distance(pred_points, gt_points)[0])
    dtype = gt_points.dtype
    fn = jnp.sum(pred_distances > radius, axis=1).astype(dtype)
    fp = jnp.sum(gt_distances > radius, axis=1).astype(dtype)
    tp = (gt_distances.shape[1] - fp).astype(dtype)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return 2 * (precision * recall) / (precision + recall + eps)
