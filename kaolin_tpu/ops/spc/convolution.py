"""Sparse octree convolutions (gather-GEMM formulation).

TPU-native re-design of ``kaolin/ops/spc/convolution.py:31-465`` (CUDA
``kaolin/csrc/ops/spc/convolution_cuda.cu`` + vendored MinkowskiEngine
GEMM kernels). The neighborhood map is built with the octree query walk
(:func:`kaolin_tpu.ops.spc.unbatched_query`); the convolution itself is a
per-kernel-offset gather -> matmul (MXU) -> accumulate:

``Y_i = sum_k W_k . X_{n(i,k)} + b``, with
``n(i, k) = query(2^jump * P_i + kernel_vectors[k])`` at the input level;
missing neighbors contribute zero. ``conv_transpose3d`` scatters through
the transposed map (divisibility-masked inverse neighborhood).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .spc import unbatched_query, unbatched_get_level_points

__all__ = ['conv3d', 'Conv3d', 'conv_transpose3d', 'ConvTranspose3d']


def _level_offsets(pyramid, level):
    pyramid = np.asarray(pyramid)
    return int(pyramid[1, level]), int(pyramid[0, level])


def conv3d(octrees, point_hierarchies, level, pyramids, exsum, input,
           weight, kernel_vectors, jump=0, bias=None):
    """Convolution over an unbatched-structure SPC (batch_size 1 pyramids
    supported; loop batches externally).

    Reference: ``kaolin/ops/spc/convolution.py:68``.

    Args:
        octrees: (num_bytes,) uint8.
        point_hierarchies: (num_points, 3) int16.
        level (int): level of the input features.
        pyramids: (batch_size, 2, max_level+2) — batch_size must be 1.
        exsum: (num_bytes + 1,) int32.
        input: (num_inputs, in_channels) features at ``level``.
        weight: (num_kernel_vectors, in_channels, out_channels).
        kernel_vectors: (num_kernel_vectors, 3) int offsets.
        jump (int): level downsampling (output level = level - jump).
        bias: optional (out_channels,).

    Returns:
        (output (num_outputs, out_channels), out_level (int)).
    """
    pyramids = np.asarray(pyramids)
    assert pyramids.shape[0] == 1, \
        "conv3d expects a single octree; loop over the batch externally"
    out_level = level - jump
    assert out_level >= 0
    if weight.shape[0] == 1 and jump == 0:
        out = input @ weight[0]
        if bias is not None:
            out = out + bias[None]
        return out, int(level)

    pyramid = pyramids[0]
    in_off, n_in = _level_offsets(pyramid, level)
    out_pts = unbatched_get_level_points(point_hierarchies, pyramid,
                                         out_level).astype(jnp.int32)
    kv = jnp.asarray(np.asarray(kernel_vectors), jnp.int32)
    K = kv.shape[0]
    out_ch = weight.shape[-1]
    scaled = out_pts * (2 ** jump)

    def per_offset(acc, k):
        coords = scaled + kv[k]
        pidx = unbatched_query(octrees, exsum, coords, level)
        valid = pidx >= 0
        feat_idx = jnp.clip(pidx - in_off, 0, n_in - 1)
        feats = jnp.take(input, feat_idx, axis=0)
        feats = jnp.where(valid[:, None], feats, 0.)
        return acc + feats @ weight[k], None

    init = jnp.zeros((out_pts.shape[0], out_ch), input.dtype)
    out, _ = jax.lax.scan(per_offset, init, jnp.arange(K))
    if bias is not None:
        out = out + bias[None]
    return out, int(out_level)


def conv_transpose3d(octrees, point_hierarchies, level, pyramids, exsum,
                     input, weight, kernel_vectors, jump=0, bias=None):
    """Transposed convolution (upsampling) over an SPC.

    Reference: ``kaolin/ops/spc/convolution.py:285``. Output level =
    ``level + jump``; the neighborhood map is the transpose of
    :func:`conv3d`'s.

    Returns:
        (output (num_outputs, out_channels), out_level (int)).
    """
    pyramids = np.asarray(pyramids)
    assert pyramids.shape[0] == 1
    out_level = level + jump
    if weight.shape[0] == 1 and jump == 0:
        out = input @ weight[0]
        if bias is not None:
            out = out + bias[None]
        return out, int(level)

    pyramid = pyramids[0]
    in_off, n_in = _level_offsets(pyramid, level)
    out_pts = unbatched_get_level_points(point_hierarchies, pyramid,
                                         out_level).astype(jnp.int32)
    kv = jnp.asarray(np.asarray(kernel_vectors), jnp.int32)
    K = kv.shape[0]
    out_ch = weight.shape[-1]
    step = 2 ** jump

    def per_offset(acc, k):
        shifted = out_pts - kv[k]
        divisible = jnp.all(shifted % step == 0, axis=-1) \
            & jnp.all(shifted >= 0, axis=-1)
        coarse = shifted // step
        pidx = unbatched_query(octrees, exsum, coarse, level)
        valid = (pidx >= 0) & divisible
        feat_idx = jnp.clip(pidx - in_off, 0, n_in - 1)
        feats = jnp.take(input, feat_idx, axis=0)
        feats = jnp.where(valid[:, None], feats, 0.)
        return acc + feats @ weight[k], None

    init = jnp.zeros((out_pts.shape[0], out_ch), input.dtype)
    out, _ = jax.lax.scan(per_offset, init, jnp.arange(K))
    if bias is not None:
        out = out + bias[None]
    return out, int(out_level)


class _ConvBase:
    def __init__(self, in_channels, out_channels, kernel_vectors, jump=0,
                 bias=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_vectors = np.asarray(kernel_vectors)
        self.jump = jump
        self.use_bias = bias

    def init(self, key, dtype=jnp.float32):
        K = self.kernel_vectors.shape[0]
        std = 1. / np.sqrt(self.in_channels * K)
        params = {'weight': jax.random.uniform(
            key, (K, self.in_channels, self.out_channels), dtype,
            minval=-std, maxval=std)}
        if self.use_bias:
            params['bias'] = jnp.zeros((self.out_channels,), dtype)
        return params


class Conv3d(_ConvBase):
    """Functional SPC convolution layer (reference
    ``kaolin/ops/spc/convolution.py:140``, nn.Module there)."""

    def apply(self, params, octrees, point_hierarchies, level, pyramids,
              exsum, input):
        return conv3d(octrees, point_hierarchies, level, pyramids, exsum,
                      input, params['weight'], self.kernel_vectors,
                      self.jump, params.get('bias'))

    __call__ = apply


class ConvTranspose3d(_ConvBase):
    """Functional SPC transposed-convolution layer (reference
    ``kaolin/ops/spc/convolution.py:358``)."""

    def apply(self, params, octrees, point_hierarchies, level, pyramids,
              exsum, input):
        return conv_transpose3d(octrees, point_hierarchies, level, pyramids,
                                exsum, input, params['weight'],
                                self.kernel_vectors, self.jump,
                                params.get('bias'))

    __call__ = apply
