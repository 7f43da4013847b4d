"""Graph convolution over meshes.

Reference: ``kaolin/ops/gcn.py:24-199``. TPU-native: sparse adjacencies use
``jax.experimental.sparse.BCOO`` (or plain dense arrays — dense matmuls are
MXU-native and usually faster for mesh-sized graphs); ``GraphConv`` is a
functional layer (explicit params pytree) instead of an nn.Module.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

__all__ = ['sparse_bmm', 'normalize_adj', 'GraphConv']


def sparse_bmm(sparse_matrix, dense_matrix_batch):
    """Multiplies a (sparse or dense) matrix with a batched dense matrix.

    Reference: ``kaolin/ops/gcn.py:24``.

    Args:
        sparse_matrix: (M, N) BCOO or dense array.
        dense_matrix_batch: (batch_size, N, P).

    Returns:
        (batch_size, M, P).
    """
    m, n = sparse_matrix.shape
    b, _, p = dense_matrix_batch.shape
    dense = jnp.transpose(dense_matrix_batch, (1, 0, 2)).reshape(n, b * p)
    result = sparse_matrix @ dense
    return jnp.transpose(result.reshape(m, b, p), (1, 0, 2))


def normalize_adj(adj):
    """Row-normalizes an adjacency matrix (sparse BCOO or dense).

    Reference: ``kaolin/ops/gcn.py:48``.
    
    Example:
        >>> import jax.numpy as jnp
        >>> adj = jnp.asarray([[0., 1.], [1., 0.]]) + jnp.eye(2)
        >>> print(normalize_adj(adj))
        [[0.5 0.5]
         [0.5 0.5]]
    """
    if isinstance(adj, jsparse.BCOO):
        norm = (adj @ jnp.ones((adj.shape[0], 1), adj.dtype))[:, 0]
        row = adj.indices[:, 0]
        data = adj.data / jnp.take(norm, row)
        return jsparse.BCOO((data, adj.indices), shape=adj.shape)
    norm = adj @ jnp.ones((adj.shape[0], 1), adj.dtype)
    return adj / norm


class GraphConv:
    """Functional graph convolution: ``A H W (+ H W_self)``.

    Reference: ``kaolin/ops/gcn.py:80`` (nn.Module there; here explicit
    params — use ``init(key)`` then ``apply(params, node_feat, adj)``).
    """

    def __init__(self, input_dim, output_dim, self_layer=True, bias=True):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.self_layer = self_layer
        self.bias = bias

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        bound = 1. / np.sqrt(self.input_dim)
        params = {
            'weight': jax.random.uniform(
                k1, (self.input_dim, self.output_dim), dtype,
                minval=-bound, maxval=bound),
        }
        if self.bias:
            params['bias'] = jnp.zeros((self.output_dim,), dtype)
        if self.self_layer:
            params['weight_self'] = jax.random.uniform(
                k2, (self.input_dim, self.output_dim), dtype,
                minval=-bound, maxval=bound)
            if self.bias:
                params['bias_self'] = jnp.zeros((self.output_dim,), dtype)
        return params

    def apply(self, params, node_feat, adj, normalize_adj=True):
        if normalize_adj:
            adj = globals()['normalize_adj'](adj)
        h = node_feat @ params['weight']
        if 'bias' in params:
            h = h + params['bias']
        out = sparse_bmm(adj, h) if isinstance(adj, jsparse.BCOO) \
            else jnp.einsum('mn,bnp->bmp', adj, h)
        if self.self_layer:
            hs = node_feat @ params['weight_self']
            if 'bias_self' in params:
                hs = hs + params['bias_self']
            out = out + hs
        return out

    __call__ = apply
