"""Graph convolution: sparse_bmm vs dense, adjacency normalization, and
the functional ``GraphConv`` layer (reference ``kaolin/ops/gcn.py:24-199``
and its ``tests/python/kaolin/ops/test_gcn.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse
import pytest

from kaolin_tpu.ops.gcn import sparse_bmm, normalize_adj, GraphConv


def _ring_adj(n, dtype=np.float32):
    """Symmetric ring graph + self loops, as dense and BCOO."""
    dense = np.eye(n, dtype=dtype)
    for i in range(n):
        dense[i, (i + 1) % n] = 1.
        dense[i, (i - 1) % n] = 1.
    bcoo = jsparse.BCOO.fromdense(jnp.asarray(dense))
    return jnp.asarray(dense), bcoo


def test_sparse_bmm_matches_dense():
    rng = np.random.default_rng(0)
    dense, bcoo = _ring_adj(7)
    batch = jnp.asarray(rng.standard_normal((3, 7, 5)), jnp.float32)
    expected = jnp.einsum('mn,bnp->bmp', dense, batch)
    out_sparse = sparse_bmm(bcoo, batch)
    out_dense = sparse_bmm(dense, batch)
    np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_sparse_bmm_rectangular():
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((4, 6)).astype(np.float32)
    mat[mat < 0.5] = 0.
    bcoo = jsparse.BCOO.fromdense(jnp.asarray(mat))
    batch = jnp.asarray(rng.standard_normal((2, 6, 3)), jnp.float32)
    expected = np.einsum('mn,bnp->bmp', mat, np.asarray(batch))
    np.testing.assert_allclose(np.asarray(sparse_bmm(bcoo, batch)), expected,
                               rtol=1e-5, atol=1e-6)


def test_normalize_adj_row_stochastic():
    dense, bcoo = _ring_adj(9)
    norm_dense = normalize_adj(dense)
    np.testing.assert_allclose(np.asarray(norm_dense).sum(-1),
                               np.ones(9), rtol=1e-6)
    norm_sparse = normalize_adj(bcoo)
    assert isinstance(norm_sparse, jsparse.BCOO)
    np.testing.assert_allclose(np.asarray(norm_sparse.todense()),
                               np.asarray(norm_dense), rtol=1e-6, atol=1e-7)


def test_graphconv_sparse_equals_dense():
    rng = np.random.default_rng(2)
    dense, bcoo = _ring_adj(8)
    layer = GraphConv(5, 4)
    params = layer.init(jax.random.PRNGKey(0))
    feat = jnp.asarray(rng.standard_normal((2, 8, 5)), jnp.float32)
    out_d = layer(params, feat, dense)
    out_s = layer(params, feat, bcoo)
    assert out_d.shape == (2, 8, 4)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=1e-5, atol=1e-6)


def test_graphconv_manual_formula():
    """out = A_norm H W + b broadcast + H W_self + b_self."""
    rng = np.random.default_rng(3)
    dense, _ = _ring_adj(6)
    layer = GraphConv(3, 2)
    params = layer.init(jax.random.PRNGKey(1))
    feat = jnp.asarray(rng.standard_normal((1, 6, 3)), jnp.float32)
    out = layer(params, feat, dense)
    a = np.asarray(normalize_adj(dense))
    h = np.asarray(feat)[0] @ np.asarray(params['weight']) \
        + np.asarray(params['bias'])
    expected = a @ h \
        + np.asarray(feat)[0] @ np.asarray(params['weight_self']) \
        + np.asarray(params['bias_self'])
    np.testing.assert_allclose(np.asarray(out)[0], expected, rtol=1e-5,
                               atol=1e-6)


def test_graphconv_options():
    dense, _ = _ring_adj(5)
    feat = jnp.ones((1, 5, 3), jnp.float32)
    no_self = GraphConv(3, 2, self_layer=False, bias=False)
    params = no_self.init(jax.random.PRNGKey(2))
    assert set(params) == {'weight'}
    out = no_self(params, feat, dense)
    assert out.shape == (1, 5, 2)
    # row-stochastic adjacency on constant features: A H W == H W
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(feat @ params['weight']),
                               rtol=1e-5, atol=1e-6)
    # normalize_adj=False uses the raw adjacency (rows sum to 3 here)
    raw = no_self(params, feat, dense, normalize_adj=False)
    np.testing.assert_allclose(np.asarray(raw), 3 * np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_graphconv_grads_flow():
    dense, _ = _ring_adj(6)
    layer = GraphConv(3, 2)
    params = layer.init(jax.random.PRNGKey(3))
    feat = jnp.ones((1, 6, 3), jnp.float32)

    def loss(p):
        return jnp.sum(layer(p, feat, dense) ** 2)

    grads = jax.grad(loss)(params)
    for name, g in grads.items():
        assert g.shape == params[name].shape
        assert np.isfinite(np.asarray(g)).all(), name
    assert float(jnp.abs(grads['weight']).sum()) > 0
