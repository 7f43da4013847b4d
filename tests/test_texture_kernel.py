"""Pallas gather-free grid_sample (interpret mode) vs the XLA gather
path (which is itself torch-grid_sample-parity-tested in test_io)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.mesh.utils import grid_sample_2d


@pytest.mark.parametrize('mode', ['bilinear', 'nearest'])
@pytest.mark.parametrize('shape', [(3, 64, 64), (1, 17, 33),
                                   (4, 128, 128)])
def test_grid_sample_pallas_matches_xla(mode, shape):
    C, Hn, Wn = shape
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.random((2, C, Hn, Wn)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 37, 53, 2)), jnp.float32)
    a = grid_sample_2d(tex, grid, mode=mode, backend='xla')
    b = grid_sample_2d(tex, grid, mode=mode, backend='pallas_interpret')
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grid_sample_pallas_grads():
    rng = np.random.default_rng(1)
    tex = jnp.asarray(rng.random((1, 3, 64, 64)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 2)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(1, 3, 32, 32)), jnp.float32)

    def loss(backend):
        return lambda t, g: jnp.sum(
            grid_sample_2d(t, g, backend=backend) * cot)

    gx = jax.grad(loss('xla'), argnums=(0, 1))(tex, grid)
    gp = jax.grad(loss('pallas_interpret'), argnums=(0, 1))(tex, grid)
    np.testing.assert_allclose(np.asarray(gx[0]), np.asarray(gp[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]),
                               atol=5e-5)


def test_grid_sample_pallas_nearest_zero_coord_grad():
    rng = np.random.default_rng(2)
    tex = jnp.asarray(rng.random((1, 2, 32, 32)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8, 8, 2)), jnp.float32)

    g = jax.grad(lambda g_: jnp.sum(grid_sample_2d(
        tex, g_, mode='nearest', backend='pallas_interpret')))(grid)
    assert float(jnp.abs(g).max()) == 0.0
