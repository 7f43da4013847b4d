"""Checkpoint / resume of optimization state (SURVEY §5: the reference
has only Timelapse visualization checkpoints; param checkpointing is a
new first-class TPU-build capability)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kaolin_tpu.utils.checkpoint import (CheckpointManager, save_pytree,
                                         load_pytree)


def test_pytree_roundtrip(tmp_path):
    tree = {'a': jnp.arange(5.), 'b': (jnp.ones((2, 3)), 7),
            'c': {'d': jnp.asarray([True, False])}}
    save_pytree(str(tmp_path / 'ck'), tree)
    back = load_pytree(str(tmp_path / 'ck'))
    np.testing.assert_array_equal(back['a'], np.arange(5.))
    np.testing.assert_array_equal(back['b'][0], np.ones((2, 3)))
    assert back['b'][1] == 7
    np.testing.assert_array_equal(back['c']['d'], [True, False])


def test_manager_retention_and_resume(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    params = jnp.asarray([1., 2., 3.])
    opt = optax.adam(1e-1)
    state = opt.init(params)

    def step(p, s):
        g = 2. * p
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s

    for i in range(5):
        params, state = step(params, state)
        mgr.save(i, {'params': params, 'opt': state, 'step': i})
    assert mgr.all_steps() == [3, 4]
    assert mgr.latest_step() == 4

    # resume into the live structures (optax state classes)
    like = {'params': jnp.zeros(3), 'opt': opt.init(jnp.zeros(3)),
            'step': 0}
    restored = mgr.restore(mgr.latest_step(), like=like)
    assert restored['step'] == 4
    np.testing.assert_allclose(np.asarray(restored['params']),
                               np.asarray(params), rtol=1e-6)
    # continue training from the restored state: must match uninterrupted
    p_cont, s_cont = step(restored['params'], restored['opt'])
    p_ref, _ = step(params, state)
    np.testing.assert_allclose(np.asarray(p_cont), np.asarray(p_ref),
                               rtol=1e-6)


def test_restore_missing(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.latest_step() is None
    with pytest.raises(ValueError):
        mgr.restore(mgr.latest_step())
