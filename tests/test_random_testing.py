"""Random test-data generators and the testing-helper module.

Reference: ``tests/python/kaolin/ops/test_random.py`` and
``tests/python/kaolin/utils/test_testing.py`` — seeded determinism,
octree structural validity, shape/dtype checkers with both throw and
bool modes, padded-tensor padding validation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import random as krandom
from kaolin_tpu.ops.spc import scan_octrees
from kaolin_tpu.utils.testing import (with_seed, check_tensor,
                                      check_packed_tensor,
                                      check_padded_tensor, check_spc_octrees,
                                      tensor_info, contained_allclose,
                                      contained_torch_equal,
                                      FLOAT_DTYPES, INT_DTYPES, ALL_DTYPES)


def test_manual_seed_determinism():
    krandom.manual_seed(42)
    a = krandom.random_tensor(0., 1., (4, 3))
    sp_a = krandom.random_shape_per_tensor(3, max_shape=(10, 10))
    krandom.manual_seed(42)
    b = krandom.random_tensor(0., 1., (4, 3))
    sp_b = krandom.random_shape_per_tensor(3, max_shape=(10, 10))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(sp_a, sp_b)
    # and a different seed diverges
    krandom.manual_seed(43)
    c = krandom.random_tensor(0., 1., (4, 3))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_get_set_state_roundtrip():
    krandom.manual_seed(7)
    state = krandom.get_state()
    first = krandom.random_tensor(0., 1., (5,))
    first_np = krandom.random_shape_per_tensor(2, max_shape=(6,))
    krandom.set_state(state)
    again = krandom.random_tensor(0., 1., (5,))
    again_np = krandom.random_shape_per_tensor(2, max_shape=(6,))
    np.testing.assert_array_equal(np.asarray(first), np.asarray(again))
    np.testing.assert_array_equal(first_np, again_np)


def test_random_shape_per_tensor_bounds():
    krandom.manual_seed(0)
    shapes = krandom.random_shape_per_tensor(64, min_shape=(2, 3),
                                             max_shape=(5, 9))
    assert shapes.shape == (64, 2)
    assert shapes[:, 0].min() >= 2 and shapes[:, 0].max() <= 5
    assert shapes[:, 1].min() >= 3 and shapes[:, 1].max() <= 9
    with pytest.raises(ValueError):
        krandom.random_shape_per_tensor(2)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.int32, jnp.bool_])
def test_random_tensor_dtypes(dtype):
    krandom.manual_seed(1)
    t = krandom.random_tensor(0, 7, (100,), dtype=dtype)
    assert t.shape == (100,)
    if dtype == jnp.bool_:
        assert t.dtype == jnp.bool_
    else:
        assert t.dtype == dtype
        arr = np.asarray(t)
        assert arr.min() >= 0 and arr.max() <= 7


def test_sample_spherical_coords_ranges():
    krandom.manual_seed(2)
    az, el = krandom.sample_spherical_coords(
        (1000,), azimuth_low=0.5, azimuth_high=1.5,
        elevation_low=0.1, elevation_high=0.9)
    az, el = np.asarray(az), np.asarray(el)
    assert az.min() >= 0.5 and az.max() <= 1.5
    assert el.min() >= 0.1 - 1e-6 and el.max() <= 0.9 + 1e-6
    # sin-uniform elevation: E[sin(el)] should be mid-range of sin bounds
    expected = (np.sin(0.1) + np.sin(0.9)) / 2
    assert np.sin(el).mean() == pytest.approx(expected, abs=0.02)


def test_random_spc_octrees_are_valid():
    krandom.manual_seed(3)
    octrees, lengths = krandom.random_spc_octrees(3, 4)
    assert lengths.shape == (3,)
    assert int(lengths.sum()) == octrees.shape[0]
    # structurally valid per the checker AND scannable by the core
    assert check_spc_octrees(octrees, lengths, batch_size=3, level=4)
    max_level, pyramids, exsum = scan_octrees(octrees, lengths)
    assert max_level == 4
    assert pyramids.shape[0] == 3


def test_with_seed_decorator():
    @with_seed(99)
    def draw():
        return np.asarray(krandom.random_tensor(0., 1., (3,)))

    np.testing.assert_array_equal(draw(), draw())


def test_check_tensor_modes():
    t = jnp.zeros((2, 3), jnp.float32)
    assert check_tensor(t, shape=(2, 3), dtype=jnp.float32)
    assert check_tensor(t, shape=(2, None))
    assert not check_tensor(t, shape=(3, 3), throw=False)
    assert not check_tensor(t, shape=(2, 3, 1), throw=False)
    assert not check_tensor(t, dtype=jnp.int32, throw=False)
    with pytest.raises(ValueError):
        check_tensor(t, shape=(3, 3))
    with pytest.raises(TypeError):
        check_tensor(t, dtype=jnp.int32)


def test_check_packed_tensor():
    t = jnp.zeros((10, 4))
    assert check_packed_tensor(t, total_numel=10, last_dim=4)
    assert not check_packed_tensor(t, total_numel=9, throw=False)


def test_check_padded_tensor_padding_values():
    spt = np.array([[2], [3]])
    padded = np.zeros((2, 4, 3), np.float32)
    padded[0, :2] = 1.
    padded[1, :3] = 2.
    t = jnp.asarray(padded)
    assert check_padded_tensor(t, padding_value=0., shape_per_tensor=spt,
                               batch_size=2, last_dim=3)
    bad = padded.copy()
    bad[0, 3, 0] = 5.  # write into the padding region
    assert not check_padded_tensor(jnp.asarray(bad), padding_value=0.,
                                   shape_per_tensor=spt, throw=False)
    with pytest.raises(ValueError):
        check_padded_tensor(jnp.asarray(bad), padding_value=0.,
                            shape_per_tensor=spt)


def test_check_spc_octrees_rejects_malformed():
    # root byte 0x03 -> 2 children, but only 1 more byte present
    bad = jnp.asarray(np.array([0x03, 0x01], np.uint8))
    assert not check_spc_octrees(bad, np.array([2]), throw=False)
    with pytest.raises(ValueError):
        check_spc_octrees(bad, np.array([2]))
    # length sum mismatch
    good = jnp.asarray(np.array([0x01, 0x01], np.uint8))
    assert not check_spc_octrees(good, np.array([3]), throw=False)
    # batch_size mismatch
    assert not check_spc_octrees(good, np.array([2]), batch_size=2,
                                 throw=False)
    # wrong level
    assert not check_spc_octrees(good, np.array([2]), level=3, throw=False)
    assert check_spc_octrees(good, np.array([2]), level=2)


def test_tensor_info_and_contained_helpers():
    t = jnp.asarray([[1., 2.], [3., 4.]])
    s = tensor_info(t, name='x', print_stats=True)
    assert 'x:' in s and 'shape=(2, 2)' in s and 'min=1' in s
    nested_a = {'a': t, 'b': [jnp.arange(3)]}
    nested_b = {'a': t + 0., 'b': [jnp.arange(3)]}
    assert contained_allclose(nested_a, nested_b)
    assert contained_torch_equal(nested_a, nested_b)
    nested_c = {'a': t + 1e-7, 'b': [jnp.arange(3)]}
    assert contained_allclose(nested_a, nested_c)
    assert not contained_torch_equal(nested_a, nested_c)
    assert not contained_allclose(nested_a, {'a': t})
    assert len(FLOAT_DTYPES) == 2 and len(INT_DTYPES) == 3
    assert ALL_DTYPES == FLOAT_DTYPES + INT_DTYPES


def test_check_spc_octrees_multi_batch():
    # two single-path octrees of different depth concatenated
    a = np.array([0x01, 0x01], np.uint8)          # level 2
    b = np.array([0x80, 0x01, 0x01], np.uint8)    # level 3
    octrees = jnp.asarray(np.concatenate([a, b]))
    lengths = np.array([2, 3])
    assert check_spc_octrees(octrees, lengths, batch_size=2)
    # mixed levels fail a uniform level check
    assert not check_spc_octrees(octrees, lengths, level=2, throw=False)


def test_tensor_info_int_dtype_stats():
    t = jnp.asarray([1, 2, 3], jnp.int32)
    s = tensor_info(t, name='ints', print_stats=True)
    assert 'min=1' in s and 'max=3' in s and 'mean' not in s
