import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import batch as kb
from kaolin_tpu.ops.reduction import packed_simple_sum


@pytest.fixture
def tensor_list():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
            for n in (2, 5, 3)]


def test_list_to_packed_roundtrip(tensor_list):
    packed, spt = kb.list_to_packed(tensor_list)
    assert packed.shape == (10, 3)
    assert spt.tolist() == [[2], [5], [3]]
    out = kb.packed_to_list(packed, spt)
    for a, b in zip(out, tensor_list):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_list_to_padded_roundtrip(tensor_list):
    padded, spt = kb.list_to_padded(tensor_list, padding_value=-1.)
    assert padded.shape == (3, 5, 3)
    assert np.asarray(padded)[0, 2:].tolist() == [[-1.] * 3] * 3
    out = kb.padded_to_list(padded, spt)
    for a, b in zip(out, tensor_list):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_padded_conversions(tensor_list):
    packed, spt = kb.list_to_packed(tensor_list)
    padded = kb.packed_to_padded(packed, spt)
    packed2 = kb.padded_to_packed(padded, spt)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(packed2))


def test_get_first_idx():
    assert kb.get_first_idx(np.array([2, 3, 5])).tolist() == [0, 2, 5, 10]


def test_tile_to_packed():
    out = kb.tile_to_packed(jnp.asarray([0., 6., 7.]), np.array([2, 2, 3]))
    assert np.asarray(out).ravel().tolist() == [0., 0., 6., 6., 7., 7., 7.]


def test_packed_simple_sum(tensor_list):
    packed, spt = kb.list_to_packed(tensor_list)
    numel = spt[:, 0]
    out = packed_simple_sum(packed, numel)
    expected = [float(np.asarray(t).sum()) for t in tensor_list]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_fill_max_shape():
    spt = np.array([[2, 3], [4, 1]])
    np.testing.assert_array_equal(kb.fill_max_shape(spt), [4, 3])
    np.testing.assert_array_equal(kb.fill_max_shape(spt, [-1, 7]), [4, 7])
    with pytest.raises(ValueError):
        kb.fill_max_shape(spt, [3, 3])


def test_spherical_cartesian_convention_and_roundtrip():
    """X-toward-camera / Z-up / Y-right (``kaolin/ops/coords.py:20``):
    azimuth 0, elevation 0 -> +x; elevation pi/2 -> +z."""
    from kaolin_tpu.ops.coords import spherical2cartesian, cartesian2spherical
    az = jnp.asarray([0., np.pi / 2, 0., 0.7])
    el = jnp.asarray([0., 0., np.pi / 2, -0.3])
    d = jnp.asarray([1., 2., 3., 1.5])
    x, y, z = spherical2cartesian(az, el, d)
    np.testing.assert_allclose(
        np.stack([x, y, z], -1)[:3],
        [[1., 0., 0.], [0., 2., 0.], [0., 0., 3.]], atol=1e-6)
    az2, el2, d2 = cartesian2spherical(x, y, z)
    np.testing.assert_allclose(np.asarray(az2), np.asarray(az), atol=1e-6)
    np.testing.assert_allclose(np.asarray(el2), np.asarray(el), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-6)
    # distance=None defaults to the unit sphere
    x1, y1, z1 = spherical2cartesian(az, el)
    np.testing.assert_allclose(np.asarray(x1 * x1 + y1 * y1 + z1 * z1),
                               1., atol=1e-6)


def test_list_to_padded_custom_shape_and_value():
    """Explicit max_shape (over the non-last dims) + padding_value
    (reference ops/batch.py:254), plus the undersized-max_shape error."""
    from kaolin_tpu.ops.batch import list_to_padded, padded_to_list
    a = jnp.arange(6.).reshape(2, 3)
    b = jnp.arange(3.).reshape(1, 3)
    padded, shapes = list_to_padded([a, b], max_shape=(4,),
                                    padding_value=-7.)
    assert padded.shape == (2, 4, 3)
    assert float(padded[0, 3, 2]) == -7.
    assert float(padded[1, 0, 2]) == 2.
    back = padded_to_list(padded, shapes)
    np.testing.assert_array_equal(np.asarray(back[0]), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(back[1]), np.asarray(b))
    with pytest.raises((ValueError, AssertionError)):
        list_to_padded([a, b], max_shape=(1,))


def test_packed_to_padded_and_back():
    from kaolin_tpu.ops.batch import (list_to_packed, packed_to_padded,
                                      padded_to_packed)
    ts = [jnp.full((n, 2), float(i)) for i, n in enumerate((3, 1, 4))]
    packed, shapes = list_to_packed(ts)
    padded = packed_to_padded(packed, shapes, padding_value=0.)
    assert padded.shape == (3, 4, 2)
    assert float(padded[1, 0, 0]) == 1. and float(padded[1, 3, 0]) == 0.
    repacked = padded_to_packed(padded, shapes)
    np.testing.assert_array_equal(np.asarray(repacked),
                                  np.asarray(packed))


def test_packed_ops_preserve_dtype():
    from kaolin_tpu.ops.batch import list_to_packed, list_to_padded
    for dt in (jnp.float32, jnp.float64, jnp.int32):
        ts = [jnp.ones((2, 3), dt), jnp.ones((4, 3), dt)]
        packed, _ = list_to_packed(ts)
        padded, _ = list_to_padded(ts)
        assert packed.dtype == dt and padded.dtype == dt


def test_single_and_empty_subtensors():
    from kaolin_tpu.ops.batch import list_to_packed, packed_to_list
    from kaolin_tpu.ops.reduction import packed_simple_sum
    ts = [jnp.ones((0, 3)), jnp.full((2, 3), 5.), jnp.ones((1, 3))]
    packed, shapes = list_to_packed(ts)
    assert packed.shape == (3, 3)
    back = packed_to_list(packed, shapes)
    assert back[0].shape == (0, 3) and back[2].shape == (1, 3)
    # packed_simple_sum sums over ALL elements per sub-tensor
    sums = packed_simple_sum(packed, np.asarray([0, 2, 1]))
    np.testing.assert_allclose(np.asarray(sums), [0., 30., 3.])
