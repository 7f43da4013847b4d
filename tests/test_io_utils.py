"""Heterogeneous-mesh handler unit tests.

Reference: ``kaolin/io/utils.py:22-75`` and
``tests/python/kaolin/io/test_utils.py`` — fan triangulation of mixed
tri/quad/n-gon faces across multiple per-face-vertex feature arrays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.io.utils import (NonHomogeneousMeshError,
                                 heterogeneous_mesh_handler_skip,
                                 heterogeneous_mesh_handler_empty,
                                 heterogeneous_mesh_handler_naive_homogenize)


def _mixed_mesh():
    vertices = jnp.asarray(np.random.default_rng(0).standard_normal((8, 3)),
                           jnp.float32)
    counts = np.array([3, 4, 5], np.int64)
    # flat per-face vertex-index list: one tri, one quad, one pentagon
    face_idx = np.array([0, 1, 2,
                         1, 2, 3, 4,
                         3, 4, 5, 6, 7], np.int64)
    return vertices, counts, face_idx


def test_skip_handler_returns_none():
    assert heterogeneous_mesh_handler_skip(1, 2, 3) is None


def test_empty_handler_shapes():
    vertices, counts, face_idx = _mixed_mesh()
    out = heterogeneous_mesh_handler_empty(vertices, counts, face_idx,
                                           face_idx)
    v, c, f1, f2 = out
    assert v.shape == (0, 3)
    assert c.shape == (0,)
    assert f1.shape == (0, 3) and f2.shape == (0, 3)


def test_naive_homogenize_fan():
    vertices, counts, face_idx = _mixed_mesh()
    v, new_counts, faces = heterogeneous_mesh_handler_naive_homogenize(
        vertices, counts, face_idx)
    # vertices pass through untouched
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vertices))
    # tri -> 1, quad -> 2, pentagon -> 3 triangles
    assert faces.shape == (6, 3)
    np.testing.assert_array_equal(new_counts, np.full(6, 3))
    np.testing.assert_array_equal(
        faces,
        [[0, 1, 2],
         [1, 2, 3], [1, 3, 4],
         [3, 4, 5], [3, 5, 6], [3, 6, 7]])


def test_naive_homogenize_multiple_features_and_none():
    vertices, counts, face_idx = _mixed_mesh()
    uv_idx = face_idx + 100
    v, new_counts, faces, uvs, missing = \
        heterogeneous_mesh_handler_naive_homogenize(
            vertices, counts, face_idx, uv_idx, None)
    assert missing is None
    # every feature array is fanned with the same pattern
    np.testing.assert_array_equal(uvs, faces + 100)


def test_naive_homogenize_all_triangles_is_identity():
    vertices = jnp.zeros((3, 3))
    counts = np.array([3, 3], np.int64)
    face_idx = np.array([0, 1, 2, 2, 1, 0], np.int64)
    _, new_counts, faces = heterogeneous_mesh_handler_naive_homogenize(
        vertices, counts, face_idx)
    np.testing.assert_array_equal(faces, [[0, 1, 2], [2, 1, 0]])
    np.testing.assert_array_equal(new_counts, [3, 3])


def test_error_type_carries_message():
    err = NonHomogeneousMeshError("mesh has faces with 3 and 4 vertices")
    assert err.message == "mesh has faces with 3 and 4 vertices"
    assert isinstance(err, Exception)
    with pytest.raises(NonHomogeneousMeshError, match="3 and 4"):
        raise err


def test_empty_handler_no_features():
    vertices, counts, _ = _mixed_mesh()
    v, c = heterogeneous_mesh_handler_empty(vertices, counts)
    assert v.shape == (0, 3) and c.shape == (0,)


def test_naive_homogenize_single_pentagon():
    vertices = jnp.zeros((5, 3))
    _, new_counts, faces = heterogeneous_mesh_handler_naive_homogenize(
        vertices, np.array([5]), np.arange(5))
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3], [0, 3, 4]])
