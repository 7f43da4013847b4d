"""Native C++ preprocessing library vs Python fallbacks."""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu import native
from kaolin_tpu.ops.spc.points import _morton_np
from kaolin_tpu.io import obj


def test_native_builds():
    assert native.get_lib() is not None, "native library failed to build"


def test_native_morton_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 1024, (500, 3)).astype(np.int16)
    m = native.points_to_morton_fast(pts)
    np.testing.assert_array_equal(m, _morton_np(pts))
    back = native.morton_to_points_fast(m)
    order = np.argsort(_morton_np(pts), kind='stable')
    # roundtrip through morton: decode(encode(p)) == p
    np.testing.assert_array_equal(native.morton_to_points_fast(
        native.points_to_morton_fast(pts)), pts)


def test_native_octree_matches_python():
    rng = np.random.default_rng(1)
    level = 6
    pts = rng.integers(0, 2 ** level, (800, 3)).astype(np.int16)
    fast = native.points_to_octree_fast(pts, level)
    # python reference build
    morton = np.unique(_morton_np(pts))
    levels = []
    cur = morton
    for _ in range(level):
        parents = cur >> 3
        child = (cur & 7)
        uniq, inv = np.unique(parents, return_inverse=True)
        by = np.zeros(uniq.shape[0], np.uint8)
        np.bitwise_or.at(by, inv, (1 << child).astype(np.uint8))
        levels.append(by)
        cur = uniq
    levels.reverse()
    ref = np.concatenate(levels)
    np.testing.assert_array_equal(fast, ref)


def test_native_obj_parse(tmp_path):
    p = tmp_path / 'a.obj'
    p.write_text("# c\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
                 "f 1/1 2/2 3/3\nf 1 3 4\n")
    out = native.obj_parse_fast(str(p))
    assert out is not None
    v, f, homo = out
    assert homo == 3
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])
    # import_mesh fast path gives the same as the python path
    mesh = obj.import_mesh(str(p))
    np.testing.assert_array_equal(np.asarray(mesh.faces), f)
    np.testing.assert_allclose(np.asarray(mesh.vertices), v)
