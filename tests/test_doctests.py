"""Runs the package's docstring examples (the reference CI runs
``pytest --doctest-modules`` over the whole package,
``ci/gitlab_jenkins_templates/ubuntu_test_CI.jenkins:72``; here the
doctest pass is part of the regular suite so one ``pytest tests/``
covers it)."""

import doctest
import importlib

import pytest

MODULES = [
    'kaolin_tpu.ops.batch',
    'kaolin_tpu.ops.reduction',
    'kaolin_tpu.ops.coords',
    'kaolin_tpu.ops.spc.points',
    'kaolin_tpu.ops.spc.uint8',
    'kaolin_tpu.ops.mesh.mesh',
    'kaolin_tpu.ops.mesh.trianglemesh',
    'kaolin_tpu.ops.conversions.tetmesh',
    'kaolin_tpu.metrics.render',
    'kaolin_tpu.metrics.voxelgrid',
    'kaolin_tpu.metrics.pointcloud',
    'kaolin_tpu.render.spc.raytrace',
    'kaolin_tpu.ops.gcn',
    'kaolin_tpu.ops.voxelgrid',
    'kaolin_tpu.ops.random',
    'kaolin_tpu.ops.mesh.tetmesh',
    'kaolin_tpu.ops.spc.spc',
    'kaolin_tpu.ops.conversions.pointcloud',
    'kaolin_tpu.metrics.trianglemesh',
    'kaolin_tpu.metrics.tetmesh',
    'kaolin_tpu.render.lighting.sh',
    'kaolin_tpu.render.camera.coordinates',
    'kaolin_tpu.ops.mesh.subdivision',
    'kaolin_tpu.io.utils',
    'kaolin_tpu.utils.testing',
    'kaolin_tpu.render.lighting.sg',
]


@pytest.mark.parametrize('modname', MODULES)
def test_module_doctests(modname):
    mod = importlib.import_module(modname)
    results = doctest.testmod(mod, verbose=False)
    assert results.attempted > 0, f'{modname} has no doctest examples'
    assert results.failed == 0, f'{modname}: {results.failed} failures'
