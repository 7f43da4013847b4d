"""Concrete dataset classes driven over synthetic on-disk trees:
ShapeNetV1/V2 (category resolution, train/test split, OBJ loading),
ModelNet (OFF), SHREC16 (OBJ), plus KaolinDataset attribute plumbing.
The reference tests these against real dataset roots
(tests/python/kaolin/io/test_shapenet.py etc.); synthetic trees cover
the same code paths hermetically."""

import os

import numpy as np
import pytest

from kaolin_tpu.io import shapenet, modelnet, shrec

CUBE_OBJ = """
v -0.5 -0.5 -0.5
v 0.5 -0.5 -0.5
v 0.5 0.5 -0.5
v -0.5 0.5 -0.5
v -0.5 -0.5 0.5
v 0.5 -0.5 0.5
v 0.5 0.5 0.5
v -0.5 0.5 0.5
f 1 2 3
f 1 3 4
f 5 6 7
f 5 7 8
"""

TRI_OFF = """OFF
3 1 0
0.0 0.0 0.0
1.0 0.0 0.0
0.0 1.0 0.0
3 0 1 2
"""


def _make_shapenet(root, version):
    # chair synset 03001627 with 4 models, table 04379243 with 2
    rel = ('model.obj' if version == 1
           else os.path.join('models', 'model_normalized.obj'))
    for synset, n in (('03001627', 4), ('04379243', 2)):
        for i in range(n):
            mdir = os.path.join(root, synset, f'model{i:02d}')
            path = os.path.join(mdir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, 'w') as f:
                f.write(CUBE_OBJ)


@pytest.mark.parametrize('version', [1, 2])
def test_shapenet_split_and_labels(tmp_path, version):
    root = str(tmp_path)
    _make_shapenet(root, version)
    cls = shapenet.ShapeNetV1 if version == 1 else shapenet.ShapeNetV2
    # category given as human label resolves through the synset map
    train = cls(root, categories=['chair'], train=True, split=0.75)
    test = cls(root, categories=['chair'], train=False, split=0.75)
    assert len(train) == 3 and len(test) == 1
    item = train[0]
    assert item.data.vertices.shape == (8, 3)
    assert item.data.faces.shape == (4, 3)
    assert item.attributes['synset'] == '03001627'
    assert 'chair' in item.attributes['labels']
    # raw synset ids work too; default = all categories
    both = cls(root, train=True, split=1.0)
    assert len(both) == 6
    with pytest.raises(ValueError):
        cls(root, categories=['02691156'])   # airplane: not in tree


def test_modelnet(tmp_path):
    root = str(tmp_path)
    for cat, n_train, n_test in (('chair', 3, 1), ('table', 2, 2)):
        for split, n in (('train', n_train), ('test', n_test)):
            d = os.path.join(root, cat, split)
            os.makedirs(d)
            for i in range(n):
                with open(os.path.join(d, f'{cat}_{i:04d}.off'),
                          'w') as f:
                    f.write(TRI_OFF)
    ds = modelnet.ModelNet(root, split='train')
    assert len(ds) == 5
    ds_chair = modelnet.ModelNet(root, categories=['chair'],
                                 split='test')
    assert len(ds_chair) == 1
    item = ds_chair[0]
    assert item.data.vertices.shape == (3, 3)
    assert item.attributes['label'] == 'chair'
    with pytest.raises(AssertionError):
        modelnet.ModelNet(root, split='val')
    with pytest.raises(ValueError):
        modelnet.ModelNet(root, categories=['sofa'])


def test_shrec16(tmp_path):
    root = str(tmp_path)
    for cat in ('airplane', 'chair'):
        for split, n in (('train', 2), ('val', 1), ('test', 1)):
            d = os.path.join(root, cat, split)
            os.makedirs(d)
            for i in range(n):
                with open(os.path.join(d, f'm{i}.obj'), 'w') as f:
                    f.write(CUBE_OBJ)
    for split, expect in (('train', 4), ('val', 2), ('test', 2)):
        ds = shrec.SHREC16(root, split=split)
        assert len(ds) == expect
    ds = shrec.SHREC16(root, categories=['chair'], split='train')
    assert len(ds) == 2
    item = ds[1]
    assert item.data.faces.shape == (4, 3)
    assert item.attributes['label'] == 'chair'
