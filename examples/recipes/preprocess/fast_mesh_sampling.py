"""Preprocessing a mesh dataset for fast point-cloud sampling at runtime.

Mirrors reference ``examples/recipes/preprocess/fast_mesh_sampling.py``:
the expensive part of surface sampling (loading the mesh, computing face
areas, oversampling) is done ONCE and cached to disk with
``CachedDataset``; the runtime transform then only subsamples — cheap
enough for the training loop's hot path.

Pass ``--shapenet-dir`` to run on ShapeNet v2; without it, a synthetic
two-mesh dataset stands in so the recipe runs anywhere.
"""

import argparse
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

import kaolin_tpu as kal
from kaolin_tpu.io.dataset import CachedDataset, KaolinDataset

parser = argparse.ArgumentParser()
parser.add_argument('--shapenet-dir', type=str, default=None)
parser.add_argument('--cache-dir', type=str,
                    default=tempfile.mkdtemp(prefix='kal_cache_'))
parser.add_argument('--num-samples', type=int, default=1024)
parser.add_argument('--num-oversample', type=int, default=16384)
args = parser.parse_args()


class _SyntheticMeshes(KaolinDataset):
    """Stand-in for ShapeNet: two unit shapes."""

    def __len__(self):
        return 2

    def get_data(self, i):
        p = (1 + 5 ** 0.5) / 2
        verts = jnp.asarray(
            [[-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
             [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
             [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1]],
            jnp.float32) * (0.5 + 0.5 * i)
        faces = jnp.asarray(
            [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
             [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
             [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
             [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
            jnp.int32)
        return verts, faces

    def get_attributes(self, i):
        return {'name': f'shape_{i}'}


def preprocessing_transform(inputs):
    """Run once per item, cached on disk: oversample the surface."""
    verts, faces = inputs.data if hasattr(inputs, 'data') else inputs
    key = jax.random.PRNGKey(0)
    pts, _ = kal.ops.mesh.sample_points(verts[None], faces,
                                        args.num_oversample, key=key)
    return {'points': np.asarray(pts[0])}


def runtime_transform(item, key):
    """Cheap per-__getitem__ work: subsample the cached oversampling."""
    pts = item['points']
    idx = jax.random.choice(key, pts.shape[0], (args.num_samples,),
                            replace=False)
    return jnp.asarray(pts)[idx]


if args.shapenet_dir is not None:
    base = kal.io.shapenet.ShapeNetV2(root=args.shapenet_dir,
                                      categories=['car'], train=True,
                                      with_materials=False)
else:
    print('no --shapenet-dir given: using a synthetic 2-mesh dataset')
    base = _SyntheticMeshes()

ds = CachedDataset(base, args.cache_dir,
                   transform=preprocessing_transform)

key = jax.random.PRNGKey(42)
for i in range(len(ds)):
    key, sub = jax.random.split(key)
    cloud = runtime_transform(ds[i], sub)
    print(f'item {i}: runtime point cloud {cloud.shape}, '
          f'bbox extent {float(cloud.max() - cloud.min()):.2f}')
print(f'cache written under {args.cache_dir}')
