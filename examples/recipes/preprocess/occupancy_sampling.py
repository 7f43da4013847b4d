"""Sampling an occupancy function from a watertight mesh.

Mirrors reference ``examples/recipes/preprocess/occupancy_sampling.py``:
sample uniform points in the bounding box (+10% margin) and label them
inside/outside with ``check_sign`` — the standard preprocessing step for
occupancy-network training data. Uses the reference's sample sphere
mesh when present; otherwise builds an icosahedron.
"""

import os

import jax
import jax.numpy as jnp

import kaolin_tpu as kal

MESH_PATH = '/root/reference/tests/samples/model.obj'
NUM_SAMPLES = 100000

if os.path.isfile(MESH_PATH):
    mesh = kal.io.obj.import_mesh(MESH_PATH)
    vertices, faces = mesh.vertices, mesh.faces
else:
    # Fallback: a regular icosahedron (watertight)
    p = (1 + 5 ** 0.5) / 2
    vertices = jnp.asarray(
        [[-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
         [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
         [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1]], jnp.float32)
    faces = jnp.asarray(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        jnp.int32)
print(f'mesh: {vertices.shape[0]} vertices, {faces.shape[0]} faces')

# Batch format: (1, V, 3)
vertices = vertices[None]

# Uniform samples in the bounding box + 10% margin
min_bound = vertices.min(axis=1)
max_bound = vertices.max(axis=1)
margin = (max_bound - min_bound) * 0.1
min_bound, max_bound = min_bound - margin, max_bound + margin
key = jax.random.PRNGKey(0)
occupancy_coords = min_bound + (max_bound - min_bound) \
    * jax.random.uniform(key, (1, NUM_SAMPLES, 3))

occupancy = kal.ops.mesh.check_sign(vertices, faces, occupancy_coords)

occupancy_coords = occupancy_coords[0]
occupancy = occupancy[0]
inside = float(jnp.mean(occupancy.astype(jnp.float32)))
print(f'sampled {NUM_SAMPLES} points; {inside:.1%} inside the mesh')
print('example inside point:', occupancy_coords[jnp.argmax(occupancy)])
