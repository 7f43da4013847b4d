"""Applying camera transforms directly to vectors.

Mirrors reference ``examples/recipes/camera/camera_transforms.py``.
"""

import math

import jax.numpy as jnp

from kaolin_tpu.render.camera import Camera

camera = Camera.from_args(
    eye=jnp.asarray([4.0, 4.0, 4.0]),
    at=jnp.asarray([0.0, 0.0, 0.0]),
    up=jnp.asarray([0.0, 1.0, 0.0]),
    fov=30 * math.pi / 180,
    width=800, height=800,
)

print('view-projection matrix (world -> NDC):')
print(camera.view_projection_matrix()[0])

print('view matrix (world -> camera):')
print(camera.view_matrix()[0])

print('projection matrix (camera -> NDC):')
print(camera.intrinsics.projection_matrix()[0])

# Transform a batch of world points end to end
points = jnp.asarray([[0.0, 0.0, 0.0],
                      [1.0, 1.0, 1.0],
                      [-0.5, 0.2, 3.0]])
cam_space = camera.extrinsics.transform(points)
ndc = camera.transform(points)     # extrinsics then intrinsics
print('camera-space points:')
print(cam_space)
print('NDC points:')
print(ndc)

# normalize_depth maps camera-space depth to [0, 1]
print('normalized depths:',
      camera.intrinsics.normalize_depth(cam_space[..., 2]))
