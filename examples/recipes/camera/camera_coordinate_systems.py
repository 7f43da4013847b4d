"""Changing the world coordinate system of a camera.

Mirrors reference ``examples/recipes/camera/camera_coordinate_systems.py``.
``change_coordinate_system`` rebases the world axes (e.g. to Blender's
z-up convention); methods return new cameras (immutable pytrees).
"""

import math

import jax.numpy as jnp

from kaolin_tpu.render.camera import Camera, blender_coords

camera = Camera.from_args(
    eye=jnp.asarray([4.0, 4.0, 4.0]),
    at=jnp.asarray([0.0, 0.0, 0.0]),
    up=jnp.asarray([0.0, 1.0, 0.0]),
    fov=30 * math.pi / 180,
    width=800, height=800,
)

print('view matrix (default y-up world):')
print(camera.view_matrix()[0])

blender_cam = Camera(camera.extrinsics.change_coordinate_system(
    blender_coords()), camera.intrinsics)
print('view matrix (blender z-up world):')
print(blender_cam.view_matrix()[0])

restored = Camera(blender_cam.extrinsics.reset_coordinate_system(),
                  blender_cam.intrinsics)
print('restored matches original:',
      bool(jnp.allclose(restored.view_matrix(), camera.view_matrix(),
                        atol=1e-5)))
