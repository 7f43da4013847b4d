"""Inspecting camera properties.

Mirrors reference ``examples/recipes/camera/camera_properties.py``.
"""

import math

import jax.numpy as jnp

from kaolin_tpu.render.camera import Camera, CameraFOV

camera = Camera.from_args(
    eye=jnp.asarray([4.0, 4.0, 4.0]),
    at=jnp.asarray([0.0, 0.0, 0.0]),
    up=jnp.asarray([0.0, 1.0, 0.0]),
    fov=30 * math.pi / 180,
    width=800, height=800,
)

print('width / height:', camera.width, camera.height)
print('lens type:', camera.intrinsics.lens_type)
print('near / far:', camera.intrinsics.near, camera.intrinsics.far)
print('batch size:', len(camera))
print('dtype:', camera.dtype)

# Pinhole-specific parameters
print('focal_x:', camera.focal_x)
print('x0, y0 (principal point offset):', camera.x0, camera.y0)
print('fov (vertical, degrees):',
      camera.intrinsics.fov(CameraFOV.VERTICAL))
print('fov (horizontal, degrees):',
      camera.intrinsics.fov(CameraFOV.HORIZONTAL))
print('tan(fov/2):', camera.intrinsics.tan_half_fov())

# Extrinsics-derived vectors
print('camera position:', camera.cam_pos().ravel())
print('camera forward axis:', camera.cam_forward().ravel())
print('camera up axis:', camera.cam_up().ravel())
print('camera right axis:', camera.cam_right().ravel())

# Raw parameter buffers (flat, differentiable)
print('extrinsics params shape:', camera.extrinsics.parameters().shape)
print('intrinsics params shape:', camera.intrinsics.parameters().shape)
