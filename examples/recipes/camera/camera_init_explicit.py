"""Building cameras from explicitly constructed extrinsics + intrinsics.

Mirrors reference ``examples/recipes/camera/camera_init_explicit.py``;
see ``camera_init_simple.py`` for the shorthand ``Camera.from_args``.
"""

import math

import jax.numpy as jnp

from kaolin_tpu.render.camera import (Camera, CameraExtrinsics,
                                      PinholeIntrinsics,
                                      OrthographicIntrinsics)

#  Camera 1: from eye/at/up and focal length (perspective)
eye = jnp.asarray([0.0, 0.0, -1.0])
at = jnp.asarray([0.0, 0.0, 0.0])
up = jnp.asarray([0.0, 1.0, 0.0])
extrinsics = CameraExtrinsics.from_lookat(eye, at, up)
intrinsics = PinholeIntrinsics.from_focal(width=800, height=600,
                                          focal_x=1.0)
camera_1 = Camera(extrinsics=extrinsics, intrinsics=intrinsics)
print('--- Camera 1 ---')
print(camera_1)

#  Camera 2: from a camera pose (position + view direction) and fov
cam_pos = jnp.asarray([1.0, 0.0, 0.0])
cam_dir = jnp.asarray([[1.0, 0.0, 0.0],
                       [0.0, 1.0, 0.0],
                       [0.0, 0.0, 1.0]])
extrinsics = CameraExtrinsics.from_camera_pose(cam_pos, cam_dir)
intrinsics = PinholeIntrinsics.from_fov(width=800, height=600,
                                        fov=math.pi / 4)
camera_2 = Camera(extrinsics=extrinsics, intrinsics=intrinsics)
print('--- Camera 2 ---')
print(camera_2)

#  Camera 3: from a 4x4 view matrix, orthographic lens
view = jnp.eye(4)[None]
extrinsics = CameraExtrinsics.from_view_matrix(view)
intrinsics = OrthographicIntrinsics.from_frustum(width=800, height=600,
                                                 fov_distance=1.0)
camera_3 = Camera(extrinsics=extrinsics, intrinsics=intrinsics)
print('--- Camera 3 ---')
print(camera_3)
