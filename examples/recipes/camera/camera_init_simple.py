"""How to construct pinhole / ortho cameras with ``Camera.from_args``.

Mirrors reference recipe ``examples/recipes/camera/camera_init_simple.py``.
``from_args`` inspects the kwarg set and dispatches to the matching
``from_*`` constructors of the extrinsics and intrinsics classes.
"""

import math

import jax.numpy as jnp

from kaolin_tpu.render.camera import Camera

perspective_camera_1 = Camera.from_args(
    eye=jnp.asarray([4.0, 4.0, 4.0]),
    at=jnp.asarray([0.0, 0.0, 0.0]),
    up=jnp.asarray([0.0, 1.0, 0.0]),
    fov=30 * math.pi / 180,   # radians
    width=800, height=800,
    near=1e-2, far=1e2,
    dtype=jnp.float64,
)
print('--- Perspective Camera 1 ---')
print(perspective_camera_1)

# From an explicit 4x4 world-to-camera view matrix + focal length
perspective_camera_2 = Camera.from_args(
    view_matrix=jnp.eye(4)[None],
    focal_x=1000.,
    width=1600, height=1600,
)
print('--- Perspective Camera 2 ---')
print(perspective_camera_2)

# Orthographic: fov_distance selects the ortho frustum scale
ortho_camera = Camera.from_args(
    eye=jnp.asarray([4.0, 4.0, 4.0]),
    at=jnp.asarray([0.0, 0.0, 0.0]),
    up=jnp.asarray([0.0, 1.0, 0.0]),
    width=800, height=800,
    fov_distance=1.0,
)
print('--- Orthographic Camera ---')
print(ortho_camera)
