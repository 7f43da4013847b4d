"""Legacy camera functions used by the DIB-R rendering path.

Reference: ``kaolin/render/camera/legacy.py:22-159``. Pure tensor math;
behavior-matching jnp implementations.
"""

import math
import jax.numpy as jnp

__all__ = [
    'rotate_translate_points',
    'generate_rotate_translate_matrices',
    'generate_transformation_matrix',
    'perspective_camera',
    'generate_perspective_projection',
]


def rotate_translate_points(points, camera_rot, camera_trans):
    """Applies ``P_new = R * (P_old - T)`` to batched points.

    Reference: ``kaolin/render/camera/legacy.py:22``.

    Args:
        points: (batch_size, num_points, 3).
        camera_rot: (batch_size, 3, 3).
        camera_trans: (batch_size, 3).
    """
    translated = points - camera_trans.reshape(-1, 1, 3)
    return jnp.matmul(translated, jnp.swapaxes(camera_rot, -1, -2))


def generate_rotate_translate_matrices(camera_position, look_at,
                                       camera_up_direction):
    """Camera rotation/translation from eye / at / up.

    Reference: ``kaolin/render/camera/legacy.py:40``. Returns
    (rot (B,3,3), trans (B,3)) with rows (camx, camy, -camz).
    """
    camz = look_at - camera_position
    camz = camz / (jnp.linalg.norm(camz, axis=1, keepdims=True) + 1e-10)
    if camera_up_direction.shape[0] < camz.shape[0]:
        camera_up_direction = jnp.tile(camera_up_direction,
                                       (camz.shape[0], 1))
    elif camera_up_direction.shape[0] > camz.shape[0]:
        camz = jnp.tile(camz, (camera_up_direction.shape[0], 1))
    camx = jnp.cross(camz, camera_up_direction)
    camx = camx / (jnp.linalg.norm(camx, axis=1, keepdims=True) + 1e-10)
    camy = jnp.cross(camx, camz)
    camy = camy / (jnp.linalg.norm(camy, axis=1, keepdims=True) + 1e-10)
    mtx = jnp.stack([camx, camy, -camz], axis=1)
    return mtx, camera_position


def generate_transformation_matrix(camera_position, look_at,
                                   camera_up_direction):
    """4x3 camera transformation matrix (``P_cam = [P_world, 1] @ M``).

    Reference: ``kaolin/render/camera/legacy.py:85``.
    """
    z_axis = camera_position - look_at
    z_axis = z_axis / jnp.linalg.norm(z_axis, axis=1, keepdims=True)
    if camera_up_direction.shape[0] < z_axis.shape[0]:
        camera_up_direction = jnp.tile(camera_up_direction, (z_axis.shape[0], 1))
    elif z_axis.shape[0] < camera_up_direction.shape[0]:
        z_axis = jnp.tile(z_axis, (camera_up_direction.shape[0], 1))
    x_axis = jnp.cross(camera_up_direction, z_axis)
    x_axis = x_axis / jnp.linalg.norm(x_axis, axis=1, keepdims=True)
    y_axis = jnp.cross(z_axis, x_axis)
    rot_part = jnp.stack([x_axis, y_axis, z_axis], axis=2)
    trans_part = jnp.matmul(-camera_position[:, None, :], rot_part)
    return jnp.concatenate([rot_part, trans_part], axis=1)


def perspective_camera(points, camera_proj):
    """Projects camera-space points to the image plane (divide by z').

    Reference: ``kaolin/render/camera/legacy.py:120``.

    Args:
        points: (batch_size, num_points, 3) in camera coordinates.
        camera_proj: (3, 1) projection vector.
    """
    projected = points * camera_proj.reshape(-1, 1, 3)
    return projected[:, :, :2] / projected[:, :, 2:3]


def generate_perspective_projection(fovyangle, ratio=1.0, dtype=jnp.float32):
    """Perspective projection vector ``[1/(r·tan(fovy/2)), 1/tan(fovy/2), -1]``.

    Reference: ``kaolin/render/camera/legacy.py:142``. Shape (3, 1).
    """
    tanfov = math.tan(fovyangle / 2.0)
    return jnp.array([[1.0 / (ratio * tanfov)], [1.0 / tanfov], [-1.]],
                     dtype=dtype)
