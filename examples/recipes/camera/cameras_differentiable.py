"""Optimizing camera parameters with gradients.

Mirrors reference ``examples/recipes/camera/cameras_differentiable.py``.
Cameras are JAX pytrees: differentiate through the raw parameter
buffers and use ``gradient_mask`` to freeze parameter groups (here only
the translation ``t`` of the extrinsics is optimized).
"""

import math

import jax
import jax.numpy as jnp

from kaolin_tpu.render.camera import Camera, CameraExtrinsics

cam = Camera.from_args(
    eye=jnp.asarray([4.0, 4.0, 4.0]),
    at=jnp.asarray([0.0, 0.0, 0.0]),
    up=jnp.asarray([0.0, 1.0, 0.0]),
    fov=30 * math.pi / 180,
    width=800, height=800,
)

# Target: a shifted camera observing the same landmarks
target_ext = cam.extrinsics.translate(jnp.asarray([0.5, -0.3, 0.2]))
landmarks = jnp.asarray([[0., 0., 0.], [1., 0., 0.],
                         [0., 1., 0.], [0., 0., 1.]])
goal = target_ext.transform(landmarks)

# Only translation is trainable; rotation entries stay frozen
mask = cam.extrinsics.gradient_mask('t')
backend = cam.extrinsics.backend


def loss(params):
    ext = CameraExtrinsics(params, backend=backend)
    return jnp.mean((ext.transform(landmarks) - goal) ** 2)


params = cam.extrinsics.params
for step in range(200):
    g = jax.grad(loss)(params) * mask
    params = params - 0.5 * g
    if step % 50 == 0:
        print(f'step {step:3d}  loss {float(loss(params)):.6f}')

final = CameraExtrinsics(params, backend=backend)
print('optimized camera position:', final.cam_pos().ravel())
print('target    camera position:', target_ext.cam_pos().ravel())
