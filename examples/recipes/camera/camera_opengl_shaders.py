"""Feeding the camera's view-projection matrix to an OpenGL-style shader.

Mirrors reference ``examples/recipes/camera/camera_opengl_shaders.py``.
Like the reference, this recipe is a minimal integration sketch: if
glumpy is not installed (it is not, in this environment) a dummy
program object stands in, and the recipe just shows the matrix handoff.
"""

import math

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.render.camera import Camera

try:
    from glumpy import gloo
except ImportError:
    class _DummyGloo:
        def Program(self, vertex, fragment):
            return dict()
    gloo = _DummyGloo()

camera = Camera.from_args(
    eye=jnp.asarray([4.0, 4.0, 4.0]),
    at=jnp.asarray([0.0, 0.0, 0.0]),
    up=jnp.asarray([0.0, 1.0, 0.0]),
    fov=30 * math.pi / 180,
    width=800, height=800,
)

vertex = """
uniform mat4 u_viewprojection;
attribute vec3 position;
void main() { gl_Position = u_viewprojection * vec4(position, 1.0); }
"""
fragment = """
void main() { gl_FragColor = vec4(1.0, 1.0, 1.0, 1.0); }
"""

program = gloo.Program(vertex, fragment)

# GL expects column-major float32; JAX arrays convert via numpy
vp = np.asarray(camera.view_projection_matrix()[0], np.float32).T
program['u_viewprojection'] = vp
print('uploaded view-projection matrix:')
print(vp)
