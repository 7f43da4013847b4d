"""Texture sampling and vertex preparation for mesh rendering.

Reference: ``kaolin/render/mesh/utils.py:23-175``.
"""

import jax
import jax.numpy as jnp

from .. import camera
from ... import ops

__all__ = [
    'texture_mapping',
    'spherical_harmonic_lighting',
    'prepare_vertices',
    'grid_sample_2d',
]


def grid_sample_2d(input_maps, grid, mode='bilinear', backend='auto'):
    """2D grid sampling, matching ``torch.nn.functional.grid_sample`` with
    ``align_corners=False`` and ``padding_mode='border'``.

    Args:
        input_maps: (batch_size, channels, h_in, w_in).
        grid: (batch_size, h_out, w_out, 2) coords in [-1, 1] (x, y).
        mode: 'bilinear' or 'nearest'.
        backend: 'pallas' (gather-free TPU kernel, h_in/w_in <= 128),
            'xla' (portable gathers), or 'auto'.

    Returns:
        (batch_size, channels, h_out, w_out).
    """
    b, _, h_in, w_in = input_maps.shape
    x = grid[..., 0]
    y = grid[..., 1]
    # unnormalize: align_corners=False mapping
    ix = ((x + 1.) * w_in - 1.) / 2.
    iy = ((y + 1.) * h_in - 1.) / 2.
    # border padding: clip the coordinate itself
    ix = jnp.clip(ix, 0., w_in - 1.)
    iy = jnp.clip(iy, 0., h_in - 1.)

    if backend == 'auto':
        backend = 'pallas' if (jax.default_backend() == 'tpu'
                               and h_in <= 128 and w_in <= 128) else 'xla'
    if backend in ('pallas', 'pallas_interpret') and h_in <= 128 \
            and w_in <= 128:
        from ...kernels.texture import grid_sample_coords
        out = grid_sample_coords(
            input_maps, ix.reshape(b, -1), iy.reshape(b, -1), mode,
            backend == 'pallas_interpret')
        out = jnp.moveaxis(out, -1, 1)             # (B, C, P)
        return out.reshape(input_maps.shape[:2] + ix.shape[1:])

    if mode == 'nearest':
        ix_n = jnp.round(ix).astype(jnp.int32)
        iy_n = jnp.round(iy).astype(jnp.int32)
        out = _gather_pixels(input_maps, iy_n, ix_n)
        return out
    elif mode == 'bilinear':
        ix0 = jnp.floor(ix)
        iy0 = jnp.floor(iy)
        wx = ix - ix0
        wy = iy - iy0
        ix0 = ix0.astype(jnp.int32)
        iy0 = iy0.astype(jnp.int32)
        ix1 = jnp.clip(ix0 + 1, 0, w_in - 1)
        iy1 = jnp.clip(iy0 + 1, 0, h_in - 1)
        v00 = _gather_pixels(input_maps, iy0, ix0)
        v01 = _gather_pixels(input_maps, iy0, ix1)
        v10 = _gather_pixels(input_maps, iy1, ix0)
        v11 = _gather_pixels(input_maps, iy1, ix1)
        wx = wx[:, None]
        wy = wy[:, None]
        return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
                + v10 * wy * (1 - wx) + v11 * wy * wx)
    else:
        raise ValueError(f"unsupported mode {mode}")


def _gather_pixels(input_maps, iy, ix):
    """Gathers (B, C, *out_shape) pixels from (B, C, H, W) maps."""
    b, c, h, w = input_maps.shape
    flat = input_maps.reshape(b, c, h * w)
    idx = (iy * w + ix).reshape(b, 1, -1)
    out = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (b, c, idx.shape[-1])),
                              axis=2)
    return out.reshape(b, c, *iy.shape[1:])


def texture_mapping(texture_coordinates, texture_maps, mode='nearest'):
    """Samples texture maps at dense or sparse UV coordinates.

    Reference: ``kaolin/render/mesh/utils.py:23``. UVs are OpenGL-style
    in [0, 1] with y bottom-to-top; converted to sampler coords internally.

    Args:
        texture_coordinates: (batch_size, h, w, 2) or (batch_size, num_points, 2).
        texture_maps: (batch_size, channels, h', w').
        mode: 'nearest' or 'bilinear'.

    Returns:
        (batch_size, h, w, channels) or (batch_size, num_points, channels).
    """
    batch_size = texture_coordinates.shape[0]
    num_channels = texture_maps.shape[1]
    uv = texture_coordinates.reshape(batch_size, -1, 1, 2)
    uv = jnp.clip(uv, 0., 1.)
    uv = uv * 2. - 1.
    uv = uv.at[..., 1].multiply(-1.)
    sampled = grid_sample_2d(texture_maps, uv, mode=mode)
    sampled = jnp.transpose(sampled, (0, 2, 3, 1))
    return sampled.reshape(batch_size, *texture_coordinates.shape[1:-1],
                           num_channels)


def spherical_harmonic_lighting(imnormal, lights):
    """9-band spherical harmonic lighting from per-pixel normals.

    Reference: ``kaolin/render/mesh/utils.py:78``.

    Args:
        imnormal: (batch_size, height, width, 3).
        lights: (batch_size, 9) SH coefficients.

    Returns:
        (batch_size, height, width).
    """
    x = imnormal[..., 0]
    y = imnormal[..., 1]
    z = imnormal[..., 2]
    bands = jnp.stack([
        0.28209479177 * jnp.ones_like(x),
        0.4886025119 * x,
        0.4886025119 * z,
        0.4886025119 * y,
        1.09254843059 * (x * y),
        1.09254843059 * (y * z),
        0.94617469575 * (z * z) - 0.31539156525,
        0.77254840404 * (x * z),
        0.38627420202 * (x * x - y * y),
    ], axis=3)
    return jnp.sum(bands * lights.reshape(-1, 1, 1, 9), axis=3)


def prepare_vertices(vertices, faces, camera_proj, camera_rot=None,
                     camera_trans=None, camera_transform=None):
    """Moves vertices to camera space, projects them, indexes by faces.

    Reference: ``kaolin/render/mesh/utils.py:128``.

    Returns:
        (face_vertices_camera (B,F,3,3), face_vertices_image (B,F,3,2),
         face_normals (B,F,3) unit).
    """
    if camera_transform is None:
        assert camera_trans is not None and camera_rot is not None, \
            "camera_transform or camera_trans and camera_rot must be defined"
        vertices_camera = camera.rotate_translate_points(
            vertices, camera_rot, camera_trans)
    else:
        assert camera_trans is None and camera_rot is None, \
            "camera_trans and camera_rot must be None when camera_transform is defined"
        padded = jnp.pad(vertices, ((0, 0), (0, 0), (0, 1)), constant_values=1.)
        vertices_camera = jnp.matmul(padded, camera_transform)
    vertices_image = camera.perspective_camera(vertices_camera, camera_proj)
    face_vertices_camera = ops.mesh.index_vertices_by_faces(vertices_camera, faces)
    face_vertices_image = ops.mesh.index_vertices_by_faces(vertices_image, faces)
    normals = ops.mesh.face_normals(face_vertices_camera, unit=True)
    return face_vertices_camera, face_vertices_image, normals
