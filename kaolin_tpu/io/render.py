"""Loader for synthetic views (Omniverse Kaolin App "Data Generator"
format: per-view rgb/depth/semantic files + camera metadata json).

Reference: ``kaolin/io/render.py:26-126``.
"""

import json
import math
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from ..render.camera import generate_perspective_projection

__all__ = ['import_synthetic_view']


def import_synthetic_view(root_dir, idx, rgb=True, depth_linear=False,
                          semantic=False, instance=False, normals=False,
                          bbox_2d_tight=False, bbox_2d_loose=False):
    """Imports one synthetic view; see the reference docstring for the
    full output dictionary description.

    Returns:
        dict with the selected sensors plus 'metadata' holding
        cam_transform (4, 3), cam_proj (3, 1), asset_transforms and
        clipping_range.
    """
    output = {}

    def _import_npy(cat):
        path = os.path.join(root_dir, f'{idx}_{cat}.npy')
        output[cat] = jnp.asarray(np.load(path)) \
            if os.path.exists(path) else None

    def _import_png(cat):
        path = os.path.join(root_dir, f'{idx}_{cat}.png')
        if os.path.exists(path):
            output[cat] = jnp.asarray(
                np.array(Image.open(path))[:, :, :3].astype(np.float32)
                / 255.)
        else:
            output[cat] = None

    if rgb:
        _import_png('rgb')
    if depth_linear:
        _import_npy('depth_linear')
    if semantic:
        _import_npy('semantic')
    if instance:
        _import_npy('instance')
    if normals:
        _import_png('normals')

    with open(os.path.join(root_dir, f'{idx}_metadata.json'), 'r') as f:
        fmetadata = json.load(f)
    asset_transforms = jnp.asarray(
        fmetadata['asset_transforms'][0][1], jnp.float32)
    cam_transform = jnp.asarray(
        fmetadata['camera_properties']['tf_mat'], jnp.float32)
    aspect_ratio = (fmetadata['camera_properties']['resolution']['width']
                    / fmetadata['camera_properties']['resolution']['height'])
    focal_length = fmetadata['camera_properties']['focal_length']
    horizontal_aperture = \
        fmetadata['camera_properties']['horizontal_aperture']
    fov = 2 * math.atan(horizontal_aperture / (2 * focal_length))
    output['metadata'] = {
        'cam_transform': cam_transform[:, :3],
        'asset_transforms': asset_transforms,
        'cam_proj': generate_perspective_projection(fov, aspect_ratio),
        'clipping_range': fmetadata['camera_properties']['clipping_range'],
    }
    if bbox_2d_tight:
        output['bbox_2d_tight'] = fmetadata['bbox_2d_tight']
    if bbox_2d_loose:
        output['bbox_2d_loose'] = fmetadata['bbox_2d_loose']
    return output
