"""Shared helpers for the example apps: spherical-view cameras, vertex
recentering, multiview data loading.

Reference: ``examples/tutorial/ian_utils.py`` (fork layer).
"""

import glob
import json
import os

import numpy as np
import jax.numpy as jnp

import kaolin_tpu as kal


def get_camera_transform_from_view(elev, azim, r=3.0, look_at_height=0.0):
    """4x3 camera transform from elevation/azimuth (degrees) and radius.

    Reference: ``ian_utils.py:62``.
    """
    elev = np.deg2rad(elev)
    azim = np.deg2rad(azim)
    x = r * np.sin(elev) * np.sin(azim)
    y = r * np.cos(elev)
    z = r * np.sin(elev) * np.cos(azim)
    pos = jnp.asarray([[x, y, z]], jnp.float32)
    look_at = jnp.asarray([[0., look_at_height, 0.]], jnp.float32)
    up = jnp.asarray([[0., 1., 0.]], jnp.float32)
    return kal.render.camera.generate_transformation_matrix(pos, look_at,
                                                            up)


def get_camera_projection(fovyangle_deg):
    """(3, 1) projection vector from a vertical fov in degrees
    (``ian_utils.py:92``)."""
    return kal.render.camera.generate_perspective_projection(
        float(np.deg2rad(fovyangle_deg)))


def recenter_vertices(vertices, vertice_shift):
    """Recenters vertices around their mean plus a learnable shift
    (``ian_utils.py:52``)."""
    vertices_min = vertices.min(axis=1, keepdims=True)
    vertices_max = vertices.max(axis=1, keepdims=True)
    vertices_mid = (vertices_min + vertices_max) / 2
    return vertices - vertices_mid + vertice_shift


def load_synthetic_views(root_dir, indices=None):
    """Loads rendered views (rgb + semantic mask + camera) produced in the
    Omniverse Data Generator layout (``ian_utils.py:182-229``).

    Returns:
        list of dicts with 'rgb' (H, W, 3), 'semantic' mask (H, W),
        'metadata' (cam_transform, cam_proj).
    """
    if indices is None:
        metas = sorted(glob.glob(os.path.join(root_dir, '*_metadata.json')))
        indices = [int(os.path.basename(m).split('_')[0]) for m in metas]
    views = []
    for idx in indices:
        data = kal.io.render.import_synthetic_view(
            root_dir, idx, rgb=True, semantic=True)
        views.append(data)
    return views
