"""DIB-R renderer wrapper: textured mesh + camera-parameterized rendering.

Reference: ``examples/tutorial/ian_renderer.py:26-225`` (fork layer).
"""

import jax
import jax.numpy as jnp

import kaolin_tpu as kal
from . import utils


class TexturedMesh:
    """A mesh with UVs and a texture map (``ian_renderer.py:26``)."""

    def __init__(self, vertices, faces, uvs, face_uvs_idx, texture_res=256):
        self.vertices = vertices          # (1, V, 3)
        self.faces = faces                # (F, 3)
        self.uvs = uvs                    # (1, U, 2)
        self.face_uvs_idx = face_uvs_idx  # (F, 3)
        self.face_uvs = kal.ops.mesh.index_vertices_by_faces(
            uvs, face_uvs_idx)
        self.texture_map = jnp.ones((1, 3, texture_res, texture_res),
                                    jnp.float32)

    @classmethod
    def from_obj(cls, path, texture_res=256):
        mesh = kal.io.obj.import_mesh(path, with_materials=True)
        vertices = mesh.vertices[None]
        # normalize into [-0.5, 0.5] as the reference tutorials do
        vmin = vertices.min(axis=1, keepdims=True)
        vmax = vertices.max(axis=1, keepdims=True)
        vertices = (vertices - (vmin + vmax) / 2) \
            / (vmax - vmin).max()
        return cls(vertices, mesh.faces, mesh.uvs[None], mesh.face_uvs_idx,
                   texture_res)


class Renderer:
    """Batched DIB-R rendering with spherical camera parameters.

    Reference: ``ian_renderer.py:137-225``.
    """

    def __init__(self, batch_size, render_res=(512, 512),
                 interpolation_mode='bilinear'):
        assert interpolation_mode in ('nearest', 'bilinear'), \
            f'no interpolation mode {interpolation_mode}'
        self.batch_size = batch_size
        self.render_res = render_res
        self.interpolation_mode = interpolation_mode

    def render_image_and_mask_with_camera_params(
            self, elev, azim, r, look_at_height, fovyangle, mesh,
            sigmainv=7000, texture_map=None, offset=None):
        cam_transform = utils.get_camera_transform_from_view(
            elev, azim, r, look_at_height)
        cam_proj = utils.get_camera_projection(fovyangle)
        if texture_map is None:
            texture_map = mesh.texture_map
        return self.render_image_and_mask(
            cam_proj, cam_transform, self.render_res[0],
            self.render_res[1], mesh, sigmainv, texture_map, offset)

    def render_image_and_mask(self, cam_proj, cam_transform, height, width,
                              mesh, sigmainv=7000, texture_map=None,
                              offset=None):
        """Returns (image (B, H, W, 3), mask, soft_mask)."""
        camera_transform = cam_transform if offset is None \
            else cam_transform + offset
        B = self.batch_size
        fvc, fvi, fn = kal.render.mesh.prepare_vertices(
            jnp.tile(mesh.vertices, (B, 1, 1)), mesh.faces, cam_proj,
            camera_transform=camera_transform)
        face_attributes = [
            jnp.tile(mesh.face_uvs, (B, 1, 1, 1)),
            jnp.ones((B, mesh.faces.shape[0], 3, 1)),
        ]
        image_features, soft_mask, face_idx = \
            kal.render.mesh.dibr_rasterization(
                height, width, fvc[:, :, :, -1], fvi, face_attributes,
                fn[:, :, -1], sigmainv=sigmainv)
        texture_coords, mask = image_features
        if texture_map is None:
            texture_map = mesh.texture_map
        image = kal.render.mesh.texture_mapping(
            texture_coords, jnp.tile(texture_map, (B, 1, 1, 1)),
            mode=self.interpolation_mode)
        image = jnp.clip(image * mask, 0., 1.)
        return image, mask, soft_mask
