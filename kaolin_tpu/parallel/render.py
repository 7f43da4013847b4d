"""Multi-chip sharded rendering: pixel rows x data batch over a device mesh.

New TPU-native component (SURVEY §2.3 / §5 "long-context analogue"): the
renderer's scaling axis is the image plane. Faces/parameters are replicated
across the 'pix' axis and the pixel rows of each image are rendered locally
per device (zero cross-device traffic in forward); parameter gradients are
partial sums that ``shard_map``'s transpose turns into ``psum`` over ICI,
overlapped with the backward pass by XLA.
"""

import functools

import jax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..render.mesh.dibr import dibr_rasterization
from ..render.mesh.rasterization import rasterize

__all__ = ['sharded_rasterize', 'sharded_dibr_rasterization']


def sharded_rasterize(mesh, height, width, face_vertices_z,
                      face_vertices_image, face_features, valid_faces=None,
                      multiplier=None, eps=None, backend='auto'):
    """:func:`kaolin_tpu.render.mesh.rasterize` over a ('data', 'pix') mesh.

    The batch is sharded over 'data'; each device on 'pix' rasterizes its
    horizontal slab of rows. Differentiable: gradients to face tensors are
    psum-reduced over 'pix' automatically by shard_map's transpose.

    Returns the same (features, face_idx) as ``rasterize``, with outputs
    sharded (batch over 'data', rows over 'pix').
    """
    npix = mesh.shape['pix']
    assert height % (npix * 8) == 0, (height, npix)
    local_h = height // npix

    in_specs = (P('data'), P('data'), P('data'),
                P('data') if valid_faces is not None else None)
    out_specs = (P('data', 'pix'), P('data', 'pix'))

    @functools.partial(shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    def inner(fvz, fvi, ff, valid):
        row_start = jax.lax.axis_index('pix') * local_h
        feat, idx = rasterize(local_h, width, fvz, fvi, ff, valid,
                              multiplier, eps, backend,
                              row_start=row_start, total_height=height)
        return feat, idx

    return inner(face_vertices_z, face_vertices_image, face_features,
                 valid_faces)


def sharded_dibr_rasterization(mesh, height, width, face_vertices_z,
                               face_vertices_image, face_features,
                               face_normals_z, sigmainv=7000, boxlen=0.02,
                               knum=30, multiplier=None, eps=None,
                               rast_backend='auto', mask_backend='auto'):
    """:func:`kaolin_tpu.render.mesh.dibr_rasterization` over a
    ('data', 'pix') mesh; see :func:`sharded_rasterize`.

    Returns (interpolated_features, soft_mask, face_idx), sharded.
    """
    npix = mesh.shape['pix']
    assert height % (npix * 8) == 0, (height, npix)
    local_h = height // npix

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P('data'), P('data'), P('data'), P('data')),
        out_specs=(P('data', 'pix'), P('data', 'pix'), P('data', 'pix')))
    def inner(fvz, fvi, ff, fnz):
        row_start = jax.lax.axis_index('pix') * local_h
        feat, mask, idx = dibr_rasterization(
            local_h, width, fvz, fvi, ff, fnz, sigmainv, boxlen, knum,
            multiplier, eps, rast_backend, row_start=row_start,
            total_height=height, mask_backend=mask_backend)
        return feat, mask, idx

    return inner(face_vertices_z, face_vertices_image, face_features,
                 face_normals_z)
