"""Pallas TPU kernel for the z-buffer face-selection pass of ``rasterize``.

TPU-native re-design of the reference CUDA rasterizer
(``kaolin/csrc/render/mesh/rasterization_cuda.cu:44-192``): the image is
tiled into VPU-aligned (TILE_H, TILE_W) pixel blocks (one grid program per
block per batch item); all per-face data (z, image-space verts, bboxes) for
the batch item is staged in VMEM, and the kernel streams faces in chunks of
8 (one sublane per face), vectorizing the edge-function / z-max update over
the whole pixel tile. A chunk whose bboxes don't intersect the tile is
skipped entirely (the VPU analogue of the CUDA per-pixel bbox rejection).

The kernel only selects the winning face (max interpolated z, first face on
ties — matching the sequential CUDA scan order) and its depth; barycentric
weights and feature interpolation run as fused XLA epilogue ops outside
(see ``kaolin_tpu/render/mesh/rasterization.py``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['rasterize_select_pallas']

FACE_CHUNK = 8


def _rasterize_kernel(z_ref, img_ref, bbox_ref, zbuf_ref, idx_ref, *,
                      height, width, num_faces, multiplier, eps,
                      tile_h, tile_w):
    i = pl.program_id(1)
    j = pl.program_id(2)

    row = (i * tile_h
           + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0))
    col = (j * tile_w
           + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1))
    dtype = z_ref.dtype
    # pixel centers, y-up image space, pre-scaled by multiplier
    # (rasterization_cuda.cu:85-86)
    x0 = (multiplier / width) * (2 * col + 1 - width).astype(dtype)
    y0 = (multiplier / height) * (height - 2 * row - 1).astype(dtype)

    # tile bounds: x ascending in col, y descending in row
    tile_xmin = x0[0, 0]
    tile_xmax = x0[0, tile_w - 1]
    tile_ymin = y0[tile_h - 1, 0]
    tile_ymax = y0[0, 0]

    zbuf_ref[...] = jnp.full((1, tile_h, tile_w), -jnp.inf, dtype=dtype)
    idx_ref[...] = jnp.full((1, tile_h, tile_w), -1, dtype=jnp.int32)

    num_chunks = pl.cdiv(num_faces, FACE_CHUNK)

    def chunk_body(c, _):
        f0 = c * FACE_CHUNK
        bbox = bbox_ref[0, pl.ds(f0, FACE_CHUNK), :]          # (8, 4)
        xmin = bbox[:, 0]
        ymin = bbox[:, 1]
        xmax = bbox[:, 2]
        ymax = bbox[:, 3]
        overlap = ((tile_xmax >= xmin) & (tile_xmin < xmax)
                   & (tile_ymax >= ymin) & (tile_ymin < ymax))

        @pl.when(jnp.any(overlap))
        def _():
            img = img_ref[0, pl.ds(f0, FACE_CHUNK), :]        # (8, 6)
            fz = z_ref[0, pl.ds(f0, FACE_CHUNK), :]           # (8, 3)
            face_ids = f0 + jax.lax.broadcasted_iota(
                jnp.int32, (FACE_CHUNK, 1, 1), 0)
            lane_valid = face_ids < num_faces

            px = x0[None, :, :]
            py = y0[None, :, :]
            hit = ((px >= xmin[:, None, None]) & (px < xmax[:, None, None])
                   & (py >= ymin[:, None, None]) & (py < ymax[:, None, None]))

            ax = img[:, 0][:, None, None] - px
            ay = img[:, 1][:, None, None] - py
            bx = img[:, 2][:, None, None] - px
            by = img[:, 3][:, None, None] - py
            cx = img[:, 4][:, None, None] - px
            cy = img[:, 5][:, None, None] - py
            w0 = bx * cy - by * cx
            w1 = cx * ay - cy * ax
            w2 = ax * by - ay * bx
            norm = w0 + w1 + w2
            norm = norm + jnp.copysign(eps, norm)
            w0 = w0 / norm
            w1 = w1 / norm
            w2 = w2 / norm
            inside = (w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)

            z0 = (w0 * fz[:, 0][:, None, None]
                  + w1 * fz[:, 1][:, None, None]
                  + w2 * fz[:, 2][:, None, None])
            z0 = jnp.where(hit & inside & lane_valid, z0, -jnp.inf)

            # first-max reduction over the chunk axis (ties -> lowest index,
            # matching the CUDA sequential scan)
            zmax = jnp.max(z0, axis=0)                        # (th, tw)
            is_max = (z0 == zmax[None, :, :]) & (zmax[None, :, :] > -jnp.inf)
            big = jnp.int32(0x7fffffff)
            cand = jnp.where(is_max, jnp.broadcast_to(face_ids, z0.shape), big)
            widx = jnp.min(cand, axis=0)

            cur_z = zbuf_ref[0, :, :]
            cur_i = idx_ref[0, :, :]
            take = zmax > cur_z
            zbuf_ref[0, :, :] = jnp.where(take, zmax, cur_z)
            idx_ref[0, :, :] = jnp.where(take, widx, cur_i)

        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=('height', 'width', 'multiplier',
                                             'eps', 'tile_h', 'tile_w'))
def rasterize_select_pallas(face_vertices_z, face_vertices_image_flat,
                            face_bboxes, *, height, width, multiplier, eps,
                            tile_h=8, tile_w=256):
    """Selects the visible face (and its depth) for every pixel.

    Args:
        face_vertices_z: (B, F, 3) camera-space z per face vertex.
        face_vertices_image_flat: (B, F, 6) image-space verts (scaled by
            ``multiplier``), layout (ax, ay, bx, by, cx, cy).
        face_bboxes: (B, F, 4) (xmin, ymin, xmax, ymax), scaled; culled
            faces must carry an empty bbox (xmin=+inf).
        height, width: output image size; must be divisible by the tile.

    Returns:
        (zbuf (B, H, W), face_idx (B, H, W) int32, -1 where uncovered).
    """
    B, F, _ = face_vertices_z.shape
    assert height % tile_h == 0 and width % tile_w == 0, \
        (height, width, tile_h, tile_w)
    grid = (B, height // tile_h, width // tile_w)
    kernel = functools.partial(
        _rasterize_kernel, height=height, width=width, num_faces=F,
        multiplier=float(multiplier), eps=float(eps),
        tile_h=tile_h, tile_w=tile_w)
    zbuf, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, F, 3), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, 6), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, 4), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile_w), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, tile_w), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, height, width), face_vertices_z.dtype),
            jax.ShapeDtypeStruct((B, height, width), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * height * width * F * 2,
            bytes_accessed=B * (F * 13 * 4 + height * width * 8),
            transcendentals=0,
        ),
    )(face_vertices_z, face_vertices_image_flat, face_bboxes)
    return zbuf, idx
