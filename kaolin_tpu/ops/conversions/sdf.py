"""SDF callables to voxelgrids via multiresolution refinement.

Reference: ``kaolin/ops/conversions/sdf.py:46`` (backed by the Cython MISE
of ``kaolin/cython/ops/conversions/mise.pyx``). The sequential
pointer-chasing octree is reformulated as the level-synchronous refinement
of SURVEY §2.2: evaluate the SDF on a coarse grid, then repeatedly double
the resolution, evaluating new points only inside "active" cells (cells
whose corners disagree) and filling inactive cells by propagation — the
same incremental-evaluation guarantee as MISE, vectorized per level.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ['sdf_to_voxelgrids']


def sdf_to_voxelgrids(sdf, bbox_center=0., bbox_dim=1., init_res=32,
                      upsampling_steps=0):
    """Converts SDF callables to binary occupancy voxelgrids of resolution
    ``init_res * 2**upsampling_steps + 1``.

    Args:
        sdf: list of callables mapping (N, 3) coords to (N,) SDF values.
        bbox_center, bbox_dim: surface bounding box.
        init_res: initial grid resolution.
        upsampling_steps: number of resolution doublings.

    Returns:
        (batch_size, R+1, R+1, R+1) float (1.0 where sdf <= 0).
    """
    if not isinstance(bbox_center, (int, float)):
        raise TypeError(f"Expected bbox_center to be int or float "
                        f"but got {type(bbox_center)}.")
    if not isinstance(bbox_dim, (int, float)):
        raise TypeError(f"Expected bbox_dim to be int or float "
                        f"but got {type(bbox_dim)}.")
    if not isinstance(init_res, int):
        raise TypeError(f"Expected init_res to be int "
                        f"but got {type(init_res)}.")
    if not isinstance(upsampling_steps, int):
        raise TypeError(f"Expected upsampling_steps to be int "
                        f"but got {type(upsampling_steps)}.")
    if not isinstance(sdf, list):
        raise TypeError(f"Expected sdf to be list but got {type(sdf)}.")

    final_res = init_res * 2 ** upsampling_steps
    out = []
    for i_batch, f in enumerate(sdf):
        if not callable(f):
            raise TypeError(f"Expected sdf[{i_batch}] to be callable "
                            f"but got {type(f)}.")

        def evaluate(idx, res):
            # grid index -> world coords (mise normalization:
            # sdf.py:146-149 of the reference)
            pts = idx.astype(np.float64) / res
            pts = bbox_dim * (pts - 0.5 + bbox_center)
            vals = np.asarray(f(jnp.asarray(pts)))
            return (vals <= 0).astype(np.float64)

        res = init_res
        ii, jj, kk = np.meshgrid(*([np.arange(res + 1)] * 3),
                                 indexing='ij')
        idx = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
        occ = evaluate(idx, res).reshape(res + 1, res + 1, res + 1)

        for _ in range(upsampling_steps):
            # active cells: corners disagree
            c = occ
            corner_sum = (c[:-1, :-1, :-1] + c[:-1, :-1, 1:]
                          + c[:-1, 1:, :-1] + c[:-1, 1:, 1:]
                          + c[1:, :-1, :-1] + c[1:, :-1, 1:]
                          + c[1:, 1:, :-1] + c[1:, 1:, 1:])
            active = (corner_sum > 0) & (corner_sum < 8)
            new_res = res * 2
            new_occ = np.zeros((new_res + 1,) * 3)
            # old grid points map to even indices
            new_occ[::2, ::2, ::2] = occ
            # propagate fill: every new point takes the value of its
            # containing coarse cell's corner (consistent where inactive)
            fill = np.repeat(np.repeat(np.repeat(
                occ[:-1, :-1, :-1], 2, 0), 2, 1), 2, 2)
            pad = np.zeros((new_res + 1,) * 3)
            pad[:new_res, :new_res, :new_res] = fill
            pad[::2, ::2, ::2] = occ
            new_occ = pad
            # evaluate new points adjacent to active cells
            act_mask = np.zeros((new_res + 1,) * 3, dtype=bool)
            up_active = np.repeat(np.repeat(np.repeat(active, 2, 0), 2, 1),
                                  2, 2)
            # mark the 27 lattice points of each active fine-cell pair
            grow = np.zeros((new_res + 1,) * 3, dtype=bool)
            grow[:new_res, :new_res, :new_res] |= up_active
            for dx in range(2):
                for dy in range(2):
                    for dz in range(2):
                        grow[dx:new_res + dx, dy:new_res + dy,
                             dz:new_res + dz] |= up_active
            act_mask = grow
            # skip points already known from the coarse grid
            known = np.zeros_like(act_mask)
            known[::2, ::2, ::2] = True
            to_eval = act_mask & ~known
            idx = np.argwhere(to_eval)
            if idx.shape[0]:
                new_occ[to_eval] = evaluate(idx, new_res)
            occ = new_occ
            res = new_res
        out.append(occ)
    return jnp.asarray(np.stack(out), dtype=jnp.float32)
