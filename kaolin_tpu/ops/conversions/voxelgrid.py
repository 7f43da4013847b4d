"""Voxelgrid-to-mesh conversions.

Reference: ``kaolin/ops/conversions/voxelgrid.py:56-246``.

``voxelgrids_to_trianglemeshes`` implements table-driven Lorensen
marching cubes with the reference's exact vertex-deduplication scheme
(``csrc/ops/conversions/unbatched_mcube/unbatched_mcube_cuda.cu``): each
voxel owns the interpolated vertices on its three corner-7-incident
edges (6, 7, 11) and faces resolve shared vertices through neighbor
offsets, so vertex/face ORDER matches the CUDA kernel output exactly.
The CUDA classify/scan/compact/generate pipeline becomes four vectorized
array passes (shifted-slice corner sampling — no gathers — plus two
cumsums); topology passes run on host numpy per the repo convention for
eager, dynamically-shaped preprocessing APIs. A marching-tetrahedra
variant (6-tet cell decomposition, finer triangulation) is kept as
``method='tets'``.
"""

import numpy as np
import jax.numpy as jnp

from .tetmesh import marching_tetrahedra
from . import mc_tables

__all__ = ['voxelgrids_to_cubic_meshes', 'voxelgrids_to_trianglemeshes']

# 6-tetrahedra decomposition of the unit cube (corner ids in (x,y,z) bit
# order: id = x*4 + y*2 + z)
_CUBE_TETS = np.array([
    [0, 4, 6, 7],
    [0, 4, 7, 5],
    [0, 5, 7, 1],
    [0, 6, 2, 7],
    [0, 2, 3, 7],
    [0, 3, 1, 7],
], dtype=np.int64)

_QUAD_TO_TRI = np.array([[0, 1, 3], [3, 2, 0]])


def voxelgrids_to_cubic_meshes(voxelgrids, is_trimesh=True):
    """Replaces each occupied voxel by a unit cuboid, dropping internal
    faces ("Cubify", Mesh R-CNN).

    Reference: ``kaolin/ops/conversions/voxelgrid.py:56``.

    Returns:
        (list of verts (V, 3), list of faces (F, 3 or 4)) per batch item.
    """
    vg = np.asarray(voxelgrids) > 0.5
    batch_size = vg.shape[0]
    out_v, out_f = [], []
    for b in range(batch_size):
        occ = vg[b]
        quads = []
        for axis in range(3):
            pad = np.pad(occ, [(1, 1) if a == axis else (0, 0)
                               for a in range(3)])
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[axis] = slice(0, -1)
            sl_hi[axis] = slice(1, None)
            # face between cell i-1 and i along axis: exposed if occupancy
            # differs
            lo = pad[tuple(sl_lo)]
            hi = pad[tuple(sl_hi)]
            exposed = lo != hi
            # orientation: face normal points away from the occupied cell
            outward = hi  # True -> occupied above, normal points -axis
            coords = np.argwhere(exposed)
            if coords.shape[0] == 0:
                continue
            a1, a2 = [a for a in range(3) if a != axis]
            for c, ow in zip(coords, outward[exposed]):
                base = c.astype(np.int64)
                corners = []
                for d1 in (0, 1):
                    for d2 in (0, 1):
                        p = base.copy()
                        p[a1] += d1
                        p[a2] += d2
                        corners.append(p)
                corners = np.stack(corners)      # (4, 3): 00,01,10,11
                if ow:
                    quads.append(corners[[0, 1, 3, 2]])
                else:
                    quads.append(corners[[0, 2, 3, 1]])
        if not quads:
            out_v.append(jnp.zeros((0, 3)))
            out_f.append(jnp.zeros((0, 3 if is_trimesh else 4),
                                   dtype=jnp.int32))
            continue
        quads = np.stack(quads)                  # (Q, 4, 3)
        flat = quads.reshape(-1, 3)
        verts, inv = np.unique(flat, axis=0, return_inverse=True)
        faces = inv.reshape(-1, 4)
        if is_trimesh:
            faces = faces[:, _QUAD_TO_TRI].reshape(-1, 3)
        out_v.append(jnp.asarray(verts.astype(np.float32)))
        out_f.append(jnp.asarray(faces))
    return out_v, out_f


# kernel-frame corner offsets (x, y, z); corner c of the marching cube
# (unbatched_mcube_cuda.cu:386-404). The kernel frame maps x -> array
# dim 2, y -> dim 1, z -> dim 0 (the CUDA kernel walks the flat buffer
# with x fastest, and emits positions reversed as (z, y, x)).
_MC_CORNERS = np.array([
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)], np.int32)
# the 12 cube edges as (corner a, corner b) index pairs
_MC_EDGES = np.array([
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7)], np.int32)
# every edge is owned by a neighboring voxel where it coincides with one
# of the owned edges 6/7/11: (dx, dy, dz) of the owner, owned-edge column
# (0 -> edge 6, 1 -> edge 7, 2 -> edge 11)
# (find_target_voxel/find_offset, unbatched_mcube_cuda.cu:215-355)
_MC_EDGE_OWNER = np.array([
    # edge: (dx, dy, dz, owned-col)
    (0, -1, -1, 0),   # 0  -> edge 6 of (y-1, z-1)
    (1, 0, -1, 1),    # 1  -> edge 7 of (x+1, z-1)
    (0, 0, -1, 0),    # 2  -> edge 6 of (z-1)
    (0, 0, -1, 1),    # 3  -> edge 7 of (z-1)
    (0, -1, 0, 0),    # 4  -> edge 6 of (y-1)
    (1, 0, 0, 1),     # 5  -> edge 7 of (x+1)
    (0, 0, 0, 0),     # 6  -> itself
    (0, 0, 0, 1),     # 7  -> itself
    (0, -1, 0, 2),    # 8  -> edge 11 of (y-1)
    (1, -1, 0, 2),    # 9  -> edge 11 of (x+1, y-1)
    (1, 0, 0, 2),     # 10 -> edge 11 of (x+1)
    (0, 0, 0, 2),     # 11 -> itself
], np.int32)


def _unbatched_marching_cubes(grid, iso_value):
    """Lorensen marching cubes over one zero-padded float grid
    (numpy, all passes vectorized). ``grid`` is indexed [d0, d1, d2];
    kernel frame x = d2, y = d1, z = d0. Returns (verts float32 (V, 3)
    in (d0, d1, d2) voxel coords of the padded grid, faces int64 (F, 3))
    in the reference kernel's exact order.
    """
    Z, Y, X = grid.shape  # kernel-frame extents: z, y, x
    # corner fields via edge-clamped shifted views (sampleVolume clamps,
    # unbatched_mcube_cuda.cu:63-71)
    gpad = np.pad(grid, ((0, 1), (0, 1), (0, 1)), mode='edge')
    field = [gpad[oz:oz + Z, oy:oy + Y, ox:ox + X]
             for (ox, oy, oz) in _MC_CORNERS]
    ci = np.zeros(grid.shape, np.int32)
    for c in range(8):
        ci |= (field[c] < iso_value).astype(np.int32) << c

    npart = mc_tables.NUM_PARTIAL_VERTS[ci]
    ntri = mc_tables.NUM_TRIANGLES[ci]
    # exclusive scans in voxel memory order (kernel x fastest == ravel)
    pv_scan = np.cumsum(npart.ravel(), dtype=np.int64) - npart.ravel()
    tri_scan = np.cumsum(ntri.ravel(), dtype=np.int64) - ntri.ravel()
    total_verts = int(pv_scan[-1] + npart.ravel()[-1])
    total_tris = int(tri_scan[-1] + ntri.ravel()[-1])
    pv_scan = pv_scan.reshape(grid.shape)
    tri_scan = tri_scan.reshape(grid.shape)

    verts = np.zeros((total_verts, 3), np.float32)
    if total_verts:
        zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                                 indexing='ij')
        order = mc_tables.VERTS_ORDER[ci]          # (Z, Y, X, 3)
        fstack = np.stack(field, axis=-1)          # (Z, Y, X, 8)
        for slot in range(3):
            edge = order[..., slot]
            sel = edge != 255
            if not sel.any():
                continue
            e = edge[sel]
            a, b = _MC_EDGES[e, 0], _MC_EDGES[e, 1]
            fsel = fstack[sel]
            fa = fsel[np.arange(e.size), a]
            fb = fsel[np.arange(e.size), b]
            t = (iso_value - fa) / (fb - fa)
            pa = _MC_CORNERS[a].astype(np.float32)  # (n, 3) x,y,z offsets
            pb = _MC_CORNERS[b].astype(np.float32)
            base = np.stack([xx[sel], yy[sel], zz[sel]], -1).astype(np.float32)
            v = base + pa + (pb - pa) * t[:, None]  # kernel frame (x, y, z)
            idx = pv_scan[sel] + slot
            verts[idx] = v[:, ::-1]                 # emit reversed (z, y, x)

    faces = np.zeros((total_tris, 3), np.int64)
    if total_tris:
        # global vertex index of each voxel's owned edges 6/7/11
        slot_of = mc_tables.OWNED_EDGE_SLOT[ci]     # (Z, Y, X, 3)
        owned_idx = pv_scan[..., None] + slot_of    # (Z, Y, X, 3)
        # per-edge owner lookup arrays, shifted (owner offsets are in the
        # kernel frame: dx -> dim2, dy -> dim1, dz -> dim0). Out-of-range
        # shifts wrap via np.roll; zero-padding guarantees they are never
        # referenced by an emitted triangle.
        edge_vert = np.empty((12,) + grid.shape, np.int64)
        for e in range(12):
            dx, dy, dz, col = _MC_EDGE_OWNER[e]
            arr = owned_idx[..., col]
            arr = np.roll(arr, (-dz, -dy, -dx), axis=(0, 1, 2))
            edge_vert[e] = arr
        tri_rows = mc_tables.TRI_TABLE[ci]          # (Z, Y, X, 16)
        for t_slot in range(5):
            e123 = tri_rows[..., 3 * t_slot:3 * t_slot + 3]
            sel = e123[..., 0] != 255
            if not sel.any():
                continue
            e1, e2, e3 = (e123[..., 0][sel], e123[..., 1][sel],
                          e123[..., 2][sel])
            flat = np.nonzero(sel.ravel())[0]
            vox_z, rem = np.divmod(flat, Y * X)
            vox_y, vox_x = np.divmod(rem, X)
            def _own(e):
                return edge_vert[e, vox_z, vox_y, vox_x]
            # faces are emitted reversed: row = (e3's, e2's, e1's vertex)
            # (unbatched_mcube_cuda.cu:484-501)
            idx = tri_scan[sel] + t_slot
            faces[idx, 0] = _own(e3)
            faces[idx, 1] = _own(e2)
            faces[idx, 2] = _own(e1)

    return verts, faces


def voxelgrids_to_trianglemeshes(voxelgrids, iso_value=0.5, method='mc'):
    """Extracts iso-surface triangle meshes from batched voxelgrids.

    Reference: ``kaolin/ops/conversions/voxelgrid.py:169``. The default
    ``method='mc'`` is Lorensen marching cubes with output vertex/face
    order matching the reference CUDA kernel exactly (validated against
    the reference's own expected-value tests); ``method='tets'`` keeps
    the marching-tetrahedra variant (finer triangulation of the same
    iso-surface). The input is zero-padded by one voxel on all sides
    like the reference, so vertex coordinates are offset by +1 voxel.

    Returns:
        (list of verts (V, 3), list of faces (F, 3)) per batch item.
    """
    vg = np.asarray(voxelgrids)
    batch_size = vg.shape[0]
    out_v, out_f = [], []
    if method == 'mc':
        for b in range(batch_size):
            grid = np.pad(vg[b].astype(np.float32), 1)
            if not grid.any():
                out_v.append(jnp.zeros((0, 3), jnp.float32))
                out_f.append(jnp.zeros((0, 3), dtype=jnp.int32))
                continue
            verts, faces = _unbatched_marching_cubes(grid, float(iso_value))
            out_v.append(jnp.asarray(verts))
            # faces are int32 by design (reference returns torch.long;
            # int32 spans any realizable vertex count and avoids the
            # silent x64-disabled downcast warning)
            out_f.append(jnp.asarray(faces.astype(np.int32)))
        return out_v, out_f
    if method != 'tets':
        raise ValueError(f"unknown method: {method!r} (use 'mc' or 'tets')")
    for b in range(batch_size):
        grid = np.pad(vg[b].astype(np.float64), 1)
        X, Y, Z = grid.shape
        # grid vertices and SDF (= iso - value, so > 0 outside)
        ii, jj, kk = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                                 indexing='ij')
        verts = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
        sdf = (iso_value - grid).reshape(-1)

        def vid(i, j, k):
            return (i * Y + j) * Z + k

        ci, cj, ck = np.meshgrid(np.arange(X - 1), np.arange(Y - 1),
                                 np.arange(Z - 1), indexing='ij')
        ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()
        corner_ids = np.stack([
            vid(ci + (c >> 2 & 1), cj + (c >> 1 & 1), ck + (c & 1))
            for c in range(8)], axis=-1)          # (C, 8)
        # only keep cells containing a crossing (memory)
        occ = sdf[corner_ids] > 0
        s = occ.sum(-1)
        active = (s > 0) & (s < 8)
        tets = corner_ids[active][:, _CUBE_TETS].reshape(-1, 4)
        if tets.shape[0] == 0:
            out_v.append(jnp.zeros((0, 3)))
            out_f.append(jnp.zeros((0, 3), dtype=jnp.int64))
            continue
        vlist, flist = marching_tetrahedra(
            jnp.asarray(verts, jnp.float64)[None], tets,
            jnp.asarray(sdf)[None])
        # -1 to undo padding, +0.5 for voxel-center convention
        out_v.append(vlist[0] - 1.0 + 0.5)
        out_f.append(flist[0])
    return out_v, out_f
