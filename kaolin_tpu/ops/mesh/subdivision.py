"""Loop-style differentiable mesh subdivision with learnable alpha.

Reference: ``kaolin/ops/mesh/trianglemesh.py:481`` (``subdivide_trianglemesh``).
Topology work (edge dedup, face pairing) runs on host numpy — mesh
connectivity is static metadata; vertex/alpha updates are jnp and
differentiable (the DMTet use case).
"""

import math

import numpy as np
import jax.numpy as jnp

__all__ = ['subdivide_trianglemesh']


def _get_alpha(n):
    """Loop-subdivision weight per vertex valence
    (``kaolin/ops/mesh/trianglemesh.py:467``)."""
    alpha = (5.0 / 8 - (3.0 / 8 + 1.0 / 4 * np.cos(2 * math.pi / n)) ** 2) / n
    alpha = np.where(n == 3, 3. / 16., alpha)
    return alpha


def subdivide_trianglemesh(vertices, faces, iterations, alpha=None):
    """Subdivides triangle meshes following Loop subdivision; with a given
    per-vertex ``alpha`` the positional update is differentiable and alpha
    carries over iterations (alpha=0 pins a vertex).

    Reference: ``kaolin/ops/mesh/trianglemesh.py:481``.

    Args:
        vertices: (batch_size, num_vertices, 3).
        faces: (num_faces, 3) int (host or device).
        iterations (int): number of subdivision rounds.
        alpha: optional (batch_size, num_vertices) smoothing factors.

    Returns:
        (new_vertices (B, V', 3), new_faces (F * 4**iterations, 3)).

    Example:
        >>> import jax.numpy as jnp
        >>> v = jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]]])
        >>> f = jnp.asarray([[0, 1, 2]])
        >>> nv, nf = subdivide_trianglemesh(v, f, 1)
        >>> nv.shape, nf.shape  # 3 corners + 3 edge midpoints, 4 faces
        ((1, 6, 3), (4, 3))
        >>> bool(jnp.all(nv[0, 3:].max(0) <= v[0].max(0)))
        True
    """
    faces_np = np.asarray(faces)
    init_alpha = alpha
    if alpha is not None and alpha.ndim == 2:
        alpha = alpha[..., None]
    for _ in range(iterations):
        b, v = vertices.shape[0], vertices.shape[1]
        f = faces_np.shape[0]

        edges = faces_np[:, [[0, 1], [1, 2], [2, 0]]].reshape(-1, 2)
        edges_sorted = np.sort(edges, axis=-1)
        all_edges_face_idx = np.repeat(np.arange(f), 3)
        edges_ex2, inverse_indices, counts = np.unique(
            edges_sorted, axis=0, return_inverse=True, return_counts=True)
        e = edges_ex2.shape[0]

        # symmetric vertex adjacency -> valence n (trianglemesh.py:455-464)
        adj_idx = np.unique(np.concatenate(
            [edges_ex2, edges_ex2[:, ::-1]]), axis=0)
        n_np = np.bincount(adj_idx[:, 1], minlength=v).astype(np.float64)
        n = jnp.asarray(n_np, vertices.dtype)[:, None]

        if init_alpha is None:
            alpha = jnp.asarray(_get_alpha(n_np) * n_np,
                                vertices.dtype)[None, :, None]
        if alpha.ndim == 2:
            alpha = alpha[..., None]

        # neighbour sum via segment gather (dense row x vertices)
        src = jnp.asarray(adj_idx[:, 0])
        dst = adj_idx[:, 1]
        gathered = jnp.take(vertices, src, axis=1)
        seg = jnp.asarray(dst)
        import jax
        adj_sum = jax.vmap(
            lambda g: jax.ops.segment_sum(g, seg, num_segments=v))(gathered)
        vertices_new = (1 - alpha) * vertices + alpha / n * adj_sum

        # interior edges: mean over the 6 verts of the 2 adjacent faces
        # plus the 2 edge verts; boundary edges: midpoint
        mask_e = counts == 2
        mids = jnp.take(vertices, jnp.asarray(edges_ex2.reshape(-1)), axis=1
                        ).reshape(b, e, 2, 3)
        mid_alpha = jnp.take(alpha, jnp.asarray(edges_ex2.reshape(-1)),
                             axis=1).reshape(b, e, 2, 1)
        edge_points = jnp.mean(mids, axis=2)
        alpha_points = jnp.mean(mid_alpha, axis=2)

        if mask_e.any():
            counts_f = counts[inverse_indices]
            mask_f = counts_f == 2
            group = inverse_indices[mask_f]
            order = np.argsort(group, kind='stable')
            edges_grouped = all_edges_face_idx[mask_f][order]
            edges_face_idx = np.stack(
                [edges_grouped[::2], edges_grouped[1::2]], axis=-1)
            edges_face = faces_np[edges_face_idx.reshape(-1)].reshape(-1, 2, 3)
            int_ids = np.where(mask_e)[0]
            verts6 = jnp.take(vertices, jnp.asarray(edges_face.reshape(-1)),
                              axis=1).reshape(b, -1, 6, 3)
            ends2 = jnp.take(vertices,
                             jnp.asarray(edges_ex2[mask_e].reshape(-1)),
                             axis=1).reshape(b, -1, 2, 3)
            interior_pts = jnp.concatenate([verts6, ends2], axis=2).mean(2)
            a6 = jnp.take(alpha, jnp.asarray(edges_face.reshape(-1)),
                          axis=1).reshape(b, -1, 6, 1)
            a2 = jnp.take(alpha, jnp.asarray(edges_ex2[mask_e].reshape(-1)),
                          axis=1).reshape(b, -1, 2, 1)
            interior_alpha = jnp.concatenate([a6, a2], axis=2).mean(2)
            edge_points = edge_points.at[:, jnp.asarray(int_ids)].set(
                interior_pts)
            alpha_points = alpha_points.at[:, jnp.asarray(int_ids)].set(
                interior_alpha)

        alpha = jnp.concatenate([alpha, alpha_points], axis=1)
        vertices = jnp.concatenate([vertices_new, edge_points], axis=1)
        edges_fx3 = inverse_indices.reshape(f, 3) + v
        faces6 = np.concatenate([faces_np, edges_fx3], axis=1)
        faces_np = faces6[:, [[1, 4, 3], [0, 3, 5], [2, 5, 4],
                              [5, 3, 4]]].reshape(-1, 3)
    return vertices, jnp.asarray(faces_np)
