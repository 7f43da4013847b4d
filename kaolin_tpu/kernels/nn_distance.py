"""Pallas TPU kernel for brute-force nearest-neighbour queries.

TPU-native replacement for the HBM-bound XLA formulation of
``sided_distance`` (reference CUDA kernel
``kaolin/csrc/metrics/sided_distance_cuda.cu:53-301``, shared-memory
tiles of p2). The XLA scan materializes every (N1, chunk) distance
tile in HBM (~80 GB of traffic at 100k x 100k); this kernel keeps each
(T1, T2) tile in VMEM and carries only the (T1, 1) running min/argmin,
so the pass is VPU-compute-bound (~8 ops per pair).

Distances use the same subtract-square-sum form as the XLA path, so the
selected indices match it bit-for-bit (ties keep the lowest index:
strict ``<`` across chunks, first-occurrence within a chunk — the CUDA
sequential-scan rule).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['nearest_idx_pallas', 'nearest_idx_pruned', 'MAX_REF_POINTS']

T1 = 512      # query rows per grid step
T2 = 1024     # reference columns per inner chunk
_PAD = 1e30   # padding coordinate: distance overflows to +inf
# Both kernels keep the entire reference cloud resident in VMEM
# (nearest_idx_pallas: (3, N2p) f32 = 12 B/point; nearest_idx_pruned:
# (4, N2p) = 16 B/point). 640k points ~ 10 MB leaves headroom within
# the ~16 MB of VMEM for the query tile and output; beyond this the
# compile fails, so callers must fall back to the XLA scan
# (metrics.pointcloud._nearest auto-routes).
MAX_REF_POINTS = 640 * 1024


def _nn_kernel(p1_ref, p2_ref, idx_ref, *, n2_chunks):
    i1 = jax.lax.broadcasted_iota(jnp.int32, (T1, T2), 1)

    def chunk(c, carry):
        best_d, best_i = carry
        acc = jnp.zeros((T1, T2), jnp.float32)
        for k in range(3):
            d = (p1_ref[0, :, k:k + 1]
                 - p2_ref[0, k:k + 1, pl.ds(c * T2, T2)])
            acc = acc + d * d
        dmin = jnp.min(acc, axis=1, keepdims=True)
        # first-occurrence argmin via iota masking (argmin's variadic
        # reduce does not lower everywhere in Pallas TPU)
        lane = jnp.min(jnp.where(acc == dmin, i1, jnp.int32(2 ** 30)),
                       axis=1, keepdims=True)
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d),
                jnp.where(take, lane + c * T2, best_i))

    init = (jnp.full((T1, 1), jnp.inf, jnp.float32),
            jnp.zeros((T1, 1), jnp.int32))
    _, best_i = jax.lax.fori_loop(0, n2_chunks, chunk, init)
    idx_ref[0, :, :] = best_i


@functools.partial(jax.jit, static_argnames=('interpret',))
def nearest_idx_pallas(p1, p2, interpret=False):
    """For each point of ``p1`` (B, N1, 3), the index of the closest
    point of ``p2`` (B, N2, 3). int32 (B, N1)."""
    B, N1, _ = p1.shape
    N2 = p2.shape[1]
    n1p = (-N1) % T1
    n2p = (-N2) % T2
    p1p = jnp.pad(p1.astype(jnp.float32), ((0, 0), (0, n1p), (0, 0)))
    p2p = jnp.pad(p2.astype(jnp.float32), ((0, 0), (0, n2p), (0, 0)),
                  constant_values=_PAD)
    p2t = p2p.transpose(0, 2, 1)                     # (B, 3, N2p)
    N1p, N2p = N1 + n1p, N2 + n2p
    kernel = functools.partial(_nn_kernel, n2_chunks=N2p // T2)
    idx = pl.pallas_call(
        kernel,
        grid=(B, N1p // T1),
        in_specs=[
            pl.BlockSpec((1, T1, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N2p), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T1, 1), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N1p, 1), jnp.int32),
        interpret=interpret,
    )(p1p, p2t)
    return idx[:, :N1, 0]


# ---------------------------------------------------------------------------
# Morton-banded exact pruning: for large clouds, restrict each query
# tile's scan to a contiguous range of Morton-sorted reference chunks
# chosen by an exact AABB lower-bound test. Identical results to the
# brute-force pass (including ties): distances use the same per-pair
# arithmetic, winners carry ORIGINAL indices and ties resolve to the
# lowest original index (the CUDA sequential-scan rule), and the range
# is a superset of every chunk whose AABB lower bound does not exceed
# the query tile's proven upper bound.

_PROBE = 128       # reference points probed per query tile for the UB


def _spread3(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _morton(p):
    """(B, N, 3) -> (B, N) int32 Morton codes on a per-cloud 1024^3
    grid."""
    lo = jnp.min(p, axis=1, keepdims=True)
    span = jnp.maximum(jnp.max(p, axis=1, keepdims=True) - lo, 1e-12)
    q = jnp.clip((p - lo) / span * 1024., 0, 1023).astype(jnp.int32)
    return ((_spread3(q[..., 0]) << 2) | (_spread3(q[..., 1]) << 1)
            | _spread3(q[..., 2]))


def _msort(p, pad_to):
    """Morton-sort a cloud, padding by repeating the (sorted) last
    point. Returns (sorted (B, Np, 3), orig index (B, Np) int32 — pads
    get a large sentinel so ties prefer real points)."""
    B, N, _ = p.shape
    code = _morton(p)
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    _, x, y, z, orig = jax.lax.sort(
        (code, p[..., 0], p[..., 1], p[..., 2], iota), num_keys=1,
        is_stable=False)
    ps = jnp.stack([x, y, z], axis=-1)
    pad = pad_to - N
    if pad:
        ps = jnp.concatenate(
            [ps, jnp.broadcast_to(ps[:, -1:], (B, pad, 3))], axis=1)
        orig = jnp.concatenate(
            [orig, jnp.full((B, pad), jnp.int32(1 << 29))], axis=1)
    return ps, orig


def _nn_kernel_pruned(start_ref, num_ref, p1_ref, p2_ref, idx_ref):
    i1 = jax.lax.broadcasted_iota(jnp.int32, (T1, T2), 1)
    b = pl.program_id(0)
    i = pl.program_id(1)
    start = start_ref[b, i]

    def chunk(c, carry):
        best_d, best_i = carry
        base = pl.multiple_of((start + c) * T2, T2)
        acc = jnp.zeros((T1, T2), jnp.float32)
        for k in range(3):
            d = (p1_ref[0, :, k:k + 1] - p2_ref[0, k:k + 1,
                                                pl.ds(base, T2)])
            acc = acc + d * d
        orig_row = p2_ref[0, 3:4, pl.ds(base, T2)]      # (1, T2) f32
        dmin = jnp.min(acc, axis=1, keepdims=True)
        cand = jnp.min(jnp.where(acc == dmin, orig_row,
                                 jnp.float32(2 ** 30)),
                       axis=1, keepdims=True).astype(jnp.int32)
        take = (dmin < best_d) | ((dmin == best_d) & (cand < best_i))
        return (jnp.where(take, dmin, best_d),
                jnp.where(take, cand, best_i))

    init = (jnp.full((T1, 1), jnp.inf, jnp.float32),
            jnp.full((T1, 1), jnp.int32(2 ** 30)))
    _, best_i = jax.lax.fori_loop(0, num_ref[b, i], chunk, init)
    idx_ref[0, :, :] = best_i


@functools.partial(jax.jit, static_argnames=('interpret',))
def nearest_idx_pruned(p1, p2, interpret=False):
    """Exact nearest-neighbour indices with Morton-banded pruning.

    Bit-identical to :func:`nearest_idx_pallas` / the XLA scan
    (distance form, lowest-original-index ties); typically scans a
    small fraction of the reference chunks per query tile."""
    B, N1, _ = p1.shape
    N2 = p2.shape[1]
    if N2 > MAX_REF_POINTS:
        raise ValueError(
            f'nearest_idx_pruned holds the reference cloud in VMEM '
            f'(16 B/point): N2={N2} > {MAX_REF_POINTS}; use the XLA '
            f'backend for larger clouds')
    n1p = N1 + ((-N1) % T1)
    n2p = N2 + ((-N2) % T2)
    p1s, orig1 = _msort(p1.astype(jnp.float32), n1p)
    p2s, orig2 = _msort(p2.astype(jnp.float32), n2p)
    C1, C2 = n1p // T1, n2p // T2

    # AABBs
    q = p1s.reshape(B, C1, T1, 3)
    r = p2s.reshape(B, C2, T2, 3)
    qlo, qhi = q.min(axis=2), q.max(axis=2)           # (B, C1, 3)
    rlo, rhi = r.min(axis=2), r.max(axis=2)           # (B, C2, 3)

    # exact per-(qtile, rchunk) lower bound: squared AABB gap
    gap = jnp.maximum(0., jnp.maximum(
        rlo[:, None, :, :] - qhi[:, :, None, :],
        qlo[:, :, None, :] - rhi[:, None, :, :]))     # (B, C1, C2, 3)
    lb = jnp.sum(gap * gap, axis=-1)                  # (B, C1, C2)

    # upper bound per query tile: exact min distance to a probe subset
    # of the nearest-LB chunk (a smaller probe only loosens the bound)
    probe = jnp.argmin(lb, axis=-1).astype(jnp.int32)            # (B, C1)
    pidx = (probe[..., None] * T2
            + jnp.arange(_PROBE, dtype=jnp.int32))               # (B,C1,P)
    ppts = jnp.take_along_axis(
        p2s, pidx.reshape(B, -1, 1), axis=1).reshape(B, C1, _PROBE, 3)
    d2 = jnp.sum((q[:, :, :, None, :] - ppts[:, :, None, :, :]) ** 2,
                 axis=-1)                                        # (B,C1,T1,P)
    ub = jnp.max(jnp.min(d2, axis=-1), axis=-1)                  # (B, C1)

    # contiguous chunk range covering every non-prunable chunk
    keep = lb <= ub[:, :, None]                                  # (B,C1,C2)
    first = jnp.argmax(keep, axis=-1)
    last = C2 - 1 - jnp.argmax(keep[:, :, ::-1], axis=-1)
    starts = first.astype(jnp.int32)
    nums = (last - first + 1).astype(jnp.int32)

    p2t = jnp.concatenate([p2s.transpose(0, 2, 1),
                           orig2[:, None, :].astype(jnp.float32)],
                          axis=1)                                # (B,4,N2p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, C1),
        in_specs=[
            pl.BlockSpec((1, T1, 3), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n2p), lambda b, i, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T1, 1), lambda b, i, *_: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    idx_sorted = pl.pallas_call(
        _nn_kernel_pruned,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n1p, 1), jnp.int32),
        interpret=interpret,
    )(starts, nums, p1s, p2t)[..., 0]                            # (B, n1p)

    # un-sort back to the original query order
    out = jnp.zeros((B, N1), jnp.int32)
    out = jax.vmap(lambda o, pos, val: o.at[pos].set(val,
                                                     mode='drop'))(
        out, orig1, idx_sorted)
    return out
