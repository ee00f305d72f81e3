"""Fused Pallas exact-KNN kernel.

The reference's neighbourhood searches either materialise full distance
matrices on GPU (``knn.py:7-55``) or round-trip to CPU FAISS
(``knn.py:58-117``). XLA's stock ``top_k`` is ~100× off memory-bound on TPU
(measured: 148 ms for one (64k, 4096) tile), so this kernel replaces the
distance+select pipeline entirely:

1. **Morton sort** (XLA side, ~free): support and query points are sorted by
   10-bit-per-axis Morton code, giving spatial locality to the tile
   decomposition — the TPU analogue of FAISS's IVF cells, with zero index
   build cost.
2. **Tiled VMEM sweep** (Pallas): each program owns one query block
   (QB queries in VMEM) and walks support tiles (TS points, coordinate-major
   so lanes hold points) in a zig-zag order starting from the query block's
   own Morton neighbourhood, so the running k-th-best threshold tightens
   immediately.
3. **BBox culling**: per-tile axis-aligned bounding boxes are precomputed;
   a tile is skipped (predicated out) when every query's lower-bound
   distance to the box exceeds its current k-th best — exactness is
   preserved because the bound is a true lower bound. On spatially coherent
   clouds the vast majority of tiles are culled.
4. **Exact merge**: surviving tiles are merged with a k-pass min-extraction
   over the (QB, 128+TS) candidate row — all in VMEM, the distance tile
   never touches HBM.

Mosaic notes: every lane dimension is kept a multiple of 128 and all
scalar/lane extractions are done with masked reductions instead of sub-vreg
lane slices (which crash the vector-layout pass on this toolchain).

Contract matches ops/knn.py: ``(indices int32 (B, M, k), squared dists f32)``.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL = 1e9  # padding coordinate; squared distance ~3e18 ≪ f32 max
_KB = 128  # lane width of the running-best buffer (slots >= k hold +inf)


def _part1by2(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so consecutive bits are 3 apart."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_codes(xyz: jax.Array) -> jax.Array:
    """(B, N, 3) -> (B, N) int32 Morton codes (per-batch normalised)."""
    mn = jnp.min(xyz, axis=1, keepdims=True)
    mx = jnp.max(xyz, axis=1, keepdims=True)
    q = jnp.clip(
        (xyz - mn) / (mx - mn + 1e-9) * 1023.0, 0, 1023
    ).astype(jnp.int32)
    return (
        _part1by2(q[..., 0])
        | (_part1by2(q[..., 1]) << 1)
        | (_part1by2(q[..., 2]) << 2)
    )


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _lane_select(vec: jax.Array, lane_iota: jax.Array, idx) -> jax.Array:
    """Extract lane ``idx`` of each row as (rows, 1) via masked reduction
    (mosaic-safe replacement for a sub-vreg lane slice)."""
    return jnp.sum(
        jnp.where(lane_iota == idx, vec, 0.0), axis=1, keepdims=True
    )


def _knn_kernel(
    order_ref,  # SMEM (B, n_blocks, n_tiles) int32: per-block tile visit order
    boxd_ref,  # SMEM (B, n_blocks, n_tiles) f32: box-to-box lb, ascending
    q_ref,  # (1, QB, 3) queries (sorted order)
    s_ref,  # (1, 4, N_pad) support, coordinate-major (4th row is padding)
    bbox_ref,  # (1, n_tiles, 8) per-tile [min xyz, max xyz, pad, pad]
    idx_ref,  # out (1, QB, 128) int32 (into sorted support; lanes >= k junk)
    d2_ref,  # out (1, QB, 128) f32
    *,
    k: int,
    ts: int,
    n_tiles: int,
):
    qb = q_ref.shape[1]
    q = q_ref[0]  # (QB, 3)
    iota3 = lax.broadcasted_iota(jnp.int32, (qb, 3), 1)
    qx = _lane_select(q, iota3, 0)  # (QB, 1)
    qy = _lane_select(q, iota3, 1)
    qz = _lane_select(q, iota3, 2)
    bi = pl.program_id(0)
    qi = pl.program_id(1)

    lane = lax.broadcasted_iota(jnp.int32, (qb, _KB + ts), 1)
    cand_tail = lax.broadcasted_iota(jnp.int32, (qb, ts), 1)
    lane_kb = lax.broadcasted_iota(jnp.int32, (qb, _KB), 1)
    iota8 = lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    def cond(carry):
        # visit order is ascending in box-to-box lower bound: once the next
        # tile's bound exceeds the WORST k-th-best in the block, every later
        # tile does too -> exact early exit.
        step, theta_max, _best_d, _best_i = carry
        in_range = step < n_tiles
        safe_step = jnp.minimum(step, n_tiles - 1)
        next_lb = boxd_ref[bi, qi, safe_step]
        return in_range & (next_lb < theta_max)

    def body(carry):
        step, _theta_max, best_d, best_i = carry
        t = order_ref[bi, qi, step]

        # per-query bbox lower-bound cull (tighter than the block-level bound)
        bb = bbox_ref[0, pl.ds(t, 1), :]  # (1, 8)
        lb = jnp.zeros((qb, 1), jnp.float32)
        for d, qc in enumerate((qx, qy, qz)):
            lo = _lane_select(bb, iota8, d)  # (1, 1)
            hi = _lane_select(bb, iota8, 3 + d)
            delta = jnp.maximum(lo - qc, 0.0) + jnp.maximum(qc - hi, 0.0)
            lb = lb + delta * delta
        # k-th best (lane k-1 of the sorted buffer) via masked reduction
        theta = jnp.sum(
            jnp.where(lane_kb == k - 1, best_d, 0.0), axis=1, keepdims=True
        )
        visit = jnp.any(lb < theta)

        def merge(carry_in):
            best_d, best_i = carry_in
            # squared distances via broadcast (contraction dim is only 3, so
            # explicit FMA beats a degenerate MXU matmul)
            sx = s_ref[0, 0:1, pl.ds(t * ts, ts)]  # (1, TS)
            sy = s_ref[0, 1:2, pl.ds(t * ts, ts)]
            sz = s_ref[0, 2:3, pl.ds(t * ts, ts)]
            d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2  # (QB, TS)
            cand_d = jnp.concatenate([best_d, d2], axis=1)  # (QB, KB+TS)
            cand_i = jnp.concatenate([best_i, cand_tail + t * ts], axis=1)
            ds, inds = [], []
            big = jnp.int32(_KB + ts)
            for _j in range(k):
                m = jnp.min(cand_d, axis=1, keepdims=True)  # (QB, 1)
                # first-occurrence argmin via iota-min
                pos = jnp.min(
                    jnp.where(cand_d == m, lane, big), axis=1, keepdims=True
                )  # (QB, 1)
                onehot = lane == pos
                sel_i = jnp.sum(
                    jnp.where(onehot, cand_i, 0), axis=1, keepdims=True
                )  # (QB, 1)
                cand_d = jnp.where(onehot, jnp.inf, cand_d)
                ds.append(m)
                inds.append(sel_i)
            if _KB > k:
                ds.append(jnp.full((qb, _KB - k), jnp.inf, jnp.float32))
                inds.append(jnp.zeros((qb, _KB - k), jnp.int32))
            return (
                jnp.concatenate(ds, axis=1),
                jnp.concatenate(inds, axis=1).astype(jnp.int32),
            )

        best_d, best_i = lax.cond(visit, merge, lambda c: c, (best_d, best_i))
        theta_all = jnp.sum(
            jnp.where(lane_kb == k - 1, best_d, 0.0), axis=1, keepdims=True
        )
        theta_max = jnp.max(theta_all)
        return step + 1, theta_max, best_d, best_i

    init = (
        jnp.int32(0),
        jnp.float32(jnp.inf),
        jnp.full((qb, _KB), jnp.inf, dtype=jnp.float32),
        jnp.zeros((qb, _KB), dtype=jnp.int32),
    )
    _, _, best_d, best_i = lax.while_loop(cond, body, init)
    idx_ref[0] = best_i
    d2_ref[0] = best_d


def _knn_kernel_hbm(
    order_ref,  # SMEM (B, n_blocks, n_tiles) int32: per-block tile visit order
    boxd_ref,  # SMEM (B, n_blocks, n_tiles) f32: box-to-box lb, ascending
    q_ref,  # (1, QB, 3) queries (sorted order), VMEM
    s_ref,  # (B, 4, N_pad) full support in HBM/ANY — tiles DMA'd on demand
    bbox_ref,  # (1, n_tiles, 8) VMEM
    idx_ref,  # out (1, QB, 128) int32
    d2_ref,  # out (1, QB, 128) f32
    best_d_ref,  # scratch VMEM (QB, 128)
    best_i_ref,  # scratch VMEM (QB, 128)
    s_tile_ref,  # scratch VMEM (4, TS) — the visiting support tile
    dma_sem,  # DMA semaphore
    *,
    k: int,
    ts: int,
    n_tiles: int,
):
    """Large-N variant: support stays in HBM; a tile is DMA'd into VMEM only
    when it survives the bbox cull (culled tiles cost zero HBM traffic).
    Same results as the VMEM kernel."""
    qb = q_ref.shape[1]
    q = q_ref[0]
    iota3 = lax.broadcasted_iota(jnp.int32, (qb, 3), 1)
    qx = _lane_select(q, iota3, 0)
    qy = _lane_select(q, iota3, 1)
    qz = _lane_select(q, iota3, 2)
    bi = pl.program_id(0)
    qi = pl.program_id(1)

    lane = lax.broadcasted_iota(jnp.int32, (qb, _KB + ts), 1)
    cand_tail = lax.broadcasted_iota(jnp.int32, (qb, ts), 1)
    lane_kb = lax.broadcasted_iota(jnp.int32, (qb, _KB), 1)
    iota8 = lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    best_d_ref[:] = jnp.full((qb, _KB), jnp.inf, jnp.float32)
    best_i_ref[:] = jnp.zeros((qb, _KB), jnp.int32)

    def cond(carry):
        step, theta_max = carry
        in_range = step < n_tiles
        safe_step = jnp.minimum(step, n_tiles - 1)
        next_lb = boxd_ref[bi, qi, safe_step]
        return in_range & (next_lb < theta_max)

    def body(carry):
        step, _theta_max = carry
        # visit tiles nearest-box-first (order prefetched into SMEM)
        t = order_ref[bi, qi, step]

        bb = bbox_ref[0, pl.ds(t, 1), :]
        lb = jnp.zeros((qb, 1), jnp.float32)
        for d, qc in enumerate((qx, qy, qz)):
            lo = _lane_select(bb, iota8, d)
            hi = _lane_select(bb, iota8, 3 + d)
            delta = jnp.maximum(lo - qc, 0.0) + jnp.maximum(qc - hi, 0.0)
            lb = lb + delta * delta
        best_d = best_d_ref[:]
        theta = jnp.sum(
            jnp.where(lane_kb == k - 1, best_d, 0.0), axis=1, keepdims=True
        )
        visit = jnp.any(lb < theta)

        @pl.when(visit)
        def _():
            dma = pltpu.make_async_copy(
                s_ref.at[pl.program_id(0), :, pl.ds(t * ts, ts)],
                s_tile_ref,
                dma_sem,
            )
            dma.start()
            dma.wait()
            sx = s_tile_ref[0:1, :]
            sy = s_tile_ref[1:2, :]
            sz = s_tile_ref[2:3, :]
            d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2
            cand_d = jnp.concatenate([best_d_ref[:], d2], axis=1)
            cand_i = jnp.concatenate(
                [best_i_ref[:], cand_tail + t * ts], axis=1
            )
            ds, inds = [], []
            big = jnp.int32(_KB + ts)
            for _j in range(k):
                m = jnp.min(cand_d, axis=1, keepdims=True)
                pos = jnp.min(
                    jnp.where(cand_d == m, lane, big), axis=1, keepdims=True
                )
                onehot = lane == pos
                sel_i = jnp.sum(
                    jnp.where(onehot, cand_i, 0), axis=1, keepdims=True
                )
                cand_d = jnp.where(onehot, jnp.inf, cand_d)
                ds.append(m)
                inds.append(sel_i)
            if _KB > k:
                ds.append(jnp.full((qb, _KB - k), jnp.inf, jnp.float32))
                inds.append(jnp.zeros((qb, _KB - k), jnp.int32))
            best_d_ref[:] = jnp.concatenate(ds, axis=1)
            best_i_ref[:] = jnp.concatenate(inds, axis=1).astype(jnp.int32)

        theta_all = jnp.sum(
            jnp.where(lane_kb == k - 1, best_d_ref[:], 0.0),
            axis=1,
            keepdims=True,
        )
        return step + 1, jnp.max(theta_all)

    lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(jnp.inf)))
    idx_ref[0] = best_i_ref[:]
    d2_ref[0] = best_d_ref[:]


# support arrays larger than this stay in HBM with on-demand tile DMA
_VMEM_SUPPORT_LIMIT_BYTES = 4 * 1024 * 1024


def _knn_pallas_sorted(
    support: jax.Array,
    query: jax.Array,
    k: int,
    qb: int,
    ts: int,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array]:
    """KNN on Morton-sorted inputs; returns indices into the sorted support.
    support (B, N_pad, 3) with N_pad % ts == 0; query (B, M_pad, 3) with
    M_pad % qb == 0."""
    B, n_pad, _ = support.shape
    m_pad = query.shape[1]
    n_tiles = n_pad // ts

    tiles = support.reshape(B, n_tiles, ts, 3)
    tile_lo = jnp.min(tiles, axis=2)  # (B, n_tiles, 3)
    tile_hi = jnp.max(tiles, axis=2)
    bbox = jnp.concatenate(
        [tile_lo, tile_hi, jnp.zeros((B, n_tiles, 2), support.dtype)],
        axis=-1,
    )  # (B, n_tiles, 8)

    # per-query-block tile visit order by TRUE 3-D box-to-box distance
    # (tightens the running threshold immediately; Morton adjacency alone is
    # only a 1-D proxy). Computed in XLA, prefetched into SMEM.
    n_blocks = m_pad // qb
    q_blocks = query.reshape(B, n_blocks, qb, 3)
    q_lo = jnp.min(q_blocks, axis=2)  # (B, n_blocks, 3)
    q_hi = jnp.max(q_blocks, axis=2)
    gap = jnp.maximum(
        tile_lo[:, None, :, :] - q_hi[:, :, None, :], 0.0
    ) + jnp.maximum(q_lo[:, :, None, :] - tile_hi[:, None, :, :], 0.0)
    box_d2 = jnp.sum(gap * gap, axis=-1)  # (B, n_blocks, n_tiles)
    visit_order = jnp.argsort(box_d2, axis=-1).astype(jnp.int32)
    boxd_sorted = jnp.take_along_axis(box_d2, visit_order, axis=-1)
    # coordinate-major with the coord dim padded 3 -> 4 so DMA slices stay
    # sublane-tile aligned (mosaic requires dim -2 slices aligned to 4)
    support_t = jnp.swapaxes(support, 1, 2)  # (B, 3, N_pad)
    support_t = jnp.concatenate(
        [support_t, jnp.zeros((B, 1, n_pad), support_t.dtype)], axis=1
    )  # (B, 4, N_pad)

    grid = (B, m_pad // qb)
    hbm = n_pad * 3 * 4 > _VMEM_SUPPORT_LIMIT_BYTES
    common_specs = dict(
        q=pl.BlockSpec(
            (1, qb, 3), lambda b, i, order, boxd: (b, i, 0), memory_space=pltpu.VMEM
        ),
        bbox=pl.BlockSpec(
            (1, n_tiles, 8),
            lambda b, i, order, boxd: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out_specs = [
        pl.BlockSpec(
            (1, qb, _KB), lambda b, i, order, boxd: (b, i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, qb, _KB), lambda b, i, order, boxd: (b, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, m_pad, _KB), jnp.int32),
        jax.ShapeDtypeStruct((B, m_pad, _KB), jnp.float32),
    ]
    if hbm and not interpret:
        kernel = functools.partial(
            _knn_kernel_hbm, k=k, ts=ts, n_tiles=n_tiles
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                common_specs["q"],
                pl.BlockSpec(memory_space=pltpu.ANY),
                common_specs["bbox"],
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((qb, _KB), jnp.float32),
                pltpu.VMEM((qb, _KB), jnp.int32),
                pltpu.VMEM((4, ts), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        idx, d2 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(visit_order, boxd_sorted, query, support_t, bbox)
    else:
        kernel = functools.partial(_knn_kernel, k=k, ts=ts, n_tiles=n_tiles)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                common_specs["q"],
                pl.BlockSpec(
                    (1, 4, n_pad),
                    lambda b, i, order, boxd: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                common_specs["bbox"],
            ],
            out_specs=out_specs,
        )
        idx, d2 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(visit_order, boxd_sorted, query, support_t, bbox)
    return idx[..., :k], jnp.maximum(d2[..., :k], 0.0)


def knn_pallas(
    support: jax.Array,
    query: jax.Array,
    k: int,
    query_block: int = None,
    support_tile: int = None,
    interpret: bool = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact KNN via the fused Morton/cull/merge kernel.

    Same contract as ops/knn.py functions: (indices int32 (B, M, k),
    squared distances f32 (B, M, k)), indices into the ORIGINAL (unsorted)
    support order.

    Default block sizes come from a v5e sweep: small clouds prefer more
    queries per program (fewer grid iterations), large clouds prefer small
    query blocks (tighter per-block thresholds -> more tile culling).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, n, _ = support.shape
    m = query.shape[1]
    assert k <= n, f"k={k} exceeds support size {n}"
    assert k <= _KB, f"k={k} > {_KB} not supported by the pallas kernel"
    if support_tile is None:
        support_tile = 512 if n <= 8192 else 1024
    if query_block is None:
        query_block = 256 if m <= 8192 else 128

    ts = min(support_tile, _round_up(n, 128))
    qb = min(query_block, _round_up(m, 8))

    # Morton-sort support and queries (XLA side, cheap)
    s_order = jnp.argsort(morton_codes(support), axis=1)  # (B, N)
    s_sorted = jnp.take_along_axis(support, s_order[..., None], axis=1)
    same = support is query
    if same:
        q_order, q_sorted = s_order, s_sorted
    else:
        q_order = jnp.argsort(morton_codes(query), axis=1)
        q_sorted = jnp.take_along_axis(query, q_order[..., None], axis=1)

    # pad to tile multiples with far-away sentinels
    n_pad = _round_up(n, ts)
    m_pad = _round_up(m, qb)
    if n_pad != n:
        s_sorted = jnp.concatenate(
            [
                s_sorted,
                jnp.full((B, n_pad - n, 3), _SENTINEL, s_sorted.dtype),
            ],
            axis=1,
        )
    if m_pad != m:
        q_sorted = jnp.concatenate(
            [q_sorted, jnp.zeros((B, m_pad - m, 3), q_sorted.dtype)], axis=1
        )

    idx_sorted, d2_sorted = _knn_pallas_sorted(
        s_sorted, q_sorted, k, qb, ts, interpret
    )
    idx_sorted = idx_sorted[:, :m]
    d2_sorted = d2_sorted[:, :m]

    # map sorted-support indices back to original ids
    idx_orig = jax.vmap(lambda order, idx: order[idx])(s_order, idx_sorted)
    # un-sort the query dimension
    inv_q = jnp.argsort(q_order, axis=1)
    idx_out = jnp.take_along_axis(idx_orig, inv_q[..., None], axis=1)
    d2_out = jnp.take_along_axis(d2_sorted, inv_q[..., None], axis=1)
    return idx_out, d2_out
