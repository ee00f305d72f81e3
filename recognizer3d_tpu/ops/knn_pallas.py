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
2. **In-kernel nearest-box-first traversal**: each program owns one query
   block (QB queries in VMEM). At start it computes the box-to-box lower
   bound from its own bounding box to every support tile's bounding box
   into a VMEM vector; each iteration extracts the nearest unvisited tile
   with a masked argmin (a lane-reduction — no SMEM order arrays, so the
   kernel scales to millions of points where a precomputed per-block visit
   order would blow the 1 MB SMEM budget). Once the next tile's bound
   exceeds the block's worst k-th-best, every later tile's does too —
   exact early exit.
3. **BBox culling**: a tile is skipped (predicated out) when every query's
   individual lower-bound distance to the tile box exceeds its current
   k-th best — exactness is preserved because the bound is a true lower
   bound. On spatially coherent clouds the vast majority of tiles are
   culled; in the ``hbm`` variant culled tiles cost zero HBM traffic.
4. **Packed-key extraction merge**: a surviving tile's distances are packed
   into int32 keys — distance bits (the bitcast is order-preserving for
   non-negative f32) with the low bits (log2(ts): 10 at ts=1024) replaced
   by the lane index — so one integer comparison encodes the (value, lane)
   lexicographic order.
   Each pass extracts the next-smallest key (~6 VMEM sweeps; the merge is
   bandwidth-bound) and inserts the winner into the sorted best buffer
   with one lane-shift; reported distances are exact f32 (per-winner
   recovery), and the loop's stop test uses the truncated lower bound of
   the next key, so the selected top-k SET is exact: extraction stops only
   when no later candidate can beat any query's running k-th best. All in
   VMEM; the distance tile never touches HBM.

Mosaic notes: every big lane dimension is kept a multiple of 128 and all
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


def invert_permutation(perm: jax.Array) -> jax.Array:
    """Inverse of a permutation via an O(N) scatter.

    ``jnp.argsort(perm)`` computes the same thing but pays a full
    O(N log² N) sort on TPU (several ms at 64k points, and it appears once
    per KNN call plus once per forward pass); the scatter form lowers to a
    single row-scatter. Accepts (N,) or batched (B, N)."""
    iota = lax.broadcasted_iota(perm.dtype, perm.shape, perm.ndim - 1)
    if perm.ndim == 1:
        return jnp.zeros_like(perm).at[perm].set(iota)
    return jax.vmap(lambda p, i: jnp.zeros_like(p).at[p].set(i))(perm, iota)


def _lane_select(vec: jax.Array, lane_iota: jax.Array, idx) -> jax.Array:
    """Extract lane ``idx`` of each row as (rows, 1) via masked reduction
    (mosaic-safe replacement for a sub-vreg lane slice)."""
    return jnp.sum(
        jnp.where(lane_iota == idx, vec, 0.0), axis=1, keepdims=True
    )


def _knn_kernel(
    q_ref,  # (1, QB, 3) queries (sorted order), VMEM
    s_ref,  # support, coordinate-major (4th row is padding):
    #          VMEM (1, 4, N_pad) when hbm=False; ANY (B, 4, N_pad) when
    #          hbm=True (tiles DMA'd on demand — culled tiles cost zero
    #          HBM traffic)
    bbox_ref,  # (1, 8, n_tiles) per-tile [min xyz | max xyz | pad pad] rows
    sbbox_ref,  # (1, 8, n_tiles*ts/mc) per-MERGE-SUB-CHUNK bbox rows, or
    #            None when mc == ts (sub-chunk pre-cull disabled)
    idx_ref,  # out (1, QB, 128) int32 (into sorted support; lanes >= k junk)
    d2_ref,  # out (1, QB, 128) f32
    best_d_ref,  # scratch VMEM (QB, 128) running best (sorted, +inf padded)
    best_i_ref,  # scratch VMEM (QB, 128)
    tile_d2_ref,  # scratch VMEM (QB, TS) distances of the visiting tile
    tile_key_ref,  # scratch VMEM (QB, TS) int32 packed (distance, lane) keys
    lbvec_ref,  # scratch VMEM (1, n_tiles) box-to-box lb; +inf once visited
    s_tile_ref,  # scratch VMEM (4, TS), hbm=True only (else None)
    dma_sem,  # DMA semaphore, hbm=True only (else None)
    *,
    k: int,
    ts: int,
    n_tiles: int,
    hbm: bool,
    mc: int,
):
    qb = q_ref.shape[1]
    q = q_ref[0]  # (QB, 3)
    iota3 = lax.broadcasted_iota(jnp.int32, (qb, 3), 1)
    qx = _lane_select(q, iota3, 0)  # (QB, 1)
    qy = _lane_select(q, iota3, 1)
    qz = _lane_select(q, iota3, 2)
    bi = pl.program_id(0)

    lane_ts = lax.broadcasted_iota(jnp.int32, (qb, ts), 1)
    # packed-key lane field: enough low bits for the tile's lane index
    # (10 at ts=1024, 11 at ts=2048). Truncation granularity = 2^bits f32
    # ULPs — selection stays exact regardless (the stop test uses the
    # truncated LOWER bound; reported distances are recovered per winner).
    lbits = max(1, (ts - 1).bit_length())
    lmask = jnp.int32((1 << lbits) - 1)
    lkeep = jnp.int32(~((1 << lbits) - 1))
    lane_kb = lax.broadcasted_iota(jnp.int32, (qb, _KB), 1)
    lane_nt = lax.broadcasted_iota(jnp.int32, (1, n_tiles), 1)

    best_d_ref[:] = jnp.full((qb, _KB), jnp.inf, jnp.float32)
    best_i_ref[:] = jnp.zeros((qb, _KB), jnp.int32)

    # per-tile bound rows (1, n_tiles) — coordinate-major bbox layout
    tlo = [bbox_ref[0, d : d + 1, :] for d in range(3)]
    thi = [bbox_ref[0, 3 + d : 4 + d, :] for d in range(3)]

    # box-to-box lower bounds from this query block to every support tile,
    # plus a centre-to-centre distance used ONLY to order exact ties (many
    # overlapping boxes have lb == 0; visiting the spatially nearest one
    # first warms the thresholds fastest — measured ~20% fewer extraction
    # passes). The early-exit test below always uses the TRUE lower bound,
    # so the perturbed visiting order cannot affect exactness.
    lb = jnp.zeros((1, n_tiles), jnp.float32)
    cd2 = jnp.zeros((1, n_tiles), jnp.float32)
    for d, qc in enumerate((qx, qy, qz)):
        q_lo = jnp.min(qc)
        q_hi = jnp.max(qc)
        gap = jnp.maximum(tlo[d] - q_hi, 0.0) + jnp.maximum(
            q_lo - thi[d], 0.0
        )
        lb = lb + gap * gap
        cmid = (tlo[d] + thi[d]) * 0.5 - (q_lo + q_hi) * 0.5
        cd2 = cd2 + cmid * cmid
    lbvec_ref[:] = lb
    ord_bias = cd2 * 1e-6

    def cond(carry):
        # nearest-box-first traversal: once the next tile's bound exceeds
        # the WORST k-th-best in the block, every later tile's does too ->
        # exact early exit. next_m is +inf when all tiles are visited.
        next_m, theta_max = carry
        return next_m < theta_max

    def body(carry):
        next_m, _theta_max = carry
        # nearest unvisited tile (masked argmin over the tie-broken bounds)
        lbv = lbvec_ref[:]
        ordv = lbv + ord_bias
        m_ord = jnp.min(ordv)
        t = jnp.min(
            jnp.where(ordv == m_ord, lane_nt, jnp.int32(n_tiles))
        )  # scalar
        lbvec_ref[:] = jnp.where(lane_nt == t, jnp.inf, lbv)

        # per-query bbox lower-bound cull (tighter than the block bound).
        # Tile bounds stay (1, 1) vectors — every vector->scalar reduction
        # costs a ~µs scalar-core sync, and this loop body is sync-bound.
        theta = jnp.sum(
            jnp.where(lane_kb == k - 1, best_d_ref[:], 0.0),
            axis=1,
            keepdims=True,
        )  # k-th best per query (lane k-1 of the sorted buffer)
        sel_t = lane_nt == t
        lbq = jnp.zeros((qb, 1), jnp.float32)
        for d, qc in enumerate((qx, qy, qz)):
            lo = jnp.sum(jnp.where(sel_t, tlo[d], 0.0), axis=1, keepdims=True)
            hi = jnp.sum(jnp.where(sel_t, thi[d], 0.0), axis=1, keepdims=True)
            delta = jnp.maximum(lo - qc, 0.0) + jnp.maximum(qc - hi, 0.0)
            lbq = lbq + delta * delta
        visit = jnp.any(lbq < theta)

        @pl.when(visit)
        def _():
            if hbm:
                dma = pltpu.make_async_copy(
                    s_ref.at[bi, :, pl.ds(t * ts, ts)], s_tile_ref, dma_sem
                )
                dma.start()
                dma.wait()
                sx = s_tile_ref[0:1, :]
                sy = s_tile_ref[1:2, :]
                sz = s_tile_ref[2:3, :]
            else:
                sx = s_ref[0, 0:1, pl.ds(t * ts, ts)]  # (1, TS)
                sy = s_ref[0, 1:2, pl.ds(t * ts, ts)]
                sz = s_ref[0, 2:3, pl.ds(t * ts, ts)]
            # squared distances via broadcast (contraction dim is only 3, so
            # explicit FMA beats a degenerate MXU matmul)
            d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2  # (QB, TS)
            tile_d2_ref[:] = d2
            # packed selection keys: distance bits (d2 >= 0, so the int32
            # bitcast is order-preserving) with the low 10 bits replaced by
            # the lane index. One key comparison then encodes the
            # (value, lane) lexicographic order the merge needs, so each
            # extraction pass runs ~6 VMEM sweeps instead of ~10 (the merge
            # is bandwidth-bound — measured, not sync-bound). Selection
            # granularity is 1024 f32 ULPs (~6e-5 relative, far below both
            # sensor noise and the reference's |q|²+|s|²−2qs cancellation
            # error); reported distances stay exact f32 via per-winner
            # recovery, and the stop test uses the truncated LOWER bound,
            # so no candidate that could still enter any top-k is missed.
            tile_key_ref[:] = (
                pltpu.bitcast(d2, jnp.int32) & lkeep
            ) | lane_ts

            # The extraction merge runs over MC-lane sub-chunks of the tile
            # (mc == ts degenerates to one chunk): each pass's VMEM sweep
            # shrinks ts/mc-fold while the pass count stays ~constant (one
            # extracted winner per pass either way), so the bandwidth-bound
            # merge gets cheaper on winner-dense tiles; sparse tiles pay
            # n_sub minimum passes of (QB, MC) — the same bytes as one
            # (QB, TS) pass. Keys carry the FULL-tile lane (10 bits), so
            # sub-chunk extraction recovers global positions unchanged, and
            # the per-sub-chunk stop test is the same truncated-lower-bound
            # argument as before (keys ascend within a sub-chunk).
            def extract_insert(off, key_prev):
                """Extract the next-smallest packed key of the sub-chunk at
                ``off`` + sorted insertion. Returns (key, accepted)."""
                km = tile_key_ref[:, pl.ds(off, mc)]
                ke = jnp.where(km > key_prev, km, jnp.int32(0x7FFFFFFF))
                kmin = jnp.min(ke, axis=1, keepdims=True)  # (QB, 1)
                pos = kmin & lmask
                # exact f32 distance of the selected winner (keys are unique
                # per lane, so the equality match is the winner lane alone;
                # an exhausted row matches every excluded lane -> guard it)
                m = jnp.min(
                    jnp.where(
                        ke == kmin, tile_d2_ref[:, pl.ds(off, mc)], jnp.inf
                    ),
                    axis=1,
                    keepdims=True,
                )
                m = jnp.where(kmin == jnp.int32(0x7FFFFFFF), jnp.inf, m)
                # truncated lower bound: every later candidate's true
                # distance is >= this (keys ascend => truncations ascend)
                m_lb = pltpu.bitcast(kmin & lkeep, jnp.float32)
                m_lb = jnp.where(kmin == jnp.int32(0x7FFFFFFF), jnp.inf, m_lb)
                th = jnp.sum(
                    jnp.where(lane_kb == k - 1, best_d_ref[:], 0.0),
                    axis=1,
                    keepdims=True,
                )
                # sorted insertion; rows with m >= their k-th best insert
                # past lane k-1 (junk region) — a natural no-op
                best_d = best_d_ref[:]
                best_i = best_i_ref[:]
                ipos = jnp.min(
                    jnp.where(best_d > m, lane_kb, jnp.int32(_KB)),
                    axis=1,
                    keepdims=True,
                )
                shifted_d = jnp.concatenate([m, best_d], axis=1)[:, :_KB]
                shifted_i = jnp.concatenate(
                    [pos * 0, best_i], axis=1
                )[:, :_KB]
                sel = pos + t * ts
                keep = lane_kb < ipos
                put = lane_kb == ipos
                best_d_ref[:] = jnp.where(
                    keep, best_d, jnp.where(put, m, shifted_d)
                )
                best_i_ref[:] = jnp.where(
                    keep, best_i, jnp.where(put, sel, shifted_i)
                )
                return kmin, m_lb < th

            def ext_cond(c):
                j, go, _key = c
                # `go` is the exact stop (truncated-lower-bound test). The
                # j bound cannot cut extraction short: keys strictly
                # increase per pass, so after mc passes every lane of the
                # sub-chunk is exhausted and `go` is already false — but it
                # gives the loop a static trip bound. A cap near k would be
                # WRONG: candidates sharing a 1024-ULP truncation bucket
                # straddling a threshold can burn passes without inserting,
                # and a true winner may sort after them within the bucket.
                return go & (j < mc)

            n_sub = ts // mc

            def sub_scan(c, _):
                off = c * mc

                def run_merge():
                    def ext_body(carry):
                        j, _go, key_prev = carry
                        key1, acc1 = extract_insert(off, key_prev)
                        return j + 1, jnp.any(acc1), key1

                    lax.while_loop(
                        ext_cond,
                        ext_body,
                        (
                            jnp.int32(0),
                            jnp.bool_(True),
                            jnp.full((qb, 1), -1, jnp.int32),
                        ),
                    )

                if sbbox_ref is None:
                    run_merge()
                else:
                    # per-sub-chunk bbox pre-cull: skip the merge when no
                    # query's lower bound to this sub-chunk's box beats its
                    # CURRENT k-th best. Exact for the same reason as the
                    # tile-level cull — thresholds only tighten later, so a
                    # skipped sub-chunk stays skippable. Costs ~1 sweep of
                    # (QB, KB) + a few (1, n_sub_total) masked sums, vs the
                    # ≥4 (QB, MC) sweeps of a wasted first extraction pass.
                    s_idx = t * n_sub + c
                    lane_ns = lax.broadcasted_iota(
                        jnp.int32, (1, sbbox_ref.shape[2]), 1
                    )
                    sel_s = lane_ns == s_idx
                    lbq_s = jnp.zeros((qb, 1), jnp.float32)
                    for d, qc in enumerate((qx, qy, qz)):
                        # (1, 1) vector bounds — a full scalar reduction
                        # would cost a scalar-core sync per coordinate
                        lo = jnp.sum(
                            jnp.where(sel_s, sbbox_ref[0, d : d + 1, :], 0.0),
                            axis=1,
                            keepdims=True,
                        )
                        hi = jnp.sum(
                            jnp.where(
                                sel_s, sbbox_ref[0, 3 + d : 4 + d, :], 0.0
                            ),
                            axis=1,
                            keepdims=True,
                        )
                        delta = jnp.maximum(lo - qc, 0.0) + jnp.maximum(
                            qc - hi, 0.0
                        )
                        lbq_s = lbq_s + delta * delta
                    th_s = jnp.sum(
                        jnp.where(lane_kb == k - 1, best_d_ref[:], 0.0),
                        axis=1,
                        keepdims=True,
                    )
                    pl.when(jnp.any(lbq_s < th_s))(run_merge)
                return 0

            lax.fori_loop(0, n_sub, sub_scan, 0)

        theta_all = jnp.sum(
            jnp.where(lane_kb == k - 1, best_d_ref[:], 0.0),
            axis=1,
            keepdims=True,
        )
        return jnp.min(lbvec_ref[:]), jnp.max(theta_all)

    lax.while_loop(
        cond, body, (jnp.min(lbvec_ref[:]), jnp.float32(jnp.inf))
    )
    idx_ref[0] = best_i_ref[:]
    d2_ref[0] = best_d_ref[:]


def _argmin_kernel(
    q_ref,  # (1, QB, 3) queries (sorted order), VMEM
    s_ref,  # (1, 4, N_pad) support, coordinate-major, VMEM
    bbox_ref,  # (1, 8, n_tiles) per-tile [min xyz | max xyz | pad pad] rows
    idx_ref,  # out (1, QB, 128) int32 (lane 0 valid)
    d2_ref,  # out (1, QB, 128) f32 (lane 0 valid)
    *,
    ts: int,
    n_tiles: int,
):
    """Streaming exact 1-NN: the nearest tile (by box bound) seeds the
    running minimum, then a STATIC unrolled sweep over all tiles updates it,
    with each tile predicated out when no query's box lower bound beats its
    current best. No while loop, no per-tile scalar extraction — the only
    vector->scalar syncs are the one seed-tile argmin and the per-tile
    ``visit`` predicates, so the kernel is pure VPU streaming."""
    qb = q_ref.shape[1]
    q = q_ref[0]
    iota3 = lax.broadcasted_iota(jnp.int32, (qb, 3), 1)
    qx = _lane_select(q, iota3, 0)
    qy = _lane_select(q, iota3, 1)
    qz = _lane_select(q, iota3, 2)
    lane_ts = lax.broadcasted_iota(jnp.int32, (qb, ts), 1)
    lane_nt = lax.broadcasted_iota(jnp.int32, (1, n_tiles), 1)

    tlo = [bbox_ref[0, d : d + 1, :] for d in range(3)]
    thi = [bbox_ref[0, 3 + d : 4 + d, :] for d in range(3)]

    # nearest tile by box-to-box bound (centre-distance tie-break)
    lb = jnp.zeros((1, n_tiles), jnp.float32)
    cd2 = jnp.zeros((1, n_tiles), jnp.float32)
    for d, qc in enumerate((qx, qy, qz)):
        q_lo = jnp.min(qc)
        q_hi = jnp.max(qc)
        gap = jnp.maximum(tlo[d] - q_hi, 0.0) + jnp.maximum(
            q_lo - thi[d], 0.0
        )
        lb = lb + gap * gap
        cmid = (tlo[d] + thi[d]) * 0.5 - (q_lo + q_hi) * 0.5
        cd2 = cd2 + cmid * cmid
    ordv = lb + cd2 * 1e-6
    m_ord = jnp.min(ordv)
    t0 = jnp.min(jnp.where(ordv == m_ord, lane_nt, jnp.int32(n_tiles)))

    def tile_d2(t):
        sx = s_ref[0, 0:1, pl.ds(t * ts, ts)]
        sy = s_ref[0, 1:2, pl.ds(t * ts, ts)]
        sz = s_ref[0, 2:3, pl.ds(t * ts, ts)]
        return (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2

    big = jnp.int32(ts)
    d2 = tile_d2(t0)
    best_d = jnp.min(d2, axis=1, keepdims=True)
    best_i = (
        jnp.min(jnp.where(d2 == best_d, lane_ts, big), axis=1, keepdims=True)
        + t0 * ts
    )

    for t in range(n_tiles):
        lbq = jnp.zeros((qb, 1), jnp.float32)
        for d, qc in enumerate((qx, qy, qz)):
            lo = tlo[d][:, t : t + 1]  # (1, 1) static slice
            hi = thi[d][:, t : t + 1]
            delta = jnp.maximum(lo - qc, 0.0) + jnp.maximum(qc - hi, 0.0)
            lbq = lbq + delta * delta
        visit = jnp.any(lbq < best_d) & (t != t0)

        def merge(c, t=t):
            bd, bi = c
            d2 = tile_d2(t)
            m = jnp.min(d2, axis=1, keepdims=True)
            p = (
                jnp.min(
                    jnp.where(d2 == m, lane_ts, big), axis=1, keepdims=True
                )
                + t * ts
            )
            upd = m < bd
            return jnp.where(upd, m, bd), jnp.where(upd, p, bi)

        best_d, best_i = lax.cond(visit, merge, lambda c: c, (best_d, best_i))

    idx_ref[0] = jnp.broadcast_to(best_i, (qb, _KB))
    d2_ref[0] = jnp.broadcast_to(best_d, (qb, _KB))


def _tile_prep(support: jax.Array, ts: int):
    """Per-tile bbox rows (B, 8, n_tiles) [min xyz | max xyz | pad] and the
    coordinate-major support (B, 4, N_pad) — the coord dim is padded 3 -> 4
    so DMA slices stay sublane-tile aligned (mosaic requires dim -2 slices
    aligned to 4). Shared by both pallas kernels."""
    B, n_pad, _ = support.shape
    n_tiles = n_pad // ts
    tiles = support.reshape(B, n_tiles, ts, 3)
    bbox = jnp.concatenate(
        [
            jnp.swapaxes(jnp.min(tiles, axis=2), 1, 2),
            jnp.swapaxes(jnp.max(tiles, axis=2), 1, 2),
            jnp.zeros((B, 2, n_tiles), support.dtype),
        ],
        axis=1,
    )
    support_t = jnp.swapaxes(support, 1, 2)
    support_t = jnp.concatenate(
        [support_t, jnp.zeros((B, 1, n_pad), support_t.dtype)], axis=1
    )
    return bbox, support_t, n_tiles


def _argmin_pallas_sorted(
    support: jax.Array, query: jax.Array, qb: int, ts: int, interpret: bool
) -> Tuple[jax.Array, jax.Array]:
    """1-NN on Morton-sorted inputs (shapes padded as in _knn_pallas_sorted)."""
    B, n_pad, _ = support.shape
    m_pad = query.shape[1]
    bbox, support_t, n_tiles = _tile_prep(support, ts)

    idx, d2 = pl.pallas_call(
        functools.partial(_argmin_kernel, ts=ts, n_tiles=n_tiles),
        grid=(B, m_pad // qb),
        in_specs=[
            pl.BlockSpec(
                (1, qb, 3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 4, n_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, n_tiles),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, qb, _KB), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, qb, _KB), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, m_pad, _KB), jnp.int32),
            jax.ShapeDtypeStruct((B, m_pad, _KB), jnp.float32),
        ],
        interpret=interpret,
    )(query, support_t, bbox)
    return idx[..., :1], jnp.maximum(d2[..., :1], 0.0)


# the argmin kernel maps the whole support block into VMEM: beyond this
# size, run it per support chunk and combine the running minima (exact)
_ARGMIN_MAX_SUPPORT = 65536


def argmin_pallas(
    support: jax.Array,
    query: jax.Array,
    query_block: int = 512,
    support_tile: int = 1024,
    interpret: bool = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact 1-NN via the streaming argmin kernel — the decoder-upsampling
    hot path (every fine point copies its nearest coarse point's features,
    reference modules.py:343-364). Same contract as ops/knn.py functions
    with k=1: (indices int32 (B, M, 1), squared distances f32 (B, M, 1)).

    Support clouds beyond ``_ARGMIN_MAX_SUPPORT`` points (the kernel keeps
    the whole support resident in VMEM) are processed in chunks whose
    per-chunk minima are combined (handled by
    :func:`argmin_pallas_presorted`; chunks of a Morton-sorted cloud stay
    Morton-sorted) — still exact."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, m = support.shape[1], query.shape[1]
    ts = min(support_tile, _round_up(n, 128))
    qb = min(query_block, _round_up(m, 8))

    s_sorted, q_sorted, s_order, q_order = _morton_prepare(
        support, query, qb, ts
    )
    idx_sorted, d2_sorted = argmin_pallas_presorted(
        s_sorted, q_sorted, query_block, support_tile, interpret
    )
    return _unsort_results(idx_sorted, d2_sorted, s_order, q_order, m)


# support arrays larger than this stay in HBM with on-demand tile DMA
_VMEM_SUPPORT_LIMIT_BYTES = 4 * 1024 * 1024

# default extraction-merge sub-chunk width (lanes); see _knn_kernel
_MERGE_CHUNK = 1024


def _knn_pallas_sorted(
    support: jax.Array,
    query: jax.Array,
    k: int,
    qb: int,
    ts: int,
    interpret: bool,
    mc: int = None,
) -> Tuple[jax.Array, jax.Array]:
    """KNN on Morton-sorted inputs; returns indices into the sorted support.
    support (B, N_pad, 3) with N_pad % ts == 0; query (B, M_pad, 3) with
    M_pad % qb == 0. ``mc`` is the extraction-merge sub-chunk width
    (default ``_MERGE_CHUNK``, clamped to ts; must divide ts)."""
    assert ts <= 2048, (
        f"support tile {ts} > 2048: the packed merge keys' lane field "
        "(11 bits at ts=2048) would degrade the distance truncation "
        "beyond what we have validated"
    )
    if mc is None:
        mc = _MERGE_CHUNK
    mc = min(mc, ts)
    mc = max(128, mc - mc % 128)  # lane-width multiple (or the loop below
    # never lands on a divisor and spins forever for e.g. mc=1000, ts=1024)
    while ts % mc:  # largest 128-multiple divisor of ts not above mc
        mc -= 128   # (ts is always a 128-multiple, so mc=128 terminates)
    assert ts % mc == 0 and mc % 128 == 0, (
        f"merge chunk {mc} must be a multiple of 128 dividing ts={ts}"
    )
    B, n_pad, _ = support.shape
    m_pad = query.shape[1]
    bbox, support_t, n_tiles = _tile_prep(support, ts)
    sub_cull = mc < ts
    if sub_cull:
        # per-merge-sub-chunk bboxes for the in-merge pre-cull
        subs = support.reshape(B, n_pad // mc, mc, 3)
        sbbox = jnp.concatenate(
            [
                jnp.swapaxes(jnp.min(subs, axis=2), 1, 2),
                jnp.swapaxes(jnp.max(subs, axis=2), 1, 2),
                jnp.zeros((B, 2, n_pad // mc), support.dtype),
            ],
            axis=1,
        )

    grid = (B, m_pad // qb)
    hbm = n_pad * 3 * 4 > _VMEM_SUPPORT_LIMIT_BYTES and not interpret
    common_scratch = [
        pltpu.VMEM((qb, _KB), jnp.float32),  # best_d
        pltpu.VMEM((qb, _KB), jnp.int32),  # best_i
        pltpu.VMEM((qb, ts), jnp.float32),  # tile_d2
        pltpu.VMEM((qb, ts), jnp.int32),  # tile_key
        pltpu.VMEM((1, n_tiles), jnp.float32),  # lbvec
    ]
    if hbm:
        support_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = common_scratch + [
            pltpu.VMEM((4, ts), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        support_spec = pl.BlockSpec(
            (1, 4, n_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = common_scratch

    def kernel(*refs):
        if not sub_cull:
            refs = refs[:3] + (None,) + refs[3:]  # no sbbox_ref
        if not hbm:
            refs = refs + (None, None)  # no s_tile_ref / dma_sem
        _knn_kernel(*refs, k=k, ts=ts, n_tiles=n_tiles, hbm=hbm, mc=mc)

    in_specs = [
        pl.BlockSpec(
            (1, qb, 3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        support_spec,
        pl.BlockSpec(
            (1, 8, n_tiles),
            lambda b, i: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [query, support_t, bbox]
    if sub_cull:
        in_specs.append(
            pl.BlockSpec(
                (1, 8, n_pad // mc),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(sbbox)

    idx, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, qb, _KB), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, qb, _KB), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, m_pad, _KB), jnp.int32),
            jax.ShapeDtypeStruct((B, m_pad, _KB), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    return idx[..., :k], jnp.maximum(d2[..., :k], 0.0)


def morton_order(xyz: jax.Array) -> jax.Array:
    """(B, N, 3) -> (B, N) Morton sort order (the spatial ordering both
    pallas kernels want their inputs in)."""
    return jnp.argsort(morton_codes(xyz), axis=1)


def _pad_blocks(s_sorted, q_sorted, qb, ts):
    """Pad a sorted support to a tile multiple with far-away sentinels and a
    sorted query to a block multiple by REPLICATING the last real query
    (zero-padding would inflate the final block's bounding box toward the
    origin and defeat tile culling for that block)."""
    B = s_sorted.shape[0]
    n, m = s_sorted.shape[1], q_sorted.shape[1]
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
            [
                q_sorted,
                jnp.broadcast_to(
                    q_sorted[:, -1:], (B, m_pad - m, 3)
                ),
            ],
            axis=1,
        )
    return s_sorted, q_sorted


def _morton_prepare(support, query, qb, ts):
    """Shared sort/pad preparation for the pallas KNN kernels.
    Returns (s_sorted, q_sorted, s_order, q_order), padded as per
    :func:`_pad_blocks`."""
    s_order = morton_order(support)  # (B, N)
    s_sorted = jnp.take_along_axis(support, s_order[..., None], axis=1)
    if support is query:  # self-KNN shares the sort
        q_order, q_sorted = s_order, s_sorted
    else:
        q_order = morton_order(query)
        q_sorted = jnp.take_along_axis(query, q_order[..., None], axis=1)
    s_sorted, q_sorted = _pad_blocks(s_sorted, q_sorted, qb, ts)
    return s_sorted, q_sorted, s_order, q_order


def _unsort_results(idx_sorted, d2_sorted, s_order, q_order, m):
    """Map sorted-support indices back to original ids and un-sort the
    query dimension (shared tail of the pallas KNN wrappers)."""
    idx_sorted = idx_sorted[:, :m]
    d2_sorted = d2_sorted[:, :m]
    idx_orig = jax.vmap(lambda order, idx: order[idx])(s_order, idx_sorted)
    inv_q = invert_permutation(q_order)
    idx_out = jnp.take_along_axis(idx_orig, inv_q[..., None], axis=1)
    d2_out = jnp.take_along_axis(d2_sorted, inv_q[..., None], axis=1)
    return idx_out, d2_out


def knn_pallas(
    support: jax.Array,
    query: jax.Array,
    k: int,
    query_block: int = None,
    support_tile: int = None,
    interpret: bool = None,
    merge_chunk: int = None,
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
    qb, ts = _presorted_blocks(n, m, query_block, support_tile)

    s_sorted, q_sorted, s_order, q_order = _morton_prepare(
        support, query, qb, ts
    )
    idx_sorted, d2_sorted = _knn_pallas_sorted(
        s_sorted, q_sorted, k, qb, ts, interpret, merge_chunk
    )
    return _unsort_results(idx_sorted, d2_sorted, s_order, q_order, m)


def _presorted_blocks(n: int, m: int, query_block, support_tile):
    # qb=128 × ts=1024 wins the v5e sweep at EVERY size tried (4k, 16k,
    # 64k — benchmarks/sweep_blocks.py): bigger query blocks span a wider
    # Morton range, so their per-block thresholds stay loose and the
    # extraction merge runs longer (4k: 2.3 ms at qb=256/ts=512 vs
    # 1.04 ms at qb=128/ts=1024); smaller ones duplicate tile visits.
    if support_tile is None:
        support_tile = 1024
    if query_block is None:
        query_block = 128
    ts = min(support_tile, _round_up(n, 128))
    qb = min(query_block, _round_up(m, 8))
    return qb, ts


def knn_pallas_presorted(
    support: jax.Array,
    query: jax.Array,
    k: int,
    query_block: int = None,
    support_tile: int = None,
    interpret: bool = None,
    merge_chunk: int = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact KNN on inputs the caller has ALREADY Morton-sorted (via
    :func:`morton_order`): indices are into the GIVEN support order and rows
    stay in the GIVEN query order. Skips the index remap + unsort of
    :func:`knn_pallas` — the remap alone (``order[idx]``, an M·k-element
    scalar gather) costs ~14 ms at 64k×32, so callers that can stay in the
    sorted domain (the LFA blocks, models/randlanet.py) should.

    Exactness does not depend on the ordering — tile bounds are true bounds
    for any layout — only culling efficiency does."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, m = support.shape[1], query.shape[1]
    assert k <= n, f"k={k} exceeds support size {n}"
    assert k <= _KB, f"k={k} > {_KB} not supported by the pallas kernel"
    qb, ts = _presorted_blocks(n, m, query_block, support_tile)
    s_pad, q_pad = _pad_blocks(support, query, qb, ts)
    idx, d2 = _knn_pallas_sorted(
        s_pad, q_pad, k, qb, ts, interpret, merge_chunk
    )
    return idx[:, :m], d2[:, :m]


def argmin_pallas_presorted(
    support: jax.Array,
    query: jax.Array,
    query_block: int = 512,
    support_tile: int = 1024,
    interpret: bool = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact 1-NN on pre-Morton-sorted inputs (see
    :func:`knn_pallas_presorted` for the contract)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, m = support.shape[1], query.shape[1]

    if n > _ARGMIN_MAX_SUPPORT:
        best_d = best_i = None
        for lo in range(0, n, _ARGMIN_MAX_SUPPORT):
            chunk = support[:, lo : lo + _ARGMIN_MAX_SUPPORT]
            ci, cd = argmin_pallas_presorted(
                chunk, query, query_block, support_tile, interpret
            )
            ci = ci + lo
            if best_d is None:
                best_d, best_i = cd, ci
            else:
                take = cd < best_d
                best_d = jnp.where(take, cd, best_d)
                best_i = jnp.where(take, ci, best_i)
        return best_i, best_d

    ts = min(support_tile, _round_up(n, 128))
    qb = min(query_block, _round_up(m, 8))
    s_pad, q_pad = _pad_blocks(support, query, qb, ts)
    idx, d2 = _argmin_pallas_sorted(s_pad, q_pad, qb, ts, interpret)
    return idx[:, :m], jnp.maximum(d2[:, :m], 0.0)
