"""K-nearest-neighbour search — the framework's hottest op.

The reference runs 5+ KNN searches per forward pass (4 LFA self-KNNs + the
decoder 1-NN upsamplings, ``/root/reference/randlanet/utils/modules.py:298-325``
and ``:543-611``) and routes them to either a GPU matmul+topk
(``knn.py:7-55``), a CPU FAISS IVF index (``knn.py:58-117``) or a dormant C++
KD-tree. On TPU we keep everything device-resident:

- :func:`knn_naive`        — full pairwise-distance matmul + ``lax.top_k``;
                             best for N below ~20k (mirrors the reference's
                             regime guidance, model.py:160-184).
- :func:`knn_tiled`        — ``lax.scan`` over support tiles with a running
                             top-k; bounded memory for large N, the
                             non-Pallas large-N path.
- :func:`knn_approximate`  — TPU-accelerated ``jax.lax.approx_min_k`` over
                             query blocks; replaces the reference's per-layer
                             CPU FAISS round-trip with an on-chip kernel.
- ``knn_pallas``           — fused Pallas distance+top-k kernel
                             (ops/knn_pallas.py) that never materialises the
                             distance matrix.
- ``knn_kdtree``           — our own C++ exact KD-tree via host callback
                             (ops/knn_cpp.py), the working equivalent of the
                             reference's dormant ``knn_tpk`` extension.

All functions share one contract::

    indices (B, M, k) int32, squared_distances (B, M, k) float32
      = knn_fn(support (B, N, 3), query (B, M, 3), k)

matching the reference's ``(neighbors, distances_sq)`` return
(knn.py:7-24). Squared distances are clamped to >= 0 (knn.py:54).
"""

import functools
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# TPU row gathers pay per ROW and stay at the hardware rate while the
# gathered table fits the fast regime; past ~128k table rows the per-row
# cost grows ~linearly with table size (DRAM page locality — measured in
# benchmarks/RESULTS.md "Batched row gathers"). Shared by gather_neighbors,
# models/randlanet._sort_rows and the facade's per-cloud batched forward.
FAST_GATHER_MAX_ROWS = 131072



def _pairwise_sq_dists(query: jax.Array, support: jax.Array) -> jax.Array:
    """(B, M, N) squared L2 distances via ||q||² + ||s||² − 2 q·sᵀ.

    The expansion runs the O(M·N) work as one batched matmul on the MXU
    (same identity as the reference's knn.py:46-50)."""
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)  # (B, M, 1)
    s2 = jnp.sum(support * support, axis=-1, keepdims=True)  # (B, N, 1)
    qs = lax.dot_general(
        query,
        support,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        # TPU matmuls default to bf16 inputs; that corrupts nearest-neighbour
        # distances (~1e-3 abs error) — neighbour selection needs full f32
        precision=lax.Precision.HIGHEST,
    )  # (B, M, N)
    return q2 + jnp.swapaxes(s2, -1, -2) - 2.0 * qs


def knn_naive(
    support: jax.Array, query: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Exact KNN with the full distance matrix materialised.

    Fine for M·N up to a few hundred million on one chip; use
    :func:`knn_tiled` / ``knn_pallas`` beyond that.
    """
    if k == 1:
        return knn_argmin(support, query)
    d2 = _pairwise_sq_dists(query, support)
    neg_top, idx = lax.top_k(-d2, k)  # smallest distances
    return idx.astype(jnp.int32), jnp.maximum(-neg_top, 0.0)


def knn_argmin(
    support: jax.Array,
    query: jax.Array,
    support_tile: int = 4096,
    query_block: int = 65536,
) -> Tuple[jax.Array, jax.Array]:
    """Exact 1-NN as a streaming min/argmin — the decoder-upsampling hot
    path (every fine point copies its nearest coarse point's features,
    modules.py:343-364). No top-k machinery: a scan over support tiles with
    a running (min, argmin) carry, purely bandwidth-bound.

    Queries beyond ``query_block`` are processed in blocks (``lax.map``)
    so the per-step (M, tile) distance matrix stays bounded — at 1M
    queries an unblocked step would materialise a 16 GB temp.
    """
    B, N, _ = support.shape
    M = query.shape[1]
    if M > query_block:
        n_blocks = -(-M // query_block)
        pad = n_blocks * query_block - M
        q = query
        if pad:
            q = jnp.concatenate(
                [q, jnp.broadcast_to(q[:, -1:], (B, pad, 3))], axis=1
            )
        blocks = jnp.moveaxis(
            q.reshape(B, n_blocks, query_block, 3), 1, 0
        )
        idx_b, d2_b = lax.map(
            lambda qb: knn_argmin(support, qb, support_tile), blocks
        )
        idx = jnp.moveaxis(idx_b, 0, 1).reshape(B, n_blocks * query_block, 1)
        d2 = jnp.moveaxis(d2_b, 0, 1).reshape(B, n_blocks * query_block, 1)
        return idx[:, :M], d2[:, :M]
    n_tiles = -(-N // support_tile)
    pad = n_tiles * support_tile - N
    if pad:
        far = jnp.full((B, pad, 3), 1e9, dtype=support.dtype)
        support = jnp.concatenate([support, far], axis=1)
    tiles = jnp.moveaxis(
        support.reshape(B, n_tiles, support_tile, 3), 1, 0
    )

    def step(carry, inputs):
        best_d, best_i = carry  # (B, M)
        tile, t = inputs
        d2 = _pairwise_sq_dists(query, tile)  # (B, M, T)
        tile_min = jnp.min(d2, axis=-1)
        tile_arg = jnp.argmin(d2, axis=-1).astype(jnp.int32) + t * support_tile
        take = tile_min < best_d
        return (
            jnp.where(take, tile_min, best_d),
            jnp.where(take, tile_arg, best_i),
        ), None

    # The init must inherit the query's varying-axes type so the scan
    # carry typechecks when this runs inside a shard_map body (the ring
    # KNN k=1 path): derive a (B, M) zero FROM query (0.0 even for NaN).
    q0 = query[..., 0]
    zero = jnp.where(q0 == q0, 0.0, 0.0).astype(jnp.float32)
    init = (zero + jnp.inf, zero.astype(jnp.int32))
    (best_d, best_i), _ = lax.scan(
        step, init, (tiles, jnp.arange(n_tiles, dtype=jnp.int32))
    )
    return best_i[..., None], jnp.maximum(best_d, 0.0)[..., None]


def knn_tiled(
    support: jax.Array,
    query: jax.Array,
    k: int,
    support_tile: int = 4096,
    query_block: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact KNN with bounded memory: scan over support tiles keeping a
    running top-k, optionally mapped over query blocks.

    Peak live memory is O(query_block · (support_tile + k)) instead of
    O(M · N) — the TPU analogue of the reference's query partitioning
    (knn.py:26-43), but partitioned over the *support* so arbitrarily large
    point clouds stream through VMEM-sized tiles.
    """
    B, N, _ = support.shape
    M = query.shape[1]
    if N <= support_tile:
        return knn_naive(support, query, k)

    n_tiles = -(-N // support_tile)
    pad = n_tiles * support_tile - N
    if pad:
        # pad with far-away points; k <= N guarantees they never win
        far = jnp.full((B, pad, 3), 1e9, dtype=support.dtype)
        support = jnp.concatenate([support, far], axis=1)
    support_tiles = support.reshape(B, n_tiles, support_tile, 3)

    def run_block(query_blk: jax.Array) -> Tuple[jax.Array, jax.Array]:
        m = query_blk.shape[1]

        def step(carry, inputs):
            best_d, best_i = carry  # (B, m, k)
            tile, tile_idx = inputs  # (B, support_tile, 3), scalar
            d2 = _pairwise_sq_dists(query_blk, tile)  # (B, m, T)
            idx = tile_idx * support_tile + jnp.arange(support_tile, dtype=jnp.int32)
            idx = jnp.broadcast_to(idx, (B, m, support_tile))
            cand_d = jnp.concatenate([best_d, d2], axis=-1)
            cand_i = jnp.concatenate([best_i, idx], axis=-1)
            neg_top, sel = lax.top_k(-cand_d, k)
            new_d = -neg_top
            new_i = jnp.take_along_axis(cand_i, sel, axis=-1)
            return (new_d, new_i), None

        init = (
            jnp.full((B, m, k), jnp.inf, dtype=jnp.float32),
            jnp.zeros((B, m, k), dtype=jnp.int32),
        )
        tiles = jnp.moveaxis(support_tiles, 1, 0)  # (n_tiles, B, T, 3)
        (best_d, best_i), _ = lax.scan(
            step, init, (tiles, jnp.arange(n_tiles, dtype=jnp.int32))
        )
        return best_i, jnp.maximum(best_d, 0.0)

    if query_block is None or M <= query_block:
        return run_block(query)

    nq = -(-M // query_block)
    qpad = nq * query_block - M
    if qpad:
        query = jnp.concatenate(
            [query, jnp.zeros((B, qpad, 3), dtype=query.dtype)], axis=1
        )
    blocks = query.reshape(B, nq, query_block, 3)
    idx, d2 = lax.map(run_block, jnp.moveaxis(blocks, 1, 0))
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, nq * query_block, k)[:, :M]
    d2 = jnp.moveaxis(d2, 0, 1).reshape(B, nq * query_block, k)[:, :M]
    return idx, d2


def knn_approximate(
    support: jax.Array,
    query: jax.Array,
    k: int,
    recall_target: float = 0.95,
    query_block: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate KNN via XLA's TPU-accelerated ``approx_min_k``.

    This is the device-resident replacement for the reference's CPU FAISS
    IVF search (knn.py:58-117): instead of shipping coordinates to the host,
    building an IVF index and copying results back each layer
    (modules.py:139-144), the TPU's hardware-assisted partial-reduction
    top-k runs directly on the distance tiles.
    """
    B, N, _ = support.shape
    M = query.shape[1]

    def run_block(query_blk):
        d2 = _pairwise_sq_dists(query_blk, support)
        vals, idx = lax.approx_min_k(d2, k, recall_target=recall_target)
        return idx.astype(jnp.int32), jnp.maximum(vals, 0.0)

    if M <= query_block:
        return run_block(query)
    nq = -(-M // query_block)
    qpad = nq * query_block - M
    if qpad:
        query = jnp.concatenate(
            [query, jnp.zeros((B, qpad, 3), dtype=query.dtype)], axis=1
        )
    blocks = jnp.moveaxis(query.reshape(B, nq, query_block, 3), 1, 0)
    idx, d2 = lax.map(run_block, blocks)
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, nq * query_block, k)[:, :M]
    d2 = jnp.moveaxis(d2, 0, 1).reshape(B, nq * query_block, k)[:, :M]
    return idx, d2


def knn_window(
    support: jax.Array,
    query: jax.Array,
    k: int,
    window_points: int = 4096,
    query_block: int = 512,
    block_group: int = 16,
    recall_target: float = 0.9,
    presorted: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Morton-window approximate KNN — the TPU-native analogue of the
    reference's FAISS IVF-Flat search (knn.py:58-117: cluster the support,
    probe the nprobe=2 nearest cells). Here the "cells" are windows of the
    Morton space-filling curve: both clouds are Morton-sorted, each block of
    ``query_block`` sorted queries searches only the ``window_points``
    support points around its own relative position on the curve, and
    ``lax.approx_min_k`` (the TPU's hardware-assisted partial reduction)
    selects the k nearest candidates.

    Work and memory are O(M · window_points) instead of the O(M · N) of
    :func:`knn_approximate` — at 1M points that is a ~256× smaller search,
    the same locality trade FAISS IVF makes (nprobe=2 probes ~800 of 1M
    points; a 4096-point Morton window considers 5× more).

    With ``presorted=True`` both inputs must already be Morton-sorted
    (``ops/knn_pallas.morton_order``); indices are then into the given
    support order and rows stay in the given query order.

    ``recall_target`` default dropped 0.95 → 0.9 in r4: ``approx_min_k``'s
    internal reduction at target 0.95 cost 16.8 ms at the 64k L0 shape vs
    6.0 ms at 0.9 (RESULTS.md "window-KNN selection sweep"), while the
    ACHIEVED recall on the reference's real captures is unchanged (0.9602
    vs 0.961 — benchmarks/real_cloud_validation.json; the target is a
    conservative bound on the in-window recall, and the end metric —
    prediction IoU vs exact, 0.9829 — gates it)."""
    import numpy as np

    from recognizer3d_tpu.ops.knn_pallas import (
        _unsort_results,
        morton_order,
    )

    B, n, _ = support.shape
    m = query.shape[1]
    if n <= window_points:
        # window covers everything -> plain approx_min_k over all support
        return knn_approximate(support, query, k, recall_target)

    if presorted:
        s_sorted, q_sorted = support, query
    else:
        s_order = morton_order(support)
        s_sorted = jnp.take_along_axis(support, s_order[..., None], axis=1)
        if support is query:
            q_order, q_sorted = s_order, s_sorted
        else:
            q_order = morton_order(query)
            q_sorted = jnp.take_along_axis(query, q_order[..., None], axis=1)

    qb = query_block
    n_blocks = -(-m // qb)
    m_pad = n_blocks * qb
    if m_pad != m:
        q_sorted = jnp.concatenate(
            [q_sorted, jnp.broadcast_to(q_sorted[:, -1:], (B, m_pad - m, 3))],
            axis=1,
        )
    w = min(window_points, n)
    # static per-block window starts: the block's centre position on the
    # query curve, mapped proportionally onto the support curve. Clamp to
    # the REAL query range first: the final block is padded with copies of
    # the last query, and for m << query_block the unclamped padded centre
    # would overshoot the end of the support curve and search a window far
    # from the true neighbourhood.
    centers = np.minimum((np.arange(n_blocks) + 0.5) * qb, m - 0.5) * (n / m)
    starts = np.clip(np.round(centers - w / 2), 0, n - w).astype(np.int32)
    starts_j = jnp.asarray(starts)

    blocks = q_sorted.reshape(B, n_blocks, qb, 3)

    def batch_run(s_b, blocks_b):
        def group_run(args):
            qblk, start = args  # (G, qb, 3), (G,)
            win = jax.vmap(
                lambda st: lax.dynamic_slice(s_b, (st, 0), (w, 3))
            )(start)  # (G, w, 3)
            d2 = _pairwise_sq_dists(qblk, win)  # (G, qb, w)
            vals, idx = lax.approx_min_k(d2, k, recall_target=recall_target)
            return idx.astype(jnp.int32) + start[:, None, None], jnp.maximum(
                vals, 0.0
            )

        g = min(block_group, n_blocks)
        n_groups = -(-n_blocks // g)
        pad_blocks = n_groups * g - n_blocks
        qblks = blocks_b
        sts = starts_j
        if pad_blocks:
            qblks = jnp.concatenate(
                [qblks, jnp.broadcast_to(qblks[-1:], (pad_blocks, qb, 3))], 0
            )
            sts = jnp.concatenate(
                [sts, jnp.broadcast_to(sts[-1:], (pad_blocks,))], 0
            )
        # NOTE (r5 small-op-tail pass): statically unrolling this lax.map
        # (8 groups at 64k) to drop the scan's carry copies + output
        # dynamic-update-slices (~0.7 ms/iter in the r5 trace) was priced
        # on hardware at NO gain (37.0 vs 36.3-37.0 ms forward, within
        # run noise) while perturbing the d2 cancellation noise — the
        # loop plumbing already overlaps with the group bodies. Kept the
        # scan (RESULTS.md "small-op tail closure").
        idx, d2 = lax.map(
            group_run,
            (
                qblks.reshape(n_groups, g, qb, 3),
                sts.reshape(n_groups, g),
            ),
        )
        return (
            idx.reshape(n_groups * g * qb, k)[: m_pad],
            d2.reshape(n_groups * g * qb, k)[: m_pad],
        )

    idx, d2 = jax.vmap(batch_run)(s_sorted, blocks)
    idx, d2 = idx[:, :m], d2[:, :m]
    if presorted:
        return idx, d2
    return _unsort_results(idx, d2, s_order, q_order, m)


# regime threshold mirroring the reference's guidance (model.py:160-184)
_NAIVE_MAX_MN = 64_000_000  # M*N elements of the full distance matrix

# above this support size, "approximate" switches from full-distance
# approx_min_k to the Morton-window search (the FAISS-IVF analogue).
# Priced at the in-model decimation sizes (benchmarks/
# ablate_approx_routing.py, v5e): at 16,384² self-KNN the window is
# 1.25 ms vs approx_min_k's 3.54 with 0.979 mean recall on the
# reference's real L515 captures (BETTER than the 0.961 the 64k level
# ships at — the 4096-pt window covers 25% of a 16k cloud vs 6% of 64k);
# at 4,096² both are <0.1 ms, so the threshold sits between the two.
_WINDOW_MIN_SUPPORT = 12_288

#: queries re-searched exactly per approximate call when runtime recall
#: telemetry is on (RECOGNIZER3D_KNN_RECALL=1)
_RECALL_SAMPLES = 256


def _recall_telemetry_enabled() -> bool:
    return os.environ.get("RECOGNIZER3D_KNN_RECALL", "") not in ("", "0")


def sampled_recall(support, query, k, result):
    """Traced recall@k of an (idx, d2) KNN result vs an exact re-search of
    ``min(_RECALL_SAMPLES, M)`` evenly spaced queries (touching every query
    block / Morton window). Distance-rank based — a returned neighbour
    counts as a hit when its distance ranks within the exact top-k — so
    it is robust to equidistant-tie index permutations. Shared by the
    runtime telemetry below, ``measure_recall`` (bench.py's
    ``knn_window_recall_64k``), and the ``Model.evaluate`` sampled check."""
    _, d2 = result
    m = query.shape[1]
    s = min(_RECALL_SAMPLES, m)
    pos = jnp.linspace(0, m - 1, s).astype(jnp.int32)
    q_sub = jnp.take(query, pos, axis=1)
    if support.shape[1] * s > _NAIVE_MAX_MN:
        _, exact_d2 = knn_tiled(support, q_sub, k)
    else:
        _, exact_d2 = knn_naive(support, q_sub, k)
    approx_d2 = jnp.take(d2, pos, axis=1)
    kth = exact_d2[..., k - 1 : k]
    hits = approx_d2 <= kth * (1.0 + 1e-5) + 1e-12
    return jnp.mean(hits.astype(jnp.float32))


def measure_recall(
    support: jax.Array, query: jax.Array, k: int, approach: str = "approximate"
) -> float:
    """Run ``knn(approach)`` and return its measured sampled recall@k as a
    Python float — the offline/bench entry point for the recall telemetry
    (VERDICT r3 #6: every BENCH_r*.json carries a measured recall)."""
    result = knn(support, query, k, approach)
    return float(sampled_recall(support, query, k, result))


def _with_recall_telemetry(support, query, k, result, tag):
    """Opt-in runtime honesty check for the approximate default
    (RECOGNIZER3D_KNN_RECALL=1 — VERDICT r2 #5): re-search an evenly spaced
    sample of queries EXACTLY inside the same program and log recall@k of
    the approximate result through a host callback, so recall on an
    unfamiliar capture distribution is visible at runtime, not only in the
    offline validation (benchmarks/validate_real_clouds.py).

    Cost when on: one extra O(S·N) exact search per approximate call
    (S=256) plus a host callback per dispatch. Zero cost when off (the env
    check happens at trace time)."""
    recall = sampled_recall(support, query, k, result)
    m = query.shape[1]
    s = min(_RECALL_SAMPLES, m)

    def _log(r):
        logging.getLogger("knn").warning(
            "approximate-KNN recall@%d [%s]: %.4f (%d/%d queries sampled)",
            k, tag, float(r), s, m,
        )

    jax.debug.callback(_log, recall)
    return result


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


# ---------------------------------------------------------------------------
# runtime recall guard (VERDICT r4 #1)
# ---------------------------------------------------------------------------
# The reference's FAISS path protects its accuracy with a fixed,
# conservative nprobe (/root/reference/randlanet/utils/knn.py:87-96 —
# nprobe=2 regardless of the data). Our faster Morton-window routing was
# tuned (recall_target 0.9, window 4096) against the reference's 15 real
# L515 captures; on out-of-distribution geometry (isotropic gaussian 64k)
# the same window measures ~0.877 sampled recall. This guard closes that
# gap AT RUNTIME: a one-off sampled-recall probe on the session's first
# window-regime cloud, widening the session window along _WINDOW_LADDER
# until the probe clears the target, and falling back to the EXACT pallas
# path if the widest rung still misses — so the reference-default
# knn="approximate" holds >= target effective recall on any distribution,
# while in-distribution sessions keep the tuned fast window untouched.
#
# The widened window / fallback is SESSION state read at trace time by the
# dispatchers below; Model's jitted programs key on session_epoch() and
# retrace when the guard acts (models/facade._GuardedJit), so programs
# traced before the probe cannot keep stale routing.

#: successive window sizes the guard may widen to. 4096 is the tuned
#: default (6% of a 64k cloud); 8192/16384 cost ~2×/~4× the window
#: search's share (priced in benchmarks/RESULTS.md "runtime recall
#: guard") and cover progressively heavier-tailed distributions.
_WINDOW_LADDER = (4096, 8192, 16384)

_GUARD_TARGET_DEFAULT = 0.9

_session_guard = {
    "window_points": _WINDOW_LADDER[0],
    "exact_fallback": False,
    "epoch": 0,
}


def session_epoch() -> int:
    """Monotonic counter bumped whenever the recall guard changes the
    session's approximate-KNN routing. Jitted callers that trace the
    routing (facade programs) must key their compiled-program cache on
    this value."""
    return _session_guard["epoch"]


def session_window_points() -> int:
    """The Morton-window size the approximate dispatch currently uses."""
    return _session_guard["window_points"]


def session_exact_fallback() -> bool:
    """True when the guard demoted ``knn="approximate"`` to the exact
    path for this session (the widest ladder rung still missed target)."""
    return _session_guard["exact_fallback"]


def reset_window_guard() -> None:
    """Restore the tuned default routing (tests / bench isolation)."""
    changed = (
        _session_guard["window_points"] != _WINDOW_LADDER[0]
        or _session_guard["exact_fallback"]
    )
    _session_guard["window_points"] = _WINDOW_LADDER[0]
    _session_guard["exact_fallback"] = False
    if changed:
        _session_guard["epoch"] += 1


def window_regime_active(n: int) -> bool:
    """True when a self-KNN over ``n`` points routes through the Morton
    window — the approximate path's only recall-lossy regime (below it,
    "approximate" runs full-distance ``approx_min_k`` or the exact
    argmin, both >= the tuning target by construction)."""
    return n > _WINDOW_MIN_SUPPORT and n * n > _NAIVE_MAX_MN


@functools.partial(jax.jit, static_argnums=(1, 2))
def _window_recall_probe(x, k: int, w: int):
    """One jitted program per (shape, k, w): window search + sampled exact
    re-search — a single dispatch per guard rung instead of an eager
    op-by-op chain (each eager op is a relay dispatch on remote-TPU
    setups)."""
    result = knn_window(x, x, k, window_points=w)
    return sampled_recall(x, x, k, result)


def ensure_window_recall(
    cloud,
    k: int,
    target: Optional[float] = None,
    ladder: Optional[Tuple[int, ...]] = None,
) -> dict:
    """Run the recall guard on one representative cloud (host-side, once
    per session — Model calls this from the first window-regime predict /
    evaluate). Measures the sampled self-KNN recall@k of the window search
    at each ladder rung from the current session window upward, installs
    the first rung that clears ``target`` as the session window, and
    engages the exact fallback when even the widest rung misses.

    :param cloud: (N, 3) or (B, N, 3) coordinates (xyz only).
    :param k: neighbours per point (the model's n_neighbors).
    :param target: required sampled recall@k; default 0.9 (the r4 tuning
        target), overridable via RECOGNIZER3D_RECALL_TARGET.
    :param ladder: override of _WINDOW_LADDER (tests).
    :return: dict with ``recall`` (the final measured value), ``window_points``,
        ``exact_fallback``, ``widened`` and ``active`` (False when the cloud
        is below the window regime — nothing to guard).
    """
    if target is None:
        target = float(
            os.environ.get("RECOGNIZER3D_RECALL_TARGET", _GUARD_TARGET_DEFAULT)
        )
    rungs = _WINDOW_LADDER if ladder is None else tuple(ladder)
    x = jnp.asarray(cloud, jnp.float32)
    if x.ndim == 2:
        x = x[None]
    x = x[..., :3]
    n = x.shape[1]
    if not window_regime_active(n):
        return {
            "active": False,
            "recall": 1.0,
            "window_points": _session_guard["window_points"],
            "exact_fallback": False,
            "widened": False,
        }
    start = _session_guard["window_points"]
    recall = 0.0
    chosen = None
    for w in rungs:
        if ladder is None and w < start:
            # converged sessions never re-probe below their installed
            # window (a later guard call starts from the widened rung);
            # explicit ladders (tests / experiments) probe as given
            continue
        # w >= n degenerates to full-coverage approx_min_k inside
        # knn_window — measured like any other rung (nothing wider left)
        recall = float(_window_recall_probe(x, k, w))
        if recall >= target:
            chosen = w
            break
        if w >= n:
            break
    widened = chosen is not None and chosen != start
    if chosen is None:
        if not _session_guard["exact_fallback"]:
            _session_guard["exact_fallback"] = True
            _session_guard["epoch"] += 1
        logging.getLogger("knn").warning(
            "approximate-KNN recall guard: sampled recall@%d is %.3f at the "
            "widest window (%d of %d points) — below the %.2f target for "
            "this capture distribution. Falling back to EXACT KNN for this "
            "session (slower, bit-accurate). Set RECOGNIZER3D_KNN_RECALL=0 "
            "to disable the guard.",
            k, recall, rungs[-1], n, target,
        )
    elif widened:
        _session_guard["window_points"] = chosen
        _session_guard["epoch"] += 1
        logging.getLogger("knn").warning(
            "approximate-KNN recall guard: widened the Morton window "
            "%d -> %d points for this session (sampled recall@%d %.3f >= "
            "%.2f target on this capture distribution).",
            start, chosen, k, recall, target,
        )
    return {
        "active": True,
        "recall": recall,
        "window_points": _session_guard["window_points"],
        "exact_fallback": _session_guard["exact_fallback"],
        "widened": widened,
    }


def knn(
    support: jax.Array,
    query: jax.Array,
    k: int,
    approach: str = "naive",
) -> Tuple[jax.Array, jax.Array]:
    """Dispatching KNN front-end (the TPU analogue of the reference's ``KNN``
    block, modules.py:107-150). Returns (indices int32, squared dists f32),
    both (B, M, k).

    "naive" keeps the reference's exact semantics; on TPU it routes to the
    fused Pallas kernel (ops/knn_pallas.py — same exact results, 13-24×
    faster than the XLA distance+top_k pipeline at 64k points, and more
    accurate: no |q|²+|s|²−2qs cancellation). The XLA matmul+top_k paths
    remain as the CPU implementation and as the test oracle.
    """
    if approach == "naive":
        if k == 1:
            if _on_tpu() and support.shape[1] <= 65536 and (
                support.shape[1] >= 2048 or query.shape[1] >= 16384
            ):
                # fused streaming 1-NN: support tiles stay in VMEM, the
                # (M, N) distance matrix never touches HBM. Measured faster
                # than the XLA scan at every support size up to 64k (2500
                # support -> 147k queries: 4.4 vs 5.3 ms; 16k -> 64k: ~2x);
                # beyond 64k the XLA path bounds memory by streaming HBM.
                from recognizer3d_tpu.ops.knn_pallas import argmin_pallas

                return argmin_pallas(support, query)
            if _on_tpu() and support.shape[1] > 65536:
                # big-support 1-NN: the Morton-pruned kernel's tile bounds
                # skip almost every visit — measured 341 ms vs 82 s brute
                # at 262k support × 1M queries (see knn_presorted below,
                # which this mirrors; here the kernel also pays its own
                # Morton sort + unsort)
                from recognizer3d_tpu.ops.knn_pallas import knn_pallas

                return knn_pallas(support, query, 1)
            # streaming argmin beats any top-k pipeline for 1-NN
            return knn_argmin(support, query)
        if _on_tpu() and k <= 128:
            from recognizer3d_tpu.ops.knn_pallas import knn_pallas

            return knn_pallas(support, query, k)
        mn = support.shape[1] * query.shape[1]
        if mn > _NAIVE_MAX_MN:
            # keep "naive" semantics (exact) but bound memory, instead of
            # OOMing like the reference warns it would (model.py:174-178)
            return knn_tiled(support, query, k)
        return knn_naive(support, query, k)
    elif approach == "approximate":
        if k == 1 and support.shape[1] <= 32768:
            # "approximate" permits an exact answer, and for 1-NN below
            # the window threshold's old regime the exact streaming-argmin
            # kernel strictly beats the (M, N) full-distance approx_min_k
            # this branch used to run (decoder-shaped 16k support × 64k
            # queries: 1.9 ms exact vs 9.3 ms approx_min_k —
            # benchmarks/ablate_approx_routing.py). Free accuracy. Past
            # 32k support the window k=1 (O(M·window), support-size-
            # independent) keeps winning — e.g. the 1M path's 262k×1M
            # upsample, where the exact pruned kernel costs 341 ms — so
            # fall through to the window exactly as before.
            return knn(support, query, 1, "naive")
        if (
            support.shape[1] > _WINDOW_MIN_SUPPORT
            and support.shape[1] * query.shape[1] > _NAIVE_MAX_MN
        ):
            # IVF-style locality search: O(M·window) instead of O(M·N).
            # Only worth the recall trade when the full distance matrix is
            # genuinely too big; for small query sets vs a big support the
            # O(M·N) approx_min_k is cheap AND near-exact (the window's
            # proportional query→support curve mapping assumes query
            # density ≈ support density, which breaks when M ≪ N).
            # Window size / exact demotion come from the session recall
            # guard (ensure_window_recall) — read at trace time.
            if session_exact_fallback():
                return knn(support, query, k, "naive")
            result = knn_window(
                support, query, k, window_points=session_window_points()
            )
            if _recall_telemetry_enabled():
                result = _with_recall_telemetry(
                    support, query, k, result,
                    f"window N={support.shape[1]} M={query.shape[1]}",
                )
            return result
        result = knn_approximate(support, query, k)
        if _recall_telemetry_enabled():
            result = _with_recall_telemetry(
                support, query, k, result,
                f"approx_min_k N={support.shape[1]} M={query.shape[1]}",
            )
        return result
    elif approach == "pallas":
        from recognizer3d_tpu.ops.knn_pallas import knn_pallas

        return knn_pallas(support, query, k)
    elif approach == "kdtree":
        from recognizer3d_tpu.ops.knn_cpp import knn_kdtree

        return knn_kdtree(support, query, k)
    else:
        raise ValueError(f"KNN approach {approach} not understood!")


def knn_presorted(
    support: jax.Array,
    query: jax.Array,
    k: int,
    approach: str = "naive",
) -> Tuple[jax.Array, jax.Array]:
    """:func:`knn` for callers that keep their point sets in Morton-sorted
    order (see ``ops/knn_pallas.morton_order``): returned indices are into
    the GIVEN support order and rows stay in the GIVEN query order, so the
    pallas paths skip their index remap + unsort (~14 ms at 64k×32). The
    XLA/native paths are order-agnostic and dispatch as in :func:`knn`."""
    if approach == "naive":
        if k == 1:
            if _on_tpu() and support.shape[1] <= 65536 and (
                support.shape[1] >= 2048 or query.shape[1] >= 16384
            ):
                from recognizer3d_tpu.ops.knn_pallas import (
                    argmin_pallas_presorted,
                )

                return argmin_pallas_presorted(support, query)
            if _on_tpu() and support.shape[1] > 65536:
                # past the streaming-argmin regime the Morton-pruned KNN
                # kernel at k=1 wins by orders of magnitude: the brute
                # scan is O(M·N) VPU work (262k support × 1M queries
                # measured 82 s) while the kernel's tile bounds prune
                # almost every visit (341 ms, exact — same d2)
                from recognizer3d_tpu.ops.knn_pallas import (
                    knn_pallas_presorted,
                )

                return knn_pallas_presorted(support, query, 1)
            return knn_argmin(support, query)
        if _on_tpu() and k <= 128:
            from recognizer3d_tpu.ops.knn_pallas import knn_pallas_presorted

            return knn_pallas_presorted(support, query, k)
        mn = support.shape[1] * query.shape[1]
        if mn > _NAIVE_MAX_MN:
            return knn_tiled(support, query, k)
        return knn_naive(support, query, k)
    elif approach == "pallas":
        from recognizer3d_tpu.ops.knn_pallas import knn_pallas_presorted

        return knn_pallas_presorted(support, query, k)
    elif approach == "approximate" and k == 1 and support.shape[1] <= 32768:
        # same free-accuracy routing as :func:`knn`: below 32k support the
        # exact presorted 1-NN strictly beats the full-distance
        # approx_min_k this branch used to run (ablate_approx_routing.py);
        # past it the window keeps winning, exactly as before
        return knn_presorted(support, query, 1, "naive")
    elif (
        approach == "approximate"
        and support.shape[1] > _WINDOW_MIN_SUPPORT
        and support.shape[1] * query.shape[1] > _NAIVE_MAX_MN
    ):
        if session_exact_fallback():
            return knn_presorted(support, query, k, "naive")
        result = knn_window(
            support,
            query,
            k,
            window_points=session_window_points(),
            presorted=True,
        )
        if _recall_telemetry_enabled():
            result = _with_recall_telemetry(
                support, query, k, result,
                f"window/presorted N={support.shape[1]} M={query.shape[1]}",
            )
        return result
    # small-N approximate / kdtree are order-agnostic
    return knn(support, query, k, approach)


def gather_neighbors(features: jax.Array, neighbors: jax.Array) -> jax.Array:
    """Gather per-neighbour features.

    :param features: (B, N, C) point features.
    :param neighbors: (B, M, K) int indices into the N axis.
    :return: (B, M, K, C) gathered features.

    This is the XLA-native form of the reference's unsqueeze/expand/gather
    chains (modules.py:170-186, :209-221). Formulation matters on TPU: a
    single flat ``jnp.take`` over a (B·N, C) table lowers to the fast
    row-gather path (measured 3.2× over the batched-gather form of
    ``vmap(lambda f, i: f[i])`` at 64k points; cost is per-row, flat in C).
    """
    B, N, C = features.shape
    M, K = neighbors.shape[1], neighbors.shape[2]
    if B == 1:
        flat = neighbors[0].reshape(-1)
        table = features[0]
    elif B * N <= FAST_GATHER_MAX_ROWS:
        offsets = (jnp.arange(B, dtype=neighbors.dtype) * N)[:, None]
        flat = (neighbors.reshape(B, M * K) + offsets).reshape(-1)
        table = features.reshape(B * N, C)
    else:
        # Big batched clouds: one gather per batch element. The flat
        # (B·N)-row table leaves the fast-gather regime — measured per-row
        # cost grows ~linearly with table size past ~128k rows (DRAM page
        # locality), so a 4×64k flat gather costs 17× a 64k one. A
        # sequential lax.map keeps each gather on its own N-row table
        # (2.6× faster at B=4×64k; see benchmarks/RESULTS.md).
        out = lax.map(
            lambda args: jnp.take(args[0], args[1].reshape(-1), axis=0),
            (features, neighbors),
        )
        return out.reshape(B, M, K, C)
    return jnp.take(table, flat, axis=0).reshape(B, M, K, C)
