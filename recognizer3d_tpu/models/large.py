"""Chunked eval forward for million-point clouds.

The flax module materialises several (N, K, C) neighbour tensors per LFA
block; at N = 1M that peaks past the chip's HBM (measured 16.1 GB of
15.75 GB — benchmarks/RESULTS.md). This functional re-implementation of
the EVAL forward (weight-for-weight identical to ``RandLANet``; parity
pinned by tests/test_large.py) streams each LFA's neighbour pipeline in
query chunks with ``lax.map``:

- phase A per chunk: neighbour gather → LocSE encoding → mlp_rpe1 →
  attentive pool 1 (keeps the mlp_rpe1 output for phase B);
- phase B per chunk: gather of the pooled features → mlp_rpe2 →
  attentive pool 2;

so the peak per-neighbour tensor is (chunk, K, C) instead of (N, K, C).
Everything else (KNN, decimation, decoder 1-NN upsample, head) is the
same sorted-domain pipeline as the module. Eval only — training at this
scale should use the point-sharded model (parallel/sp_model.py) across
chips instead.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from recognizer3d_tpu.models.functional import (
    _BN_EPS,
    attentive_pool,
    bn_eval,
    dense,
    shared_mlp,
)
from recognizer3d_tpu.models.settings import RandLANetSettings
from recognizer3d_tpu.ops import lfa_pallas
from recognizer3d_tpu.ops.knn import gather_neighbors, knn_presorted
from recognizer3d_tpu.ops.knn_pallas import invert_permutation, morton_order

# route the facade's eval forward through this path at / beyond this size
LARGE_FORWARD_MIN_POINTS = 300_000

#: fused-LFA memory gate: the one full-level intermediate the fused
#: pipeline keeps in HBM between its two chunked phases — rpe2,
#: (N, K·half) f32 — must stay under this (~1 GB per 1M-point level on
#: the app architecture; everything else is chunk-sized)
_FUSED_LEVEL_MAX_GATHER_BYTES = 3 * 1024**3


def _chunked(x: jax.Array, chunk: int):
    """(N, ...) -> (n_chunks, chunk, ...), edge-padded."""
    n = x.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    return x.reshape((n_chunks, chunk) + x.shape[1:])


def _lfa_chunked(
    p: Dict,
    s: Dict,
    xyz: jax.Array,
    feats: jax.Array,
    k: int,
    knn_approach: str,
    chunk: int,
) -> jax.Array:
    """One eval LFA block on SORTED (N, ·) arrays, neighbour pipeline
    streamed in query chunks (module: LocalFeatureAggregation)."""
    n = xyz.shape[0]
    neighbors, d2 = knn_presorted(xyz[None], xyz[None], k, knn_approach)
    nb, dist = neighbors[0], jnp.sqrt(d2[0])

    feats1 = shared_mlp(p["mlp1"], s["mlp1"], feats, "lrelu0.2")
    table = jnp.concatenate([xyz, feats1], axis=-1)

    nb_c = _chunked(nb, chunk)
    dist_c = _chunked(dist, chunk)
    xyz_c = _chunked(xyz, chunk)

    def phase_a(args):
        nb_i, dist_i, q_i = args  # (c, K), (c, K), (c, 3)
        g = jnp.take(table, nb_i.reshape(-1), axis=0).reshape(
            chunk, k, table.shape[-1]
        )
        center = jnp.broadcast_to(q_i[:, None, :], (chunk, k, 3))
        rpe = jnp.concatenate(
            [center, g[..., :3], center - g[..., :3], dist_i[..., None]],
            axis=-1,
        )
        rpe1 = shared_mlp(p["mlp_rpe1"], s["mlp_rpe1"], rpe, "relu")
        cat = jnp.concatenate([rpe1, g[..., 3:]], axis=-1)
        return attentive_pool(p["pool1"], s["pool1"], cat), rpe1

    f1_c, rpe1_c = lax.map(phase_a, (nb_c, dist_c, xyz_c))
    f1 = f1_c.reshape(-1, f1_c.shape[-1])[:n]

    def phase_b(args):
        nb_i, rpe1_i = args
        nf = jnp.take(f1, nb_i.reshape(-1), axis=0).reshape(
            chunk, k, f1.shape[-1]
        )
        rpe2 = shared_mlp(p["mlp_rpe2"], s["mlp_rpe2"], rpe1_i, "relu")
        cat = jnp.concatenate([rpe2, nf], axis=-1)
        return attentive_pool(p["pool2"], s["pool2"], cat)

    f2_c = lax.map(phase_b, (nb_c, rpe1_c))
    f2 = f2_c.reshape(-1, f2_c.shape[-1])[:n]

    out = shared_mlp(p["mlp2"], s["mlp2"], f2)
    shortcut = shared_mlp(p["shortcut"], s["shortcut"], feats)
    return jax.nn.leaky_relu(out + shortcut, negative_slope=0.01)


def _bn_affine_f(p_bn: Dict, s_bn: Dict):
    """Eval-mode per-channel affine ``y = s·x + o`` from functional BN
    dicts (the pytree form of randlanet._bn_eval_affine — computed from
    the raw scale/bias/mean/var, never by probe differencing)."""
    sc = p_bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        s_bn["var"].astype(jnp.float32) + _BN_EPS
    )
    off = p_bn["bias"].astype(jnp.float32) - s_bn["mean"].astype(
        jnp.float32
    ) * sc
    return sc, off


def _fused_level_available(k: int, n: int, half: int) -> bool:
    """Chunk-streamed fused-LFA eligibility: kernel support for this
    (k, half) geometry, the compiled-Mosaic availability switch (shared
    with the in-model path: RECOGNIZER3D_FUSED_LFA=0 disables,
    FORCE_FUSED_LFA_INTERPRET tests it on CPU), and a bound on the one
    full-level intermediate the fused pipeline keeps in HBM (rpe2,
    (N, K·half) f32 — ~1 GB per 1M-point level on the app
    architecture)."""
    from recognizer3d_tpu.models import randlanet as _rl

    return (
        _rl._fused_lfa_available()
        and lfa_pallas.supports(k, half, "float32")
        and n * k * half * 4 <= _FUSED_LEVEL_MAX_GATHER_BYTES
    )


def _lfa_fused_level(
    p: Dict,
    s: Dict,
    xyz: jax.Array,
    feats: jax.Array,
    k: int,
    knn_approach: str,
    chunk: int,
) -> jax.Array:
    """One eval LFA level through the fused lane kernels
    (ops/lfa_pallas) with LOCALITY-SLICED gathers, streamed in query
    chunks — the in-model fused branch (randlanet.py
    LocalFeatureAggregation, eval path) re-expressed over functional
    param dicts with :func:`_lfa_chunked`'s two-phase skeleton.

    What actually pays at 1M (r5 op-level traces, RESULTS.md "1M
    forward: fused levels + sliced gathers"): the two per-level
    neighbour gathers at the LARGE-table footprint rate (~6.5 ns/row
    from a 1M-row table vs ~1.9 ns in the fast regime — "Batched row
    gathers") were ~45% of the 1.05 s forward; the unfused chain the
    kernels replace measured ROUGHLY NEUTRAL against the kernels + the
    gather→lane-flatten relayouts they require. The win is the sliced
    gather (``local_gather`` below): window-confined indices let each
    chunk gather from a ~(chunk + 2w)-row table slice, back inside the
    fast regime. Measured 1M approximate forward 1.08 s → 0.68 s.

    Chunking is required here (unlike the in-model 64k path): the
    gather feeding the round-1 kernel relayouts to the lane-flattened
    form through an 8×-PADDED (rows, C→128-lane) intermediate — at a
    full 1M level that copy alone is 16 GB (OOM, measured), per 64k
    chunk it is the same ~1 GB the in-model path pays. Phase A per
    chunk: sliced gather → round-1 kernel (RPE+pool1+rpe2). Phase B per
    chunk (after all of phase A — the pooled-row gather reaches outside
    the chunk): sliced gather of pooled rows → pool-2 kernel with the
    block residual absorbed.

    xyz/feats are the level's SORTED (N, ·) f32 arrays; returns the
    block output in the same order. Weight-exact per the kernels'
    parity tests (tests/test_lfa_fused.py); the sliced gather is
    bit-identical to the flat one (tests/test_large.py
    TestSlicedGathers).
    """
    from recognizer3d_tpu.models import randlanet as _rl
    from recognizer3d_tpu.ops import knn as knn_mod

    interp = _rl.FORCE_FUSED_LFA_INTERPRET
    n = xyz.shape[0]
    k10 = p["mlp_rpe1"]["conv"]["kernel"].astype(jnp.float32)  # (10, h)
    feats1 = shared_mlp(p["mlp1"], s["mlp1"], feats, "lrelu0.2")
    # FusedRPEMLP linearisation: the rpe Dense splits over its concat
    # inputs; the neighbour term rides the combined gather
    table = jnp.concatenate(
        [xyz @ (k10[3:6] - k10[6:9]), feats1], axis=-1
    )
    center_proj = xyz @ (k10[0:3] + k10[6:9])
    neighbors, d2 = knn_presorted(xyz[None], xyz[None], k, knn_approach)
    nb, d2 = neighbors[0], d2[0]

    # Locality-sliced gathers (r5, the actual 1M lever — RESULTS "1M
    # forward: fused levels + sliced gathers"): per-row gather cost
    # grows ~2.5× once the table passes the fast-gather footprint
    # (~128k rows — RESULTS "Batched row gathers"), and at 1M the two
    # per-level gathers were ~45% of the forward. When the self-KNN ran
    # through the Morton WINDOW search, every index of query chunk
    # [c0, c0+chunk) is confined to sorted-table rows
    # [c0 − w, c0 + chunk + w) by construction (block windows sit on
    # the proportional curve map, |offset| ≤ w/2 + qb ≤ w), so each
    # chunk can gather from a dynamic SLICE of the table that is back
    # inside the fast regime. Exact KNN has unbounded indices — flat
    # gathers stay.
    windowed = (
        knn_approach == "approximate"
        and knn_mod.window_regime_active(n)
        and not knn_mod.session_exact_fallback()
    )
    w_pts = knn_mod.session_window_points()
    span = min(n, chunk + 2 * w_pts)

    def local_gather(tbl_full, nb_i, c0):
        if not windowed:
            return jnp.take(tbl_full, nb_i.reshape(-1), axis=0)
        s0 = jnp.clip(c0 - w_pts, 0, n - span)
        tbl = lax.dynamic_slice(
            tbl_full, (s0, 0), (span, tbl_full.shape[-1])
        )
        return jnp.take(tbl, (nb_i - s0).reshape(-1), axis=0)

    s1, o1 = _bn_affine_f(
        p["mlp_rpe1"]["batch_norm"], s["mlp_rpe1"]["batch_norm"]
    )
    sp1, op1 = _bn_affine_f(
        p["pool1"]["mlp"]["batch_norm"], s["pool1"]["mlp"]["batch_norm"]
    )
    s2, o2 = _bn_affine_f(
        p["mlp_rpe2"]["batch_norm"], s["mlp_rpe2"]["batch_norm"]
    )

    nb_c = _chunked(nb, chunk)
    d2_c = _chunked(d2, chunk)
    ctr_c = _chunked(center_proj, chunk)
    c0s = jnp.arange(nb_c.shape[0], dtype=jnp.int32) * chunk

    def phase_a(args):
        nb_i, d2_i, ctr_i, c0 = args  # (c, K), (c, K), (c, h), ()
        g = local_gather(table, nb_i, c0).reshape(
            1, chunk, k, table.shape[-1]
        )
        pooled_i, rpe2_i = lfa_pallas.lfa_round1_fused(
            g,
            d2_i[None],
            ctr_i[None],
            k10[9],
            p["mlp_rpe1"]["conv"]["bias"],
            s1,
            o1,
            p["pool1"]["score_fn"]["kernel"],
            p["pool1"]["mlp"]["conv"]["kernel"],
            p["pool1"]["mlp"]["conv"]["bias"],
            sp1,
            op1,
            p["mlp_rpe2"]["conv"]["kernel"],
            p["mlp_rpe2"]["conv"]["bias"],
            s2,
            o2,
            interpret=interp,
        )
        return pooled_i[0], rpe2_i[0]

    pooled_c, rpe2_c = lax.map(phase_a, (nb_c, d2_c, ctr_c, c0s))
    pooled = pooled_c.reshape(-1, pooled_c.shape[-1])[:n]

    sp2, op2 = _bn_affine_f(
        p["pool2"]["mlp"]["batch_norm"], s["pool2"]["mlp"]["batch_norm"]
    )
    sm, om = _bn_affine_f(p["mlp2"]["batch_norm"], s["mlp2"]["batch_norm"])
    ssh, osh = _bn_affine_f(
        p["shortcut"]["batch_norm"], s["shortcut"]["batch_norm"]
    )
    wm = p["mlp2"]["conv"]["kernel"]
    bm = p["mlp2"]["conv"]["bias"]
    wsh = p["shortcut"]["conv"]["kernel"]
    bsh = p["shortcut"]["conv"]["bias"]
    feats_c = _chunked(feats, chunk)

    def phase_b(args):
        nb_i, rpe2_i, f_i, c0 = args
        g2 = local_gather(pooled, nb_i, c0).reshape(
            1, chunk, k, pooled.shape[-1]
        )
        out_i = lfa_pallas.attentive_pool2_residual_fused(
            rpe2_i[None],
            g2,
            p["pool2"]["score_fn"]["kernel"],
            p["pool2"]["mlp"]["conv"]["kernel"],
            p["pool2"]["mlp"]["conv"]["bias"],
            sp2,
            op2,
            f_i[None],
            wm * sm[None, :],
            wsh * ssh[None, :],
            (sm * bm + om) + (ssh * bsh + osh),
            k=k,
            interpret=interp,
        )
        return out_i[0]

    out_c = lax.map(phase_b, (nb_c, rpe2_c, feats_c, c0s))
    return out_c.reshape(-1, out_c.shape[-1])[:n]


def _forward_one(
    p: Dict,
    s: Dict,
    settings: RandLANetSettings,
    inputs: jax.Array,
    permutation: jax.Array,
    chunk: int,
) -> jax.Array:
    """Eval forward of ONE cloud (N, 3+F) -> logits (C, N)."""
    n = inputs.shape[0]
    xyz = inputs[..., :3].astype(jnp.float32)

    feats = dense(p["fc_start"], inputs)
    feats = bn_eval(p["bn_start"], s["bn_start"], feats)
    feats = jax.nn.leaky_relu(feats, negative_slope=0.2)

    xyz = xyz[permutation]
    # feats stay in ORIGINAL order here: the sorted flow composes
    # permutation ∘ order_0 into the single entry gather below (the
    # standalone 1M-row permutation gather costs ~37 ns/row)

    level_sizes = [n]
    ratio = 1
    for _ in settings.layer_sizes:
        ratio *= settings.decimation
        level_sizes.append(n // ratio)

    orders, invs, xyz_levels = [], [], []
    for n_level in level_sizes:
        x_level = xyz[:n_level]
        order = morton_order(x_level[None])[0]
        orders.append(order)
        invs.append(invert_permutation(order[None])[0])
        xyz_levels.append(x_level[order])

    # sorted-domain flow (r5, ported from the in-model r4 design —
    # randlanet.py "sorted_flow"): features live in each level's Morton
    # order END TO END; every level transition is ONE composed gather
    # (inv_prev ∘ order_next subsumes the exit unsort, the decimation
    # prefix and the next entry sort), and only the final head gather
    # returns to the original order. At 1M the per-level unsorts this
    # removes are full-table permutation gathers at the ~37 ns/row
    # random rate (the L0 exit unsort alone traced 39 ms).
    # RECOGNIZER3D_SORTED_FLOW=0 restores the r3-style per-level sorts
    # (bit-identical — the same A/B invariant as the module path).
    import os

    sorted_flow = os.environ.get("RECOGNIZER3D_SORTED_FLOW", "1") != "0"

    def run_level(i, n_out, sorted_feats):
        if _fused_level_available(
            settings.n_neighbors, level_sizes[i], n_out // 2
        ):
            # chunk-streamed lane kernels + locality-sliced gathers
            # (r5) — see _lfa_fused_level. Covers the first two encoder
            # levels of the app architecture (half = 8 / 32), whose
            # footprint-priced gathers carried ~45% of the 1M forward.
            return _lfa_fused_level(
                p[f"encoder_{i}"],
                s[f"encoder_{i}"],
                xyz_levels[i],
                sorted_feats,
                settings.n_neighbors,
                settings.knn,
                min(chunk, level_sizes[i]),
            )
        return _lfa_chunked(
            p[f"encoder_{i}"],
            s[f"encoder_{i}"],
            xyz_levels[i],
            sorted_feats,
            settings.n_neighbors,
            settings.knn,
            min(chunk, level_sizes[i]),
        )

    skip_stack = []
    if sorted_flow:
        feats_sampled = feats[permutation[orders[0]]]  # one entry gather
        for i, n_out in enumerate(settings.layer_sizes):
            out = run_level(i, n_out, feats_sampled)
            skip_stack.append(out)  # SORTED-i order
            # sorted_i -> sorted_{i+1}: the decimation prefix's rows
            # gathered straight out of the sorted-i array
            feats_sampled = out[invs[i][orders[i + 1]]]
    else:
        feats_sampled = feats[permutation]
        for i, n_out in enumerate(settings.layer_sizes):
            out = run_level(i, n_out, feats_sampled[orders[i]])
            feats_lvl = out[invs[i]]
            skip_stack.append(feats_lvl)
            feats_sampled = feats_lvl[: level_sizes[i + 1]]

    feats_mid = shared_mlp(p["mlp"], s["mlp"], feats_sampled, "relu")

    n_outs = list(settings.layer_sizes[::-1][1:])
    decoder_channels = [2 * c for c in n_outs] + [8]
    feats_dec = feats_mid
    for i, n_out_ch in enumerate(decoder_channels):
        level = len(settings.layer_sizes) - i
        nb1, _ = knn_presorted(
            xyz_levels[level][None],
            xyz_levels[level - 1][None],
            1,
            settings.knn,
        )
        if sorted_flow:
            # feats_dec is sorted-level; the presorted 1-NN emits the
            # fine level's sorted order directly — exactly what the
            # skip concat and the next iteration consume
            up = feats_dec[nb1[0, :, 0]]
        else:
            up = feats_dec[orders[level]][nb1[0, :, 0]]
            up = up[invs[level - 1]]
        feats_dec = jnp.concatenate(
            [up, skip_stack.pop()], axis=-1
        )
        feats_dec = shared_mlp(
            p[f"decoder_{i}"], s[f"decoder_{i}"], feats_dec, "relu"
        )

    if sorted_flow:
        # inv_0 ∘ inverse-permutation in one gather
        feats_dec = feats_dec[
            invs[0][invert_permutation(permutation[None])[0]]
        ]
    else:
        feats_dec = feats_dec[invert_permutation(permutation[None])[0]]

    feats_dec = shared_mlp(p["fc_end_0"], s["fc_end_0"], feats_dec, "relu")
    feats_dec = shared_mlp(p["fc_end_1"], s["fc_end_1"], feats_dec, "relu")
    # dropout is identity in eval mode
    feats_dec = shared_mlp(p["fc_end_2"], s.get("fc_end_2", {}), feats_dec)
    return feats_dec.T  # (C, N)


def forward_eval_large(
    variables: Dict,
    settings: RandLANetSettings,
    inputs: jax.Array,
    permutation: jax.Array,
    chunk: int = 65536,
) -> jax.Array:
    """Eval forward (B, N, 3+F) -> logits (B, C, N), LFA neighbour
    pipelines streamed in ``chunk``-query pieces. Weight-for-weight
    identical to ``RandLANet.apply(..., train=False)``."""
    p, s = variables["params"], variables["batch_stats"]
    outs = [
        _forward_one(p, s, settings, inputs[b], permutation, chunk)
        for b in range(inputs.shape[0])
    ]
    return jnp.stack(outs, axis=0)
