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
    attentive_pool,
    bn_eval,
    dense,
    shared_mlp,
)
from recognizer3d_tpu.models.settings import RandLANetSettings
from recognizer3d_tpu.ops.knn import knn_presorted
from recognizer3d_tpu.ops.knn_pallas import invert_permutation, morton_order

# route the facade's eval forward through this path at / beyond this size
LARGE_FORWARD_MIN_POINTS = 300_000


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
    feats = feats[permutation]

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

    skip_stack = []
    feats_sampled = feats
    for i, n_out in enumerate(settings.layer_sizes):
        sorted_feats = feats_sampled[orders[i]]
        out = _lfa_chunked(
            p[f"encoder_{i}"],
            s[f"encoder_{i}"],
            xyz_levels[i],
            sorted_feats,
            settings.n_neighbors,
            settings.knn,
            min(chunk, level_sizes[i]),
        )
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
        up = feats_dec[orders[level]][nb1[0, :, 0]]
        up = up[invs[level - 1]]
        feats_dec = jnp.concatenate(
            [up, skip_stack.pop()], axis=-1
        )
        feats_dec = shared_mlp(
            p[f"decoder_{i}"], s[f"decoder_{i}"], feats_dec, "relu"
        )

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
