"""Distributed exact KNN over point-sharded clouds (ring exchange).

The reference's "sequence" dimension is the point dimension N, always
resident on one device (SURVEY.md §2.9: sequence-parallel row). For clouds
beyond one chip's memory/compute (the 1M-point S3DIS-style stretch config in
BASELINE.json), we shard N across the ICI ring and run the neighbourhood
search as a ring collective — the ring-attention analogue for KNN:

- each device keeps its local query shard fixed;
- support shards rotate around the ring (``lax.ppermute``), D steps;
- each step merges the visiting shard's candidates into a running top-k,
  with indices offset to GLOBAL (block-sharded) ids.

Peak memory is O(N/D) per device and the exchange rides the ICI ring —
never a full all-gather of the cloud.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from recognizer3d_tpu.ops.knn import knn_naive


def _vary(x, axes):
    """Mark an array as varying over the given mesh axes (shard_map typing;
    the pcast/pvary API differs across jax versions)."""
    axes = (axes,) if isinstance(axes, str) else tuple(a for a in axes if a)
    try:
        return lax.pcast(x, axes, to="varying")
    except (AttributeError, TypeError):
        return lax.pvary(x, axes)


def _ring_knn_local(
    support_shard: jax.Array,
    query_shard: jax.Array,
    k: int,
    axis_name: str,
    vary_axes: tuple = (),
) -> Tuple[jax.Array, jax.Array]:
    """Per-device body (inside shard_map): support/query (B, n_loc, 3)."""
    n_devices = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    n_loc = support_shard.shape[1]
    b, m_loc, _ = query_shard.shape
    k_step = min(k, n_loc)
    perm = [(j, (j + 1) % n_devices) for j in range(n_devices)]

    def step(carry, i):
        best_d, best_i, visiting = carry
        # the shard visiting us at step i originated at device (me - i) % D
        src = (me - i) % n_devices
        idx, d2 = knn_naive(visiting, query_shard, k_step)
        idx_global = idx + src * n_loc  # block-sharded global ids
        cand_d = jnp.concatenate([best_d, d2], axis=-1)
        cand_i = jnp.concatenate([best_i, idx_global], axis=-1)
        neg_top, sel = lax.top_k(-cand_d, k)
        new_d = -neg_top
        new_i = jnp.take_along_axis(cand_i, sel, axis=-1)
        visiting = lax.ppermute(visiting, axis_name, perm)
        return (new_d, new_i, visiting), None

    # mark the init carries as varying over every manual mesh axis the
    # computed carries vary over (shard_map typing; on a DP×SP mesh that
    # includes the batch axis)
    vary = vary_axes or (axis_name,)
    init = (
        _vary(jnp.full((b, m_loc, k), jnp.inf, dtype=jnp.float32), vary),
        _vary(jnp.zeros((b, m_loc, k), dtype=jnp.int32), vary),
        support_shard,
    )
    (best_d, best_i, _), _ = lax.scan(
        step, init, jnp.arange(n_devices, dtype=jnp.int32)
    )
    return best_i, jnp.maximum(best_d, 0.0)


def ring_knn(
    support: jax.Array,
    query: jax.Array,
    k: int,
    mesh: Mesh,
    axis_name: str = "points",
    batch_axis: str = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact KNN with both clouds block-sharded over ``axis_name``.

    :param support: (B, N, 3) — N divisible by the mesh axis size.
    :param query: (B, M, 3) — M divisible by the mesh axis size.
    :param batch_axis: optional extra mesh axis sharding the batch dim
        (DP×SP meshes); the ring then runs independently per batch shard.
    :return: (indices int32 (B, M, k) GLOBAL into support, squared dists).
             Outputs are sharded over the query/point axis.
    """
    spec = P(batch_axis, axis_name, None)
    f = shard_map(
        partial(
            _ring_knn_local,
            k=k,
            axis_name=axis_name,
            vary_axes=(axis_name, batch_axis),
        ),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
    )
    return f(support, query)


def _ring_knn_gather_local(
    support_shard: jax.Array,
    query_shard: jax.Array,
    feat_shard: jax.Array,
    k: int,
    axis_name: str,
    vary_axes: tuple = (),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-device body: like :func:`_ring_knn_local`, but each ring step
    also gathers the visiting shard's point FEATURES for its candidate
    neighbours and merges (distance, index, features) triples in the
    running top-k — so after the ring pass every query holds its k global
    neighbours' features locally and the downstream LocSE/attentive
    pooling needs no cross-shard gather at all."""
    n_devices = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    n_loc = support_shard.shape[1]
    b, m_loc, _ = query_shard.shape
    c = feat_shard.shape[-1]
    k_step = min(k, n_loc)
    perm = [(j, (j + 1) % n_devices) for j in range(n_devices)]

    def step(carry, i):
        best_d, best_i, best_f, visiting, visiting_f = carry
        src = (me - i) % n_devices
        idx, d2 = knn_naive(visiting, query_shard, k_step)  # (B, m, k_step)
        idx_global = idx + src * n_loc
        # gather the candidates' features from the visiting feature shard
        flat = idx.reshape(b, m_loc * k_step)
        feats = jnp.take_along_axis(
            visiting_f, flat[..., None], axis=1
        ).reshape(b, m_loc, k_step, c)
        cand_d = jnp.concatenate([best_d, d2], axis=-1)
        cand_i = jnp.concatenate([best_i, idx_global], axis=-1)
        cand_f = jnp.concatenate([best_f, feats], axis=-2)
        neg_top, sel = lax.top_k(-cand_d, k)
        new_d = -neg_top
        new_i = jnp.take_along_axis(cand_i, sel, axis=-1)
        new_f = jnp.take_along_axis(cand_f, sel[..., None], axis=-2)
        visiting = lax.ppermute(visiting, axis_name, perm)
        visiting_f = lax.ppermute(visiting_f, axis_name, perm)
        return (new_d, new_i, new_f, visiting, visiting_f), None

    vary = vary_axes or (axis_name,)
    init = (
        _vary(jnp.full((b, m_loc, k), jnp.inf, dtype=jnp.float32), vary),
        _vary(jnp.zeros((b, m_loc, k), dtype=jnp.int32), vary),
        _vary(jnp.zeros((b, m_loc, k, c), dtype=feat_shard.dtype), vary),
        support_shard,
        feat_shard,
    )
    (best_d, best_i, best_f, _, _), _ = lax.scan(
        step, init, jnp.arange(n_devices, dtype=jnp.int32)
    )
    return best_i, jnp.maximum(best_d, 0.0), best_f


def ring_knn_gather(
    support: jax.Array,
    query: jax.Array,
    features: jax.Array,
    k: int,
    mesh: Mesh,
    axis_name: str = "points",
    batch_axis: str = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused distributed KNN + neighbour-feature gather over a point-sharded
    mesh: the ring-attention analogue for local feature aggregation. Returns
    (global indices (B, M, k), squared distances, neighbour features
    (B, M, k, C)) — all block-sharded over the query axis, so a distributed
    LFA block (LocSE + attentive pooling) can run purely shard-locally on
    the result.

    :param support: (B, N, 3) sharded over ``axis_name``.
    :param query: (B, M, 3) sharded over ``axis_name``.
    :param features: (B, N, C) per-support-point features, sharded likewise.
    :param batch_axis: optional extra mesh axis sharding the batch dim.
    """
    row = P(batch_axis, axis_name, None)
    f = shard_map(
        partial(
            _ring_knn_gather_local,
            k=k,
            axis_name=axis_name,
            vary_axes=(axis_name, batch_axis),
        ),
        mesh=mesh,
        in_specs=(row, row, row),
        out_specs=(row, row, P(batch_axis, axis_name, None, None)),
    )
    return f(support, query, features)


def _ring_gather_local(
    feat_shard: jax.Array,
    idx_global: jax.Array,
    axis_name: str,
    vary_axes: tuple = (),
) -> jax.Array:
    """Per-device body: gather rows of a point-sharded feature table by
    GLOBAL indices. Feature shards rotate around the ring; at each step
    every query picks up the neighbours whose global id lives in the
    visiting shard."""
    n_devices = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    b, n_loc, c = feat_shard.shape
    m_loc, k = idx_global.shape[1], idx_global.shape[2]
    perm = [(j, (j + 1) % n_devices) for j in range(n_devices)]

    def step(carry, i):
        out, visiting_f = carry
        src = (me - i) % n_devices
        local = idx_global - src * n_loc  # (B, m, k)
        hit = (local >= 0) & (local < n_loc)
        safe = jnp.clip(local, 0, n_loc - 1).reshape(b, m_loc * k)
        got = jnp.take_along_axis(
            visiting_f, safe[..., None], axis=1
        ).reshape(b, m_loc, k, c)
        out = jnp.where(hit[..., None], got, out)
        visiting_f = lax.ppermute(visiting_f, axis_name, perm)
        return (out, visiting_f), None

    init_out = _vary(
        jnp.zeros((b, m_loc, k, c), dtype=feat_shard.dtype),
        vary_axes or (axis_name,),
    )
    (out, _), _ = lax.scan(
        step,
        (init_out, feat_shard),
        jnp.arange(n_devices, dtype=jnp.int32),
    )
    return out


def ring_gather(
    features: jax.Array,
    idx_global: jax.Array,
    mesh: Mesh,
    axis_name: str = "points",
    batch_axis: str = None,
) -> jax.Array:
    """Distributed ``gather_neighbors``: ``features`` (B, N, C) and
    ``idx_global`` (B, M, k) are both point-sharded; returns (B, M, k, C)
    neighbour features, sharded over the query axis. One rotation of the
    feature shards around the ring — no all-gather of the table."""
    f = shard_map(
        partial(
            _ring_gather_local,
            axis_name=axis_name,
            vary_axes=(axis_name, batch_axis),
        ),
        mesh=mesh,
        in_specs=(
            P(batch_axis, axis_name, None),
            P(batch_axis, axis_name, None),
        ),
        out_specs=P(batch_axis, axis_name, None, None),
    )
    return f(features, idx_global)


def point_sharded_mesh(n_devices: int = -1) -> Mesh:
    """1-D mesh over the point axis (SP analogue)."""
    import numpy as np

    devices = jax.devices()
    if n_devices == -1:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), axis_names=("points",))
