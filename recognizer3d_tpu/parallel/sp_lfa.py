"""Point-sharded (sequence-parallel) Local Feature Aggregation.

The 1M-point stretch config (BASELINE.json config 5, SURVEY.md §2.9 SP row)
shards the point dimension across the ICI ring. This module runs one
RandLA-Net LFA block (models/randlanet.py:LocalFeatureAggregation,
reference modules.py:256-325) over such a sharding:

- the self-KNN + first neighbour gather is ONE ring collective
  (:func:`ring_knn_gather` — (distance, index, features) triples merge as
  support shards rotate);
- the second neighbour gather (pooled features) is ONE more ring rotation
  (:func:`ring_gather`);
- everything else in the block is pointwise or a K-local reduction, so it
  runs shard-locally under GSPMD with no further communication.

Eval-mode only (BatchNorm running averages; training this way would need a
cross-shard psum of batch statistics). The functional math consumes the
EXACT flax variable pytree of ``LocalFeatureAggregation`` — parity with the
single-device module is pinned by tests/test_parallel.py.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from recognizer3d_tpu.models.functional import (
    attentive_pool as _attentive_pool,
    dense as _dense,
    shared_mlp as _shared_mlp,
)
from recognizer3d_tpu.parallel.ring_knn import ring_gather, ring_knn_gather


def sp_lfa_eval(
    variables: Dict,
    xyz: jax.Array,
    features: jax.Array,
    k: int,
    mesh: Mesh,
    axis_name: str = "points",
) -> jax.Array:
    """One eval-mode LFA block over point-sharded inputs.

    :param variables: the flax variables of a ``LocalFeatureAggregation``
        (``{"params": ..., "batch_stats": ...}``), replicated.
    :param xyz: (B, N, 3) coordinates, sharded over ``axis_name``.
    :param features: (B, N, C_in) features, sharded likewise.
    :return: (B, N, 2·n_out) block output, sharded over ``axis_name``.
    """
    p = variables["params"]
    s = variables["batch_stats"]

    feats = _shared_mlp(p["mlp1"], s["mlp1"], features, "lrelu0.2")
    # ring pass 1: exact KNN + neighbour (xyz ‖ feats) gather
    table = jnp.concatenate([xyz, feats], axis=-1)
    idx, d2, gathered = ring_knn_gather(xyz, xyz, table, k, mesh, axis_name)
    distances = jnp.sqrt(d2)

    neighbor_xyz = gathered[..., :3]
    center = jnp.broadcast_to(xyz[:, :, None, :], neighbor_xyz.shape)
    rpe = jnp.concatenate(
        [center, neighbor_xyz, center - neighbor_xyz, distances[..., None]],
        axis=-1,
    )
    rpe = _shared_mlp(p["mlp_rpe1"], s["mlp_rpe1"], rpe, "relu")
    cat = jnp.concatenate([rpe, gathered[..., 3:]], axis=-1)
    feats = _attentive_pool(p["pool1"], s["pool1"], cat)

    rpe = _shared_mlp(p["mlp_rpe2"], s["mlp_rpe2"], rpe, "relu")
    # ring pass 2: gather the pooled features of the same neighbours
    nb2 = ring_gather(feats, idx, mesh, axis_name)
    cat = jnp.concatenate([rpe, nb2], axis=-1)
    feats = _attentive_pool(p["pool2"], s["pool2"], cat)

    out = _shared_mlp(p["mlp2"], s["mlp2"], feats)
    shortcut = _shared_mlp(p["shortcut"], s["shortcut"], features)
    return jax.nn.leaky_relu(out + shortcut, negative_slope=0.01)
