"""Point-sharded (sequence-parallel) FULL RandLA-Net.

SURVEY.md §2.9 SP row / §5.7: for clouds beyond one chip (the 1M-point
stretch config) the point dimension N is sharded across the ICI ring.
Rather than reimplementing the network, the flax :class:`RandLANet`
module takes a pluggable neighbourhood backend — this module's
:class:`SPBackend` — that routes every neighbourhood operation through
the ring collectives of ``parallel/ring_knn.py``:

- each LFA's self-KNN + first neighbour gather is ONE fused ring pass
  (``ring_knn_gather``), the second gather one more rotation
  (``ring_gather``);
- each decoder 1-NN upsample is a fused ring pass with k=1;
- prefix decimation slices get a sharding constraint so XLA rebalances
  the kept prefix across the mesh (a collective-permute, not an
  all-gather);
- everything else is pointwise/dense and runs shard-locally under
  GSPMD. In train mode flax BatchNorm's batch statistics are means over
  the (sharded) point axis, so XLA inserts the cross-shard psum
  automatically — SP training needs no hand-written BN collectives.

Because the SAME module runs in SP and single-device mode, the two are
parity-testable weight-for-weight (tests/test_parallel.py) and the SP
train step is just the ordinary train step jitted over sharded inputs.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recognizer3d_tpu.parallel.ring_knn import ring_gather, ring_knn_gather


def sharding_multiple(settings, n_shards: int) -> int:
    """The point-count granule for SP execution: when N is a multiple of
    ``decimation^n_layers · n_shards``, every decimation level
    (N, N/d, …, N/d^L — models/randlanet.py level_sizes) is exact and
    divisible by the shard count, which :meth:`SPBackend.check_level_sizes`
    requires."""
    return int(n_shards) * int(settings.decimation) ** settings.n_layers


def pad_for_sharding(
    cloud: np.ndarray,
    settings,
    n_shards: int,
    n_target: int = 0,
    rng: Optional[np.random.RandomState] = None,
) -> Tuple[np.ndarray, int]:
    """Pad a cloud's point axis so it runs point-sharded: up to the smallest
    count that is a multiple of :func:`sharding_multiple`, at least
    ``settings.min_n_points``, and at least ``n_target`` (callers pass a
    proportional bucket to bound the number of compiled programs).

    Padding rows are RANDOM DUPLICATES of real points — the host sampler's
    padding contract (reference preprocessing.py:35-62: sampling more points
    than exist pads with replacement), so duplicate-distance-0 neighbours
    are already within the model's accepted input distribution.

    :param cloud: (N, C) or (B, N, C), any leading batch dims.
    :return: (padded cloud, N_original) — callers slice outputs back.
    """
    cloud = np.asarray(cloud)
    n = cloud.shape[-2]
    if n < 1:
        raise ValueError("cannot pad an empty cloud")
    granule = sharding_multiple(settings, n_shards)
    target = max(n, settings.min_n_points, int(n_target))
    target = -(-target // granule) * granule
    if target == n:
        return cloud, n
    rng = rng if rng is not None else np.random.RandomState(0)
    dup = rng.randint(0, n, target - n)
    return np.concatenate([cloud, cloud[..., dup, :]], axis=-2), n


@dataclass(frozen=True)
class SPBackend:
    """Neighbourhood-op strategy for point-sharded execution.

    ``batch_axis`` names an optional second mesh axis sharding the batch
    dimension (DP×SP); rings then run independently per batch shard.
    """

    mesh: Mesh
    point_axis: str = "points"
    batch_axis: Optional[str] = None

    def knn_gather(
        self, support: jax.Array, query: jax.Array, table: jax.Array, k: int
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Fused exact KNN + neighbour-row gather, one ring rotation."""
        return ring_knn_gather(
            support, query, table, k,
            self.mesh, self.point_axis, self.batch_axis,
        )

    def gather(self, features: jax.Array, idx: jax.Array) -> jax.Array:
        """Row gather by GLOBAL point ids, one ring rotation."""
        return ring_gather(
            features, idx, self.mesh, self.point_axis, self.batch_axis
        )

    def constrain(self, x: jax.Array) -> jax.Array:
        """Pin (B, N, ...) to the block-sharded point layout so GSPMD
        rebalances decimation prefixes instead of gathering them."""
        spec = P(self.batch_axis, self.point_axis, *([None] * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec)
        )

    def check_level_sizes(self, level_sizes) -> None:
        n_shards = self.mesh.shape[self.point_axis]
        for n in level_sizes:
            if n % n_shards != 0:
                raise ValueError(
                    f"point-sharded forward needs every decimation level "
                    f"divisible by the {n_shards}-way point axis; got level "
                    f"size {n} (pad N to a multiple of "
                    f"decimation^n_layers * n_shards)"
                )

    def shard_inputs(self, inputs: jax.Array) -> jax.Array:
        """Place host inputs (B, N, ...) block-sharded over the mesh."""
        spec = P(
            self.batch_axis, self.point_axis, *([None] * (inputs.ndim - 2))
        )
        return jax.device_put(inputs, NamedSharding(self.mesh, spec))


def point_sharded_model(settings, mesh: Mesh, batch_axis: str = None):
    """A :class:`RandLANet` whose forward runs point-sharded over ``mesh``
    (axis "points"). Same variable pytree as the single-device module."""
    from recognizer3d_tpu.models.randlanet import RandLANet

    backend = SPBackend(mesh, batch_axis=batch_axis)
    return RandLANet(settings, backend=backend)
