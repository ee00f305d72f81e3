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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recognizer3d_tpu.parallel.ring_knn import ring_gather, ring_knn_gather


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
