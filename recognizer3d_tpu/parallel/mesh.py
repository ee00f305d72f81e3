"""Device-mesh helpers — the framework's communication backend.

The reference is single-device with no distributed strategy (SURVEY.md §2.9);
here the TPU-native scale-out surface lives behind two tiny primitives:

- :func:`data_parallel_mesh` — a 1-D ``jax.sharding.Mesh`` over the "data"
  axis (ICI ring on a pod slice);
- :func:`shard_batch_fn` — places host batches with their leading axis
  sharded over that mesh. Because jitted programs follow input shardings
  (GSPMD), the *same* train/eval step compiled for one chip runs SPMD on N
  chips: gradient all-reduce, batch-norm cross-replica statistics and metric
  reductions all lower to XLA collectives (psum) over ICI automatically.

Point-dimension (sequence-parallel analog) sharding for very large clouds
lives in recognizer3d_tpu/parallel/ring_knn.py.
"""

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: int = -1) -> Mesh:
    """Create a 1-D data-parallel mesh over the first ``n_devices`` devices
    (all devices when -1)."""
    devices = jax.devices()
    if n_devices == -1:
        n_devices = len(devices)
    assert n_devices <= len(devices), (
        f"requested {n_devices} devices, only {len(devices)} available"
    )
    return Mesh(np.asarray(devices[:n_devices]), axis_names=("data",))


def shard_batch_fn(mesh: Mesh) -> Callable:
    """Return a function placing a host array with axis 0 sharded over the
    mesh's "data" axis (other axes replicated)."""
    def shard(x):
        x = np.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return shard


def replicate_fn(mesh: Mesh) -> Callable:
    """Return a function replicating a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())

    def replicate(tree):
        return jax.device_put(tree, sharding)

    return replicate
