"""Bisect the level-0 LFA block: cumulative variants from bare KNN to the
full block, timed with the chained-iteration method.

Usage: python benchmarks/ablate_lfa.py [N]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax
    import jax.numpy as jnp

    from recognizer3d_tpu.ops.knn import gather_neighbors, knn
    from recognizer3d_tpu.models.randlanet import (
        AttentivePooling,
        SharedMLP,
        relative_position_encoding,
    )
    from flax import linen as nn

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = 32
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    feats8 = jnp.asarray(rng.randn(1, N, 8).astype(np.float32))

    class Probe(nn.Module):
        """Cumulative LFA slice selected by ``stage``."""

        stage: int

        @nn.compact
        def __call__(self, xyz, features):
            half = 16
            neighbors, d2 = knn(xyz, xyz, K, "naive")
            if self.stage == 0:
                return d2
            distances = jnp.sqrt(d2)
            feats = SharedMLP(half, activation="lrelu0.2", name="mlp1")(features)
            gathered = gather_neighbors(
                jnp.concatenate([xyz, feats], axis=-1), neighbors
            )
            if self.stage == 1:
                return gathered
            rpe = relative_position_encoding(
                xyz, neighbors, distances, neighbor_xyz=gathered[..., :3]
            )
            rpe = SharedMLP(half, activation="relu", name="mlp_rpe1")(rpe)
            if self.stage == 2:
                return rpe
            cat = jnp.concatenate([rpe, gathered[..., 3:]], axis=-1)
            feats = AttentivePooling(half, name="pool1")(cat)
            if self.stage == 3:
                return feats
            rpe = SharedMLP(half, activation="relu", name="mlp_rpe2")(rpe)
            cat = jnp.concatenate(
                [rpe, gather_neighbors(feats, neighbors)], axis=-1
            )
            feats = AttentivePooling(32, name="pool2")(cat)
            if self.stage == 4:
                return feats
            out = SharedMLP(64, name="mlp2")(feats)
            shortcut = SharedMLP(64, name="shortcut")(features)
            return nn.leaky_relu(out + shortcut, negative_slope=0.01)

    names = [
        "knn only",
        "+ mlp1 + combined gather",
        "+ rpe concat + mlp_rpe1",
        "+ cat + pool1",
        "+ mlp_rpe2 + gather2 + pool2",
        "+ mlp2/shortcut/residual (full)",
    ]
    prev = 0.0
    for stage in range(6):
        probe = Probe(stage)
        v = probe.init(jax.random.PRNGKey(0), xyz[:, :4096], feats8[:, :4096])

        def go(c, v, x, f):
            out = probe.apply(v, x + c * 1e-12, f)
            return jnp.float32(jnp.max(out))

        dt = _device_time(go, (v, xyz, feats8), iters=10)
        print(
            f"stage {stage}: {names[stage]:36s} {dt * 1000:8.2f} ms"
            f"   (+{(dt - prev) * 1000:7.2f})"
        )
        prev = dt


if __name__ == "__main__":
    main()
