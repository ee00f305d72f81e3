"""Bisect LFA stage 1 (mlp1 + combined gather): ablate_lfa.py measured it
at +20.2 ms over the bare KNN at 64k while an isolated gather_neighbors of
the same shape measures far less — find where the extra time lives.

Each probe adds ONE piece on top of the KNN so the deltas localize the
cost: the mlp1 Dense/BN, the support-projection matmul, the table concat,
the gather itself, and the (B, N, K, C) materialisation.

Usage: python benchmarks/ablate_stage1.py [N]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from recognizer3d_tpu.models.randlanet import FusedRPEMLP, SharedMLP
    from recognizer3d_tpu.ops.knn import gather_neighbors, knn

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = 32
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    feats8 = jnp.asarray(rng.randn(1, N, 8).astype(np.float32))

    class Probe(nn.Module):
        stage: int

        @nn.compact
        def __call__(self, xyz, features):
            half = 16
            neighbors, d2 = knn(xyz, xyz, K, "naive")
            if self.stage == 0:  # bare KNN
                return d2
            feats = SharedMLP(half, activation="lrelu0.2", name="mlp1")(features)
            if self.stage == 1:  # + mlp1 only
                return feats + d2[..., :1]
            rpe_mlp = FusedRPEMLP(half, name="mlp_rpe1")
            proj = rpe_mlp.support_projection(xyz)
            if self.stage == 2:  # + support projection only
                return feats + proj + d2[..., :1]
            table = jnp.concatenate([proj, feats], axis=-1)
            if self.stage == 3:  # + table concat
                return table + d2[..., :1].astype(table.dtype)
            if self.stage == 4:  # + gather of the CONCAT table (full)
                g = gather_neighbors(table, neighbors)
                return g
            if self.stage == 5:  # gather of a PLAIN input-like table
                g = gather_neighbors(
                    jnp.tile(features, (1, 1, 4)), neighbors
                )
                return g
            if self.stage == 6:  # two separate gathers (proj, feats)
                g1 = gather_neighbors(proj, neighbors)
                g2 = gather_neighbors(feats, neighbors)
                return jnp.concatenate([g1, g2], axis=-1)
            raise AssertionError

    names = [
        "knn only",
        "+ mlp1",
        "+ support projection",
        "+ table concat",
        "+ gather(concat table)  [= stage1 of ablate_lfa]",
        "gather(plain 32ch table) instead",
        "two separate gathers instead",
    ]
    prev = 0.0
    for stage in range(7):
        probe = Probe(stage)
        v = probe.init(jax.random.PRNGKey(0), xyz[:, :4096], feats8[:, :4096])

        def go(c, v, x, f):
            out = probe.apply(v, x + c * 1e-12, f)
            return jnp.float32(jnp.max(out))

        dt = _device_time(go, (v, xyz, feats8), iters=10)
        print(
            f"stage {stage}: {names[stage]:48s} {dt * 1000:8.2f} ms"
            f"   (+{(dt - prev) * 1000:7.2f})"
        )
        prev = dt


if __name__ == "__main__":
    main()
