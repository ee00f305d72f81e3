"""Why does the SECOND neighbour gather (gather2: pool1 features over the
same neighbour set) cost ~2-3x the combined first gather in-graph?
(ablate_stage1.py stage 6 measured two separate gathers at +21.9 ms vs the
combined one at +4.9 over the same KNN.)

All probes include the KNN and the combined gather1, so deltas vs the base
isolate gather2's marginal cost and its dependence on the producer.

Usage: python benchmarks/ablate_gather2.py [N]
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

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = 32
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    table32 = jnp.asarray(rng.randn(1, N, 32).astype(np.float32))
    table16 = jnp.asarray(rng.randn(1, N, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))

    def base(x, t32):
        neighbors, d2 = knn(x, x, K, "naive")
        g1 = gather_neighbors(t32, neighbors)
        # a pool1-like reduction: softmax over K then weighted sum -> (N,16)
        scores = jax.nn.softmax(g1, axis=2)
        feats1 = jnp.einsum("bnkc,cd->bnd", g1 * scores, w)
        return neighbors, g1, feats1

    probes = {}

    def p_base(c, x, t32):
        neighbors, g1, feats1 = base(x + c * 1e-12, t32)
        return jnp.float32(jnp.max(g1) + jnp.max(feats1))

    probes["base: knn + gather1 + pool1-like"] = (p_base, (xyz, table32))

    def p_g2(c, x, t32):
        neighbors, g1, feats1 = base(x + c * 1e-12, t32)
        g2 = gather_neighbors(feats1, neighbors)
        return jnp.float32(jnp.max(g1) + jnp.max(g2))

    probes["+ gather2(pool1 output)"] = (p_g2, (xyz, table32))

    def p_g2_barrier(c, x, t32):
        neighbors, g1, feats1 = base(x + c * 1e-12, t32)
        feats1 = jax.lax.optimization_barrier(feats1)
        g2 = gather_neighbors(feats1, neighbors)
        return jnp.float32(jnp.max(g1) + jnp.max(g2))

    probes["+ gather2(barrier(pool1 output))"] = (p_g2_barrier, (xyz, table32))

    def p_g2_input(c, x, t32, t16):
        neighbors, g1, feats1 = base(x + c * 1e-12, t32)
        g2 = gather_neighbors(t16, neighbors)
        return jnp.float32(jnp.max(g1) + jnp.max(g2) + jnp.max(feats1))

    probes["+ gather2(independent INPUT table)"] = (
        p_g2_input,
        (xyz, table32, table16),
    )

    def p_g2_pad32(c, x, t32):
        neighbors, g1, feats1 = base(x + c * 1e-12, t32)
        padded = jnp.concatenate([feats1, feats1], axis=-1)  # (N, 32)
        g2 = gather_neighbors(padded, neighbors)
        return jnp.float32(jnp.max(g1) + jnp.max(g2))

    probes["+ gather2(pool1 output padded to 32ch)"] = (p_g2_pad32, (xyz, table32))

    base_ms = None
    for name, (fn, args) in probes.items():
        dt = _device_time(fn, args, iters=10) * 1000
        delta = "" if base_ms is None else f"   (+{dt - base_ms:7.2f})"
        print(f"{name:44s} {dt:8.2f} ms{delta}")
        if base_ms is None:
            base_ms = dt


if __name__ == "__main__":
    main()
