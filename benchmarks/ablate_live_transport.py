"""Live-loop transport attribution (VERDICT r4 #2).

r4 left two open questions on the live/predict wall latency through the
axon relay: (a) what are the residual 0.58 relay round-trips per call
beyond the unavoidable dispatch+readback, and (b) why does the f16 upload
(~0.9 MB) cost ~59 ms — bytes or per-transfer overhead?

This script measures, each with interleaved bare-RTT probes (the r4
relay-proof method):

1. bare RTT (tiny jitted dispatch + readback);
2. explicit jax.device_put + touch for payloads 4 B … 6 MB → the
   transport's fixed + per-byte model;
3. the live predict_depth wall as shipped;
4. variant: np depth passed STRAIGHT to the jitted program (no explicit
   jnp.asarray — does arg upload ride the dispatch exchange?);
5. variant: depth pre-resident on device (upload removed entirely);
6. variant: per-call jnp.float32(threshold) vs a cached device scalar;
7. download: full packed (n_display, 4) f16 vs a 1-float result.

Output: one JSON dict with all numbers, for RESULTS.md's decision entry.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parent.parent


def _wall(fn, rtt_fn, iters=30, warmup=3):
    for _ in range(warmup):
        fn()
    pairs = []
    for _ in range(iters):
        t = time.perf_counter()
        rtt_fn()
        rtt = time.perf_counter() - t
        t = time.perf_counter()
        fn()
        pairs.append((rtt, time.perf_counter() - t))
    rtts = np.array([p[0] for p in pairs])
    walls = np.array([p[1] for p in pairs])
    out = {
        "p50_ms": float(np.median(walls)) * 1e3,
        "min_ms": float(np.min(walls)) * 1e3,
        "rtt_p50_ms": float(np.median(rtts)) * 1e3,
    }
    cv = float(np.std(rtts) / np.mean(rtts)) if np.mean(rtts) > 0 else 0.0
    if cv >= 0.05:
        slope, intercept = np.polyfit(rtts, walls, 1)
        if 0.0 <= slope <= 200.0 and intercept > 0.0:
            out["normalized_ms"] = float(intercept) * 1e3
            out["roundtrips"] = round(float(slope), 2)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from recognizer3d_tpu import Model, RandLANetSettings
    from recognizer3d_tpu.models.live import LivePredictor

    rng = np.random.RandomState(0)
    results = {"device": str(jax.devices()[0])}

    sum_small = jax.jit(jnp.sum)
    small = jnp.zeros((8,), jnp.float32)
    float(sum_small(small))

    def rtt_probe():
        float(sum_small(small))

    # 1 --------------------------------------------------------------
    results["rtt"] = _wall(rtt_probe, rtt_probe, iters=40)

    # 2 --------------------------------------------------------------
    touch = jax.jit(lambda x: x.reshape(-1)[0])
    for size in (4, 131072, 786432, 1572864, 6291456):
        buf = np.zeros(size, np.uint8)
        float(touch(jax.device_put(buf)))
        results[f"device_put_{size}B"] = _wall(
            lambda b=buf: float(touch(jax.device_put(b))), rtt_probe,
            iters=20,
        )
        # np arg straight into the jitted call (upload inside dispatch)
        results[f"np_arg_{size}B"] = _wall(
            lambda b=buf: float(touch(b)), rtt_probe, iters=20
        )

    # 3-6 -------------------------------------------------------------
    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="naive", n_points=2500,
        n_neighbors=32, decimation=4,
    )
    model = Model(settings, seed=0)
    live = LivePredictor(model, n_display=32768)
    depth = (
        rng.uniform(0.1 / 0.00025, 0.55 / 0.00025, (768, 1024))
        .astype(np.uint16)
    )
    results["live_shipped"] = _wall(
        lambda: live.predict_depth(depth), rtt_probe
    )

    # variant: np depth + np threshold straight into the program
    from recognizer3d_tpu.utils.host_rng import host_threefry_keys

    rng2 = np.random.RandomState(1)
    thr_np = np.float32(0.5)

    def call_np():
        key = host_threefry_keys(rng2)
        perm = np.random.permutation(2500).astype(np.int32)
        packed = np.asarray(
            live._program(model.variables, depth, key, perm, thr_np)
        )
        return packed

    call_np()
    results["live_np_args"] = _wall(call_np, rtt_probe)

    # variant: depth pre-resident (upload removed)
    depth_dev = jax.device_put(jnp.asarray(depth))

    def call_resident():
        key = host_threefry_keys(rng2)
        perm = np.random.permutation(2500).astype(np.int32)
        return np.asarray(
            live._program(model.variables, depth_dev, key, perm, thr_np)
        )

    call_resident()
    results["live_depth_resident"] = _wall(call_resident, rtt_probe)

    # variant: per-call jnp scalar (the shipped pattern pre-r5)
    def call_jnp_scalar():
        key = host_threefry_keys(rng2)
        perm = np.random.permutation(2500).astype(np.int32)
        return np.asarray(
            live._program(
                model.variables, depth_dev, key, perm, jnp.float32(0.5)
            )
        )

    call_jnp_scalar()
    results["live_depth_resident_jnp_scalar"] = _wall(
        call_jnp_scalar, rtt_probe
    )

    # 7: download cost — same program, 1-float reduction of the output
    import functools

    @jax.jit
    def program_sum(variables, d, key, perm, thr):
        packed = live.program_fn(variables, d, key, perm, thr)
        return jnp.sum(packed.astype(jnp.float32))

    def call_sum():
        key = host_threefry_keys(rng2)
        perm = np.random.permutation(2500).astype(np.int32)
        return float(
            program_sum(model.variables, depth_dev, key, perm, thr_np)
        )

    call_sum()
    results["live_depth_resident_tiny_download"] = _wall(
        call_sum, rtt_probe
    )

    out = REPO / "benchmarks" / "live_transport_ablation.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
