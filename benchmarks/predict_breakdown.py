"""Decompose the app-config predict wall latency (VERDICT r1 weak #2).

Splits ``Model.predict`` on a real ~150k-point mock cloud into:

- host prep (dtype cast, cached sample indices, permutation draw, bucket
  pad) — measured by running exactly that code without a dispatch;
- H2D upload of the padded cloud (through the axon relay here);
- device compute of the fused predict program (chained-iteration method,
  relay overhead subtracted — bench.py:_device_time);
- D2H download of the confidences (and of the boolean mask fast path);
- the bare relay round-trip (tiny scalar readback).

Run: python benchmarks/predict_breakdown.py   (TPU, ~3 min incl. compile)
"""

import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _median(fn, iters=20, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    import sys

    sys.path.insert(0, str(REPO))
    from bench import _device_time
    from recognizer3d_tpu import Model, RandLANetSettings
    from recognizer3d_tpu.data.preprocessing import consistent_sample_indices
    from recognizer3d_tpu.models.facade import _bucket

    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="naive", n_points=2500,
        n_neighbors=32, decimation=4,
    )
    model = Model(settings, seed=0)
    mock = sorted((Path("/root/reference/data/mock")).glob("*_data.npy"))
    cloud = np.load(mock[0]) if mock else (
        np.random.RandomState(0).randn(150000, 3).astype(np.float32) * 0.2
    )
    n_full = cloud.shape[0]
    n_padded = _bucket(n_full)

    # full wall path (what the live loop pays end to end)
    wall = _median(lambda: model.predict(cloud), iters=15)
    mask_wall = _median(
        lambda: model.predict_mask(cloud, 0.5), iters=15
    )

    # host prep alone (the predict() code before its dispatch)
    def host_prep():
        inputs = np.expand_dims(cloud, 0).astype(np.float32)
        idx = consistent_sample_indices(n_full, settings.n_points)
        perm = np.random.permutation(settings.n_points).astype(np.int32)
        pad = np.zeros((1, n_padded - n_full, 3), np.float32)
        padded = np.concatenate([inputs, pad], axis=1)
        return padded, idx, perm

    t_host = _median(host_prep, iters=15)

    # bare relay RTT: scalar readback of a resident value. jax caches the
    # host copy after an array's first fetch, so each timed fetch must hit
    # a FRESH device scalar (same pitfall as the conf/mask downloads below)
    bump0 = jax.jit(lambda i: jnp.float32(1.0) + i)
    fresh_scalars = [bump0(jnp.float32(i)) for i in range(34)]
    it_scalar = iter(fresh_scalars)
    t_rtt = _median(lambda: float(next(it_scalar)), iters=30, warmup=3)
    sum_scalar = jax.jit(lambda x: jnp.sum(x))
    small = jnp.zeros((8,), jnp.float32)
    t_rtt_dispatch = _median(lambda: float(sum_scalar(small)), iters=30)

    # H2D upload of the padded cloud (device_put + tiny dependent readback)
    padded_np, idx_np, perm_np = host_prep()
    touch = jax.jit(lambda x: x.reshape(-1)[0])

    def upload():
        dev = jax.device_put(padded_np)
        return float(touch(dev))

    t_upload = _median(upload, iters=15)

    # D2H download of resident outputs. jax caches the host copy after the
    # first fetch of an array, so each timed fetch must hit a FRESH device
    # array (conf + i): subtract the tiny add's cost via the rtt number.
    conf = model._predict_full_jit(
        model.variables, jnp.asarray(padded_np),
        jnp.asarray(idx_np, dtype=jnp.int32), jnp.asarray(perm_np),
    )
    _ = float(jnp.sum(conf))
    bump = jax.jit(lambda x, i: x + i)
    fresh_confs = [bump(conf, jnp.float32(i)) for i in range(18)]
    fresh_masks = [c[:, 1, :] > 0.5 for c in fresh_confs]
    _ = float(jnp.sum(fresh_confs[-1]))
    it_conf = iter(fresh_confs)
    t_download_conf = _median(
        lambda: np.asarray(next(it_conf)), iters=15, warmup=2
    )
    it_mask = iter(fresh_masks)
    t_download_mask = _median(
        lambda: np.asarray(next(it_mask)), iters=15, warmup=2
    )

    # device compute (chained, relay-free)
    cloud_j = jnp.asarray(padded_np)
    idx_j = jnp.asarray(idx_np, dtype=jnp.int32)
    perm_j = jnp.asarray(perm_np)

    def step(c, variables, full, sidx, perm):
        out = model._predict_full_fn(variables, full + c * 1e-12, sidx, perm)
        return jnp.float32(jnp.max(out))

    t_device = _device_time(
        step, (model.variables, cloud_j, idx_j, perm_j), iters=10
    )

    out = {
        "cloud_points": int(n_full),
        "padded_points": int(n_padded),
        "wall_p50_ms": wall * 1e3,
        "mask_path_wall_p50_ms": mask_wall * 1e3,
        "host_prep_ms": t_host * 1e3,
        "device_compute_ms": t_device * 1e3,
        "relay_rtt_readback_ms": t_rtt * 1e3,
        "relay_rtt_dispatch_ms": t_rtt_dispatch * 1e3,
        "upload_padded_cloud_ms_incl_relay": t_upload * 1e3,
        "download_confidences_ms_incl_relay": t_download_conf * 1e3,
        "download_mask_ms_incl_relay": t_download_mask * 1e3,
        "non_relay_host_plus_device_ms": (t_host + t_device) * 1e3,
    }
    print(json.dumps(out, indent=2))
    out_path = REPO / "benchmarks" / "predict_breakdown.json"
    out_path.write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
