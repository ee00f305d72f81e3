"""Live wall p50 via the DEVICE-RESIDENT DEPTH PATH on real capture replays.

VERDICT r2 #1: the app's live loop now uploads the raw z16 depth frame
(camera.last_depth -> models/live.LivePredictor) instead of the dewarped
~150k-point cloud. This measures what the app actually pays per prediction
tick, replaying the reference's 15 REAL L515 captures as depth frames
(data.pipeline.cloud_to_depth — the inverse of the SDK dewarp, nearest
point per pixel):

- wall p50/p90 of ``LivePredictor.predict_depth`` per replayed frame
  (host perm+key draw, ONE 1.5 MB u16 upload, one dispatch, ONE packed-f16
  download — through the axon relay here);
- the same program's true device time (chained iterations, overhead
  subtracted) for the non-relay number a production host would see;
- the full-cloud Predictor path (f16 upload default) on the same captures,
  for the apples-to-apples "what did the depth path buy" comparison.

Run: python benchmarks/replay_depth.py    (TPU, ~4 min incl. compiles)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CAPTURES = Path("/root/reference/data/mock")


def main():
    import jax
    import jax.numpy as jnp

    from recognizer3d_tpu import Model, RandLANetSettings
    from recognizer3d_tpu.data.pipeline import DepthIntrinsics, cloud_to_depth
    from recognizer3d_tpu.models.live import LivePredictor

    sys.path.insert(0, str(REPO / "benchmarks"))
    from _timing import device_time  # noqa: E402

    files = sorted(CAPTURES.glob("*_data.npy"))
    if not files:
        print(json.dumps({"error": f"no captures under {CAPTURES}"}))
        return
    clouds = [np.load(f).astype(np.float32) for f in files]
    intr = DepthIntrinsics()  # the L515 1024×768 mode these were taken in
    depths = [cloud_to_depth(c, intr) for c in clouds]

    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="naive", n_points=2500,
        n_neighbors=32, decimation=4,
    )
    model = Model(settings, seed=0)
    live = LivePredictor(model, intrinsics=intr)  # warmup inside

    # wall per frame, cycling the real replays (each frame = perm draw +
    # upload + dispatch + packed download, exactly the app's tick)
    for d in depths[:3]:
        live.predict_depth(d)
    walls = []
    for rep in range(4):
        for d in depths:
            t0 = time.perf_counter()
            live.predict_depth(d)
            walls.append(time.perf_counter() - t0)
    walls_ms = np.asarray(walls) * 1e3

    # device time of the fused program on one real replay
    rng = np.random.RandomState(0)
    depth_j = jnp.asarray(depths[0])
    key = jnp.asarray(rng.randint(0, 2**32, (2,), dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(2500).astype(np.int32))

    def step(c, variables, depth, key, perm, thr):
        d = (depth.astype(jnp.float32) + c * 1e-9).astype(jnp.uint16)
        packed = live.program_fn(variables, d, key, perm, thr)
        return jnp.float32(jnp.sum(packed.astype(jnp.float32)))

    dev_ms = device_time(
        step, (model.variables, depth_j, key, perm, jnp.float32(0.5)),
        iters=10,
    ) * 1e3

    # the pre-depth path on the same captures: full-cloud Predictor with
    # the (new-default) f16 upload
    model16 = Model(settings, seed=0, transfer_dtype="float16")
    for c in clouds[:3]:
        model16.predict_mask(c, 0.5)
    full_walls = []
    for rep in range(2):
        for c in clouds:
            t0 = time.perf_counter()
            model16.predict_mask(c, 0.5)
            full_walls.append(time.perf_counter() - t0)
    full_ms = np.asarray(full_walls) * 1e3

    out = {
        "captures": len(clouds),
        "mean_cloud_points": int(np.mean([len(c) for c in clouds])),
        "depth_bytes_per_frame": int(depths[0].nbytes),
        "live_depth_wall_p50_ms": round(float(np.percentile(walls_ms, 50)), 2),
        "live_depth_wall_p90_ms": round(float(np.percentile(walls_ms, 90)), 2),
        "live_depth_device_ms": round(float(dev_ms), 2),
        "fullcloud_f16_wall_p50_ms": round(
            float(np.percentile(full_ms, 50)), 2
        ),
        "fullcloud_bytes_per_frame_f16": int(
            np.mean([len(c) for c in clouds]) * 3 * 2
        ),
    }
    print(json.dumps(out))
    (REPO / "benchmarks" / "replay_depth.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
