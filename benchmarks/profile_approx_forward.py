"""Op-level profiler trace of the approximate 64k forward (r4 method:
jax.profiler → trace.json.gz → per-op exclusive durations). Used by the
r5 small-op-tail investigation (VERDICT r4 #7): list every device op,
aggregate per iteration, and split head ops vs the <0.5 ms tail.

Run on the TPU; prints a table + writes approx_forward_trace_ops.json.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parent.parent
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from recognizer3d_tpu import Model, RandLANetSettings

    rng = np.random.RandomState(0)
    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="approximate", n_points=65536,
        n_neighbors=32, decimation=4,
    )
    model = Model(settings, seed=0)
    x = jnp.asarray(rng.randn(1, 65536, 3).astype(np.float32) * 0.2)
    perm = jnp.asarray(rng.permutation(65536).astype(np.int32))

    def step():
        return float(jnp.max(model._forward_jit(model.variables, x, perm)))

    step()  # compile
    step()

    trace_dir = "/tmp/jaxtrace_r5"
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(ITERS):
        step()
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace written under {trace_dir}"
    with gzip.open(files[0]) as f:
        t = json.load(f)
    events = t["traceEvents"]

    # device-op track: pick the pid/tid group whose events carry XLA op
    # names (heuristic: thread name contains "XLA Ops" or the largest
    # total-duration complete-event track not on the host python side)
    tracks = defaultdict(float)
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in (
            "thread_name", "process_name"
        ):
            names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            tracks[(e.get("pid"), e.get("tid"))] += e["dur"]

    def track_label(k):
        return names.get(k, "") or names.get((k[0], None), "")

    op_tracks = [
        k
        for k in tracks
        if "XLA Op" in track_label(k) or "Steps" not in track_label(k)
    ]
    # robust fallback: aggregate by op name across ALL complete events
    # that look like device ops (have "run_id" or occur on tracks whose
    # label mentions TensorFlow/XLA Ops); simplest reliable cut — use
    # the single busiest track
    busiest = max(tracks, key=lambda k: tracks[k])
    per_op = defaultdict(float)
    count = defaultdict(int)
    for e in events:
        if (
            e.get("ph") == "X"
            and "dur" in e
            and (e.get("pid"), e.get("tid")) == busiest
        ):
            per_op[e["name"]] += e["dur"]
            count[e["name"]] += 1
    per_iter = {k: v / ITERS / 1e3 for k, v in per_op.items()}  # ms
    total = sum(per_iter.values())
    rows = sorted(per_iter.items(), key=lambda kv: -kv[1])
    print(
        f"busiest track: {track_label(busiest)}  total {total:.2f} "
        f"ms/iter over {len(rows)} distinct ops"
    )
    head = [(k, v) for k, v in rows if v >= 0.5]
    tail = [(k, v) for k, v in rows if v < 0.5]
    print(f"\nops >= 0.5 ms/iter ({sum(v for _, v in head):.2f} ms):")
    for k, v in head:
        print(f"  {v:7.3f} ms  x{count[k] // ITERS:<3d} {k[:90]}")
    print(
        f"\nops < 0.5 ms/iter: {len(tail)} ops, "
        f"{sum(v for _, v in tail):.2f} ms total:"
    )
    for k, v in tail[:40]:
        print(f"  {v:7.3f} ms  x{count[k] // ITERS:<3d} {k[:90]}")
    (REPO / "benchmarks" / "approx_forward_trace_ops.json").write_text(
        json.dumps(
            {
                "total_ms_per_iter": total,
                "head": head,
                "tail": tail,
                "counts": {k: count[k] // ITERS for k in per_op},
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
