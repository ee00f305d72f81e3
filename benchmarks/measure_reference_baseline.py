"""One-time measurement of the CPU PyTorch reference baseline.

The reference publishes no benchmark numbers (SURVEY.md §6), so per
BASELINE.md the CPU PyTorch reference itself must be measured: this script
imports the reference implementation from /root/reference (faiss replaced by
an exact numpy stand-in — see tests/_faiss_stub.py), runs

  (a) single-frame ``Model.predict`` on a ``data/mock`` cloud at the app
      config (n_points=2500, K=32, knn="naive" — reference train.py:50-51),
  (b) a raw 64k-point forward pass (the BASELINE.json primary-metric size),

and writes the timings to ``benchmarks/baseline_cpu.json`` for ``bench.py``
to compare against. Run on the same host as the bench for a fair CPU
baseline.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
OUT = REPO / "benchmarks" / "baseline_cpu.json"


def install_faiss_stub():
    sys.path.insert(0, str(REPO))
    from tests._faiss_stub import install

    install()


def main():
    assert REFERENCE.exists(), "reference checkout not available"
    install_faiss_stub()
    sys.path.insert(0, str(REFERENCE))
    import torch

    torch.manual_seed(0)
    from randlanet.utils.modules import RandLANet, RandLANetSettings

    results = {"host": "cpu-torch-reference", "timestamp": time.time()}

    # (a) app-config predict on a mock cloud ---------------------------
    from randlanet.model import Model

    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="naive", n_points=2500,
        n_neighbors=32, decimation=4,
    )
    model = Model(settings, use_gpu=False)
    mock = sorted((REFERENCE / "data" / "mock").glob("*_data.npy"))
    cloud = np.load(mock[0])
    print(f"mock cloud: {cloud.shape}", flush=True)
    model.predict(cloud)  # warmup
    times = []
    for _ in range(10):
        t = time.perf_counter()
        model.predict(cloud)
        times.append(time.perf_counter() - t)
    predict_p50 = float(np.median(times))
    results["predict_p50_ms_appconfig"] = predict_p50 * 1000
    results["predict_frames_per_sec_appconfig"] = 1.0 / predict_p50
    print(f"reference predict p50: {predict_p50*1000:.1f} ms", flush=True)

    # (b) 64k-point forward --------------------------------------------
    settings64 = RandLANetSettings(
        n_classes=2, n_features=0, knn="naive", n_points=65536,
        n_neighbors=32, decimation=4,
    )
    net = RandLANet(settings64, torch.device("cpu")).eval()
    x = torch.from_numpy(
        np.random.RandomState(0).randn(1, 65536, 3).astype(np.float32) * 0.2
    )
    with torch.no_grad():
        t = time.perf_counter()
        net(x)
        warm = time.perf_counter() - t
        print(f"64k forward (warmup): {warm:.1f} s", flush=True)
        times = []
        for _ in range(3):
            t = time.perf_counter()
            net(x)
            times.append(time.perf_counter() - t)
    fwd = float(np.median(times))
    results["forward_64k_sec"] = fwd
    results["clouds_per_sec_64k"] = 1.0 / fwd
    print(f"reference 64k forward: {fwd:.2f} s", flush=True)

    OUT.write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
