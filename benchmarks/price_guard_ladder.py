"""Price the recall-guard window ladder (VERDICT r4 #1: "widen, priced
in RESULTS").

For each ladder rung (4096 / 8192 / 16384) at the 64k L0 shape:
- standalone window-KNN cost (two-point device timing);
- sampled recall on the bench's isotropic-gaussian worst case;
- full approximate-64k forward cost with the session window forced to
  that rung (the end-to-end price a widened session pays).

Run on the TPU. Output: benchmarks/guard_ladder_pricing.json.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parent.parent


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks._timing import device_time
    from recognizer3d_tpu import Model, RandLANetSettings
    from recognizer3d_tpu.ops import knn as knn_mod

    rng = np.random.RandomState(0)
    x = rng.randn(1, 65536, 3).astype(np.float32) * 0.2
    xj = jnp.asarray(x)
    results = {"device": str(jax.devices()[0]), "rungs": {}}

    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="approximate", n_points=65536,
        n_neighbors=32, decimation=4,
    )
    perm = jnp.asarray(rng.permutation(65536).astype(np.int32))

    knn_mod.reset_window_guard()
    try:
        for w in knn_mod._WINDOW_LADDER:
            entry = {}
            # standalone window search at this rung
            def knn_step(c, xx):
                idx, d2 = knn_mod.knn_window(
                    xx + c * 1e-12, xx + c * 1e-12, 32, window_points=w
                )
                return jnp.float32(jnp.sum(d2))

            entry["knn_64k_ms"] = device_time(knn_step, (xj,), iters=8) * 1e3
            # gaussian worst-case recall at this rung
            res = knn_mod.knn_window(xj, xj, 32, window_points=w)
            entry["recall_gaussian_64k"] = round(
                float(knn_mod.sampled_recall(xj, xj, 32, res)), 4
            )
            # end-to-end forward with the session window forced here
            knn_mod._session_guard["window_points"] = w
            knn_mod._session_guard["epoch"] += 1
            model = Model(settings, seed=0)

            def fwd(c, variables, xx, p):
                logits = model._forward_jit(variables, xx + c * 1e-12, p)
                return jnp.float32(jnp.max(logits))

            entry["forward_64k_ms"] = (
                device_time(fwd, (model.variables, xj, perm), iters=8) * 1e3
            )
            results["rungs"][str(w)] = entry

        # the fallback price: the exact forward (already a bench headline)
        knn_mod.reset_window_guard()
        knn_mod._session_guard["exact_fallback"] = True
        knn_mod._session_guard["epoch"] += 1
        model = Model(settings, seed=0)

        def fwd_exact(c, variables, xx, p):
            logits = model._forward_jit(variables, xx + c * 1e-12, p)
            return jnp.float32(jnp.max(logits))

        results["exact_fallback_forward_64k_ms"] = (
            device_time(fwd_exact, (model.variables, xj, perm), iters=6)
            * 1e3
        )
    finally:
        knn_mod.reset_window_guard()

    out = REPO / "benchmarks" / "guard_ladder_pricing.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
