"""Compiled-kernel tests on the REAL TPU (Mosaic, interpret=False).

The CI suite exercises the pallas kernels in interpret mode on CPU;
Mosaic-specific behaviour (layouts, masked-lane tricks, DMA paths) is
only visible compiled. These reduced-size oracle tests catch kernel
regressions without a full benchmark run:

    R3D_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

(~3 min: one Mosaic compile per kernel variant at small N.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("real TPU not available")


def _oracle(support, query, k):
    s = np.asarray(support, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    d2 = (
        np.sum(q**2, -1)[..., :, None]
        + np.sum(s**2, -1)[..., None, :]
        - 2 * np.einsum("bmd,bnd->bmn", q, s)
    )
    idx = np.argsort(d2, axis=-1)[..., :k]
    return idx, np.take_along_axis(d2, idx, axis=-1)


class TestCompiledKernels:
    def test_knn_pallas_exact_vs_oracle(self):
        _require_tpu()
        from recognizer3d_tpu.ops.knn_pallas import knn_pallas

        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.rand(1, 4096, 3).astype(np.float32))
        idx, d2 = knn_pallas(s, s, 32, interpret=False)
        _, ref_d2 = _oracle(s, s, 32)
        np.testing.assert_allclose(
            np.sort(np.asarray(d2), -1), np.sort(ref_d2, -1), atol=1e-5
        )
        # indices reproduce distances (exactness, not just distance match)
        pts = np.asarray(s)[0][np.asarray(idx)[0]]
        check = np.sum((pts - np.asarray(s)[0][:, None, :]) ** 2, -1)
        np.testing.assert_allclose(check, np.asarray(d2)[0], atol=1e-5)

    def test_knn_pallas_merge_chunk_compiled(self):
        """The sub-chunked merge (dynamic lane slicing) compiles and stays
        exact under Mosaic."""
        _require_tpu()
        from recognizer3d_tpu.ops.knn_pallas import knn_pallas

        rng = np.random.RandomState(5)
        s = jnp.asarray(rng.rand(1, 4096, 3).astype(np.float32))
        for mc in (128, 256):
            idx, d2 = knn_pallas(s, s, 32, interpret=False, merge_chunk=mc)
            pts = np.asarray(s)[0][np.asarray(idx)[0]]
            check = np.sum((pts - np.asarray(s)[0][:, None, :]) ** 2, -1)
            np.testing.assert_allclose(check, np.asarray(d2)[0], atol=1e-5)
            _, ref_d2 = _oracle(s, s, 32)
            np.testing.assert_allclose(
                np.sort(np.asarray(d2), -1), np.sort(ref_d2, -1), atol=1e-5
            )
        # wide tile (11-bit lane field) + sub-chunked merge
        for mc in (2048, 256):
            idx, d2 = knn_pallas(
                s, s, 32, interpret=False, support_tile=2048, merge_chunk=mc
            )
            pts = np.asarray(s)[0][np.asarray(idx)[0]]
            check = np.sum((pts - np.asarray(s)[0][:, None, :]) ** 2, -1)
            np.testing.assert_allclose(check, np.asarray(d2)[0], atol=1e-5)
            _, ref_d2 = _oracle(s, s, 32)
            np.testing.assert_allclose(
                np.sort(np.asarray(d2), -1), np.sort(ref_d2, -1), atol=1e-5
            )

    def test_knn_pallas_hbm_variant(self):
        """Support past the VMEM limit exercises the HBM tile-DMA path."""
        _require_tpu()
        import recognizer3d_tpu.ops.knn_pallas as kp

        rng = np.random.RandomState(1)
        n = 8192
        s = jnp.asarray(rng.rand(1, n, 3).astype(np.float32))
        q = jnp.asarray(np.asarray(s)[:, rng.choice(n, 1024, False)])
        # force the HBM branch at a small size
        old = kp._VMEM_SUPPORT_LIMIT_BYTES
        kp._VMEM_SUPPORT_LIMIT_BYTES = 64 * 1024
        try:
            idx, d2 = kp.knn_pallas(s, q, 16, interpret=False)
        finally:
            kp._VMEM_SUPPORT_LIMIT_BYTES = old
        _, ref_d2 = _oracle(s, q, 16)
        np.testing.assert_allclose(
            np.sort(np.asarray(d2), -1), np.sort(ref_d2, -1), atol=1e-5
        )

    def test_argmin_pallas_vs_oracle(self):
        _require_tpu()
        from recognizer3d_tpu.ops.knn_pallas import argmin_pallas

        rng = np.random.RandomState(2)
        s = jnp.asarray(rng.rand(1, 2048, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 8192, 3).astype(np.float32))
        idx, d2 = argmin_pallas(s, q, interpret=False)
        _, ref_d2 = _oracle(s, q, 1)
        np.testing.assert_allclose(
            np.asarray(d2), ref_d2, atol=1e-5
        )

    def test_recall_guard_gaussian_64k(self):
        """VERDICT r4 #1 'done' criterion: a gaussian 64k cloud — the
        worst case for Morton-window locality (r4 measured 0.8766 sampled
        recall at the tuned window) — must end the session at >= 0.9
        EFFECTIVE recall once the runtime guard has acted (widened window
        or exact fallback)."""
        _require_tpu()
        from recognizer3d_tpu.ops import knn as knn_mod

        knn_mod.reset_window_guard()
        try:
            rng = np.random.RandomState(0)
            x = rng.randn(65536, 3).astype(np.float32) * 0.2
            out = knn_mod.ensure_window_recall(x, 32, target=0.9)
            assert out["active"], out
            # effective recall of the post-guard routed dispatch (exact
            # fallback measures 1.0 by construction)
            xj = jnp.asarray(x[None])
            eff = knn_mod.measure_recall(xj, xj, 32, "approximate")
            assert eff >= 0.9, (out, eff)
        finally:
            knn_mod.reset_window_guard()

    def test_model_forward_finite(self):
        """A small compiled end-to-end forward returns finite logits."""
        _require_tpu()
        from recognizer3d_tpu.models.facade import Model
        from recognizer3d_tpu.models.settings import RandLANetSettings

        settings = RandLANetSettings(
            n_classes=2, n_features=0, knn="naive", n_points=2500,
            n_neighbors=32, decimation=4,
        )
        model = Model(settings, seed=0)
        rng = np.random.RandomState(0)
        conf = model.predict(
            rng.randn(2500, 3).astype(np.float32) * 0.2,
            prepostprocess=False,
        )
        assert np.isfinite(conf).all()
        np.testing.assert_allclose(conf.sum(0), 1.0, atol=1e-3)
