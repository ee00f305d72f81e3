"""Chunked large-cloud eval forward (models/large.py) parity vs the flax
module, exercised at small sizes with small chunks on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recognizer3d_tpu.models.large import forward_eval_large
from recognizer3d_tpu.models.randlanet import RandLANet
from recognizer3d_tpu.models.settings import RandLANetSettings


@pytest.fixture(scope="module")
def small_setup():
    settings = RandLANetSettings(
        n_classes=2,
        n_points=256,
        n_features=0,
        n_neighbors=4,
        decimation=2,
        layer_sizes=[4, 8, 16, 32],
        knn="naive",
    )
    module = RandLANet(settings)
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    perm = jnp.asarray(rng.permutation(256).astype(np.int32))
    variables = module.init(jax.random.PRNGKey(0), inputs, perm)
    return settings, module, variables, inputs, perm


class TestChunkedForward:
    def test_matches_module_eval(self, small_setup):
        settings, module, variables, inputs, perm = small_setup
        ref = module.apply(variables, inputs, perm, train=False)
        for chunk in (64, 100, 256):
            got = forward_eval_large(
                variables, settings, inputs, perm, chunk=chunk
            )
            assert got.shape == ref.shape
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3,
                err_msg=f"chunk={chunk}",
            )

    def test_jittable(self, small_setup):
        settings, _module, variables, inputs, perm = small_setup
        f = jax.jit(
            lambda v, x, p: forward_eval_large(v, settings, x, p, chunk=64)
        )
        out = f(variables, inputs, perm)
        assert np.isfinite(np.asarray(out)).all()

    def test_facade_routes_large_forward(self, small_setup, monkeypatch):
        """The facade's eval forward must route through the chunked path
        once the cloud passes the size threshold."""
        import recognizer3d_tpu.models.facade as facade_mod
        from recognizer3d_tpu.models.facade import Model

        monkeypatch.setattr(facade_mod, "_LARGE_FORWARD_MIN", 200)
        settings, _module, variables, inputs, perm = small_setup
        model = Model(settings, weights=jax.device_get(variables))
        called = {}
        import recognizer3d_tpu.models.large as large_mod

        orig = large_mod.forward_eval_large

        def spy(*a, **kw):
            called["hit"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(facade_mod, "forward_eval_large", spy)
        out = model._forward_jit(model.variables, inputs, perm)
        assert called.get("hit")
        ref = model.module.apply(model.variables, inputs, perm, train=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
        )


class TestFusedLevels:
    """Whole-level fused-LFA routing in the large forward (r5): levels
    whose (k, half) geometry the lane kernels support run unchunked
    through ops/lfa_pallas — parity vs the chunked functional path."""

    def _setup(self):
        settings = RandLANetSettings(
            n_classes=2,
            n_points=512,
            n_features=0,
            n_neighbors=16,
            decimation=4,
            layer_sizes=[16, 64],
            knn="naive",
        )
        module = RandLANet(settings)
        rng = np.random.RandomState(1)
        inputs = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32))
        perm = jnp.asarray(rng.permutation(512).astype(np.int32))
        variables = module.init(jax.random.PRNGKey(0), inputs, perm)
        return settings, variables, inputs, perm

    def test_fused_levels_match_chunked(self, monkeypatch):
        from recognizer3d_tpu.models import randlanet as rl
        import recognizer3d_tpu.models.large as large_mod

        settings, variables, inputs, perm = self._setup()
        chunked = forward_eval_large(
            variables, settings, inputs, perm, chunk=128
        )
        calls = []
        orig = large_mod._lfa_fused_level
        monkeypatch.setattr(
            large_mod,
            "_lfa_fused_level",
            lambda *a, **kw: calls.append(1) or orig(*a, **kw),
        )
        monkeypatch.setattr(rl, "FORCE_FUSED_LFA_INTERPRET", True)
        fused = forward_eval_large(
            variables, settings, inputs, perm, chunk=128
        )
        # level 0 (half=8, L=256) AND level 1 (half=32, k=16 -> L=1024,
        # the full-kron corner) both routed through the kernels
        assert len(calls) == 2
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(chunked), atol=2e-4, rtol=1e-3
        )

    def test_memory_gate_falls_back_to_chunked(self, monkeypatch):
        from recognizer3d_tpu.models import randlanet as rl
        import recognizer3d_tpu.models.large as large_mod

        settings, variables, inputs, perm = self._setup()
        monkeypatch.setattr(rl, "FORCE_FUSED_LFA_INTERPRET", True)
        monkeypatch.setattr(
            large_mod, "_FUSED_LEVEL_MAX_GATHER_BYTES", 0
        )
        calls = []
        orig = large_mod._lfa_fused_level
        monkeypatch.setattr(
            large_mod,
            "_lfa_fused_level",
            lambda *a, **kw: calls.append(1) or orig(*a, **kw),
        )
        out = forward_eval_large(
            variables, settings, inputs, perm, chunk=128
        )
        assert calls == []  # gate forces the chunked path
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.tpu
def test_fused_levels_compiled_match_chunked():
    """Compiled Mosaic whole-level kernels inside the large forward on
    the real TPU (reduced size), vs the chunked path (env-disabled
    fused)."""
    import os

    import recognizer3d_tpu.models.large as large_mod

    if jax.devices()[0].platform != "tpu":
        pytest.skip("real TPU not available")
    settings = RandLANetSettings(
        n_classes=2, n_points=32768, n_features=0, n_neighbors=32,
        decimation=4, knn="naive",
    )
    module = RandLANet(settings)
    rng = np.random.RandomState(2)
    inputs = jnp.asarray(rng.rand(1, 32768, 3).astype(np.float32))
    perm = jnp.asarray(rng.permutation(32768).astype(np.int32))
    variables = module.init(jax.random.PRNGKey(0), inputs, perm)
    fused = forward_eval_large(
        variables, settings, inputs, perm, chunk=16384
    )
    os.environ["RECOGNIZER3D_FUSED_LFA"] = "0"
    try:
        chunked = forward_eval_large(
            variables, settings, inputs, perm, chunk=16384
        )
    finally:
        os.environ.pop("RECOGNIZER3D_FUSED_LFA", None)
    f, u = np.asarray(fused), np.asarray(chunked)
    np.testing.assert_allclose(f, u, rtol=3e-3, atol=3e-3)
    assert np.mean(np.abs(f - u)) < 2e-4


class TestSlicedGathers:
    """Locality-sliced gathers inside the fused level (r5): when the
    self-KNN ran through the Morton-window search, chunk indices are
    confined to [c0 - w, c0 + chunk + w), so gathering from a dynamic
    table slice must be BIT-identical to the flat gather."""

    def test_sliced_equals_flat(self, monkeypatch):
        import recognizer3d_tpu.models.large as large_mod
        import recognizer3d_tpu.ops.knn as knn_mod
        from recognizer3d_tpu.models import randlanet as rl
        from recognizer3d_tpu.ops.knn_pallas import morton_order

        # a 16k gaussian level: window regime active at DEFAULT
        # thresholds (16384 > 12288, 16384^2 > 64e6); w=4096, chunk=2048
        # -> span 10240 < n exercises real partial slices
        knn_mod.reset_window_guard()
        rng = np.random.RandomState(3)
        n, h = 16384, 8
        xyz = rng.randn(n, 3).astype(np.float32) * 0.2
        order = np.asarray(morton_order(jnp.asarray(xyz[None]))[0])
        xyz = jnp.asarray(xyz[order])
        feats = jnp.asarray(rng.randn(n, 2 * h).astype(np.float32) * 0.1)

        # one encoder block's params via module init at a small size
        settings = RandLANetSettings(
            n_classes=2, n_points=512, n_features=0, n_neighbors=16,
            decimation=4, layer_sizes=[16, 64], knn="approximate",
        )
        module = RandLANet(settings)
        perm = jnp.asarray(rng.permutation(512).astype(np.int32))
        variables = module.init(
            jax.random.PRNGKey(0),
            jnp.asarray(rng.rand(1, 512, 3).astype(np.float32)),
            perm,
        )
        # encoder_1 has in=2h? encoder_0: mlp1 in = 8 features. Use
        # encoder_0 with feats width matching its init (8 channels).
        p = variables["params"]["encoder_0"]
        s = variables["batch_stats"]["encoder_0"]
        feats = feats[:, :8]

        monkeypatch.setattr(rl, "FORCE_FUSED_LFA_INTERPRET", True)
        sliced = large_mod._lfa_fused_level(
            p, s, xyz, feats, 16, "approximate", 2048
        )
        # force the flat-gather formulation (same KNN, same kernels)
        monkeypatch.setattr(
            knn_mod, "window_regime_active", lambda n_: False
        )
        flat = large_mod._lfa_fused_level(
            p, s, xyz, feats, 16, "approximate", 2048
        )
        np.testing.assert_array_equal(
            np.asarray(sliced), np.asarray(flat)
        )


def test_large_sorted_flow_hook_bit_identical(small_setup, monkeypatch):
    """RECOGNIZER3D_SORTED_FLOW=0 must restore the r3-style per-level
    sorts in the large path too, bit-identically (the same invariant the
    module path pins in test_model_facade.py::TestSortedFlowHook)."""
    settings, _module, variables, inputs, perm = small_setup
    monkeypatch.setenv("RECOGNIZER3D_SORTED_FLOW", "1")
    a = np.asarray(
        forward_eval_large(variables, settings, inputs, perm, chunk=64)
    )
    monkeypatch.setenv("RECOGNIZER3D_SORTED_FLOW", "0")
    b = np.asarray(
        forward_eval_large(variables, settings, inputs, perm, chunk=64)
    )
    np.testing.assert_array_equal(a, b)
