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
