"""KNN subsystem tests: XLA paths and the Pallas kernel (interpret mode on
CPU) against the brute-force oracle, plus the gather and upsampling ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recognizer3d_tpu.ops.knn import (
    gather_neighbors,
    knn,
    knn_approximate,
    knn_argmin,
    knn_naive,
    knn_tiled,
    knn_window,
)
from recognizer3d_tpu.ops.knn_pallas import (
    invert_permutation,
    knn_pallas,
    morton_codes,
    morton_order,
)
from recognizer3d_tpu.ops.upsample import upsample


def _oracle(support, query, k):
    """float64 numpy brute force."""
    s = np.asarray(support, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    d2 = (
        np.sum(q**2, -1)[..., :, None]
        + np.sum(s**2, -1)[..., None, :]
        - 2 * np.einsum("bmd,bnd->bmn", q, s)
    )
    idx = np.argsort(d2, axis=-1)[..., :k]
    return idx, np.take_along_axis(d2, idx, axis=-1)


def _assert_matches_oracle(got_i, got_d, support, query, k, atol=1e-5):
    _, ref_d = _oracle(support, query, k)
    # distances must match the k smallest (ties can permute indices)
    np.testing.assert_allclose(
        np.sort(np.asarray(got_d), axis=-1), np.sort(ref_d, axis=-1), atol=atol
    )
    # returned indices must actually produce the returned distances
    s = np.asarray(support)
    q = np.asarray(query)
    for b in range(q.shape[0]):
        pts = s[b][np.asarray(got_i)[b]]  # (M, k, 3)
        d2 = np.sum((pts - q[b][:, None, :]) ** 2, axis=-1)
        np.testing.assert_allclose(
            d2, np.asarray(got_d)[b], atol=atol, rtol=1e-4
        )


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(0)
    support = rng.rand(2, 700, 3).astype(np.float32)
    query = rng.rand(2, 450, 3).astype(np.float32)
    return jnp.asarray(support), jnp.asarray(query)


class TestKnnXla:
    def test_naive_matches_oracle(self, clouds):
        s, q = clouds
        i, d = knn_naive(s, q, 16)
        _assert_matches_oracle(i, d, s, q, 16)

    def test_tiled_matches_naive(self, clouds):
        s, q = clouds
        i1, d1 = knn_tiled(s, q, 8, support_tile=128)
        _, d0 = knn_naive(s, q, 8)
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d0), atol=1e-5
        )

    def test_tiled_query_blocks(self, clouds):
        s, q = clouds
        i1, d1 = knn_tiled(s, q, 8, support_tile=128, query_block=100)
        _, d0 = knn_naive(s, q, 8)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-5)

    def test_approximate_high_recall(self, clouds):
        s, q = clouds
        i_a, d_a = knn_approximate(s, q, 8, recall_target=0.99)
        _, d0 = knn_naive(s, q, 8)
        # approximate: most neighbours match
        close = np.isclose(
            np.sort(np.asarray(d_a), -1), np.sort(np.asarray(d0), -1),
            atol=1e-5,
        )
        assert close.mean() > 0.9

    def test_dispatch_unknown(self, clouds):
        s, q = clouds
        with pytest.raises(ValueError):
            knn(s, q, 4, approach="bogus")

    def test_gather_neighbors(self):
        feats = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 6, 4))
        idx = jnp.asarray([[[0, 5], [2, 2]]])  # (1, 2, 2)
        out = gather_neighbors(feats, idx)
        assert out.shape == (1, 2, 2, 4)
        np.testing.assert_array_equal(np.asarray(out)[0, 0, 1], np.arange(20, 24))

    def test_gather_neighbors_big_batched_path(self):
        # B·N > 131072 routes to the dependency-chained per-batch gathers;
        # must stay exact (and NaN feature values must not corrupt indices
        # through the serialization token)
        rng = np.random.RandomState(0)
        B, N, M, K, C = 3, 50000, 40, 4, 2
        feats = rng.randn(B, N, C).astype(np.float32)
        feats[0, :, :] = np.nan  # poison the token source batch
        idx = rng.randint(0, N, (B, M, K)).astype(np.int32)
        out = np.asarray(gather_neighbors(jnp.asarray(feats), jnp.asarray(idx)))
        expected = np.stack([feats[b][idx[b]] for b in range(B)])
        np.testing.assert_array_equal(out, expected)


class TestKnnPallas:
    @pytest.mark.parametrize(
        "B,N,M,k",
        [(1, 600, 600, 8), (2, 900, 500, 32), (1, 200, 1000, 1)],
    )
    def test_matches_oracle(self, B, N, M, k):
        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
        q = s if M == N else jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
        i, d = knn_pallas(s, q, k, interpret=True)
        _assert_matches_oracle(i, d, s, q, k)

    def test_degenerate_all_identical(self):
        """Every point at the same location: all-zero distances, k distinct
        indices each (ties everywhere — the packed-key lane tiebreak)."""
        s = jnp.zeros((1, 640, 3), jnp.float32)
        i, d = knn_pallas(s, s, 8, interpret=True)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=0.0)
        ii = np.asarray(i)[0]
        assert all(len(set(row.tolist())) == 8 for row in ii), (
            "tied neighbours must still be k DISTINCT support points"
        )

    @pytest.mark.parametrize("mc", [256, 1024])
    def test_degenerate_duplicated_clusters(self, mc):
        """A handful of duplicated locations (zero-volume tile boxes, mass
        ties) stays exact under both merge widths."""
        rng = np.random.RandomState(11)
        locs = rng.rand(5, 3).astype(np.float32)
        pts = locs[rng.randint(0, 5, 900)]
        s = jnp.asarray(pts[None])
        i, d = knn_pallas(s, s, 16, interpret=True, merge_chunk=mc)
        _assert_matches_oracle(i, d, s, s, 16)

    def test_degenerate_collinear(self):
        """Axis-collinear cloud (degenerate bboxes in two dims)."""
        rng = np.random.RandomState(12)
        x = np.sort(rng.rand(1, 700).astype(np.float32), axis=1)
        pts = np.stack([x, np.zeros_like(x), np.zeros_like(x)], axis=-1)
        s = jnp.asarray(pts)
        i, d = knn_pallas(s, s, 8, interpret=True, merge_chunk=128)
        _assert_matches_oracle(i, d, s, s, 8)

    @pytest.mark.parametrize("mc", [128, 256, 512])
    def test_merge_chunk_matches_oracle(self, mc):
        """The sub-chunked extraction merge stays exact at every width."""
        rng = np.random.RandomState(7)
        s = jnp.asarray(rng.rand(1, 1500, 3).astype(np.float32))
        i, d = knn_pallas(s, s, 16, interpret=True, merge_chunk=mc)
        _assert_matches_oracle(i, d, s, s, 16)

    @pytest.mark.parametrize("mc", [1000, 300, 130])
    def test_merge_chunk_degrades_non_lane_multiples(self, mc):
        """Chunk widths that aren't 128-multiples round down to a valid
        divisor instead of spinning the trace-time degrade loop forever."""
        rng = np.random.RandomState(7)
        s = jnp.asarray(rng.rand(1, 1500, 3).astype(np.float32))
        i, d = knn_pallas(s, s, 16, interpret=True, merge_chunk=mc)
        _assert_matches_oracle(i, d, s, s, 16)

    def test_self_knn_includes_self(self):
        rng = np.random.RandomState(2)
        s = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32))
        i, d = knn_pallas(s, s, 4, interpret=True)
        # nearest neighbour of each point is itself at distance 0
        np.testing.assert_array_equal(
            np.asarray(i)[0, :, 0], np.arange(512)
        )
        np.testing.assert_allclose(np.asarray(d)[0, :, 0], 0.0, atol=1e-9)

    def test_clustered_cloud(self):
        """Spatially clustered data (the culling fast path) stays exact."""
        rng = np.random.RandomState(3)
        centers = rng.rand(8, 3) * 10
        pts = (
            centers[rng.randint(0, 8, 1200)]
            + rng.randn(1200, 3) * 0.05
        ).astype(np.float32)
        s = jnp.asarray(pts[None])
        i, d = knn_pallas(s, s, 16, interpret=True)
        _assert_matches_oracle(i, d, s, s, 16)

    @pytest.mark.parametrize("B,N,M", [(1, 700, 1500), (2, 1100, 300)])
    def test_argmin_pallas_matches_oracle(self, B, N, M):
        from recognizer3d_tpu.ops.knn_pallas import argmin_pallas

        rng = np.random.RandomState(7)
        s = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
        i, d = argmin_pallas(s, q, interpret=True)
        io, do = knn_argmin(s, q)
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(do), atol=1e-5, rtol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(io))

    def test_argmin_pallas_chunked_support(self, monkeypatch):
        """Supports beyond the VMEM cap run per-chunk with exact combining."""
        import recognizer3d_tpu.ops.knn_pallas as kp

        monkeypatch.setattr(kp, "_ARGMIN_MAX_SUPPORT", 256)
        rng = np.random.RandomState(11)
        s = jnp.asarray(rng.rand(1, 600, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 400, 3).astype(np.float32))
        i, d = kp.argmin_pallas(s, q, interpret=True)
        io, do = knn_argmin(s, q)
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(do), atol=1e-6, rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(io))

    def test_argmin_pallas_clustered(self):
        """Clustered data (the culling fast path) stays exact. Oracle in
        float64 — the XLA matmul expansion's f32 cancellation noise at
        coordinate magnitude ~5 exceeds the kernel's own error."""
        from recognizer3d_tpu.ops.knn_pallas import argmin_pallas

        rng = np.random.RandomState(8)
        centers = rng.rand(6, 3) * 5
        s_np = (
            centers[rng.randint(0, 6, 900)] + rng.randn(900, 3) * 0.03
        ).astype(np.float32)
        q_np = (
            centers[rng.randint(0, 6, 1300)] + rng.randn(1300, 3) * 0.03
        ).astype(np.float32)
        i, d = argmin_pallas(
            jnp.asarray(s_np[None]), jnp.asarray(q_np[None]), interpret=True
        )
        d2_exact = (
            (q_np.astype(np.float64)[:, None, :] - s_np[None].astype(np.float64))
            ** 2
        ).sum(-1)
        np.testing.assert_allclose(
            np.asarray(d)[0, :, 0], d2_exact.min(axis=1), atol=1e-6, rtol=1e-5
        )

    def test_morton_codes_locality(self):
        xyz = jnp.asarray(np.random.RandomState(0).rand(1, 256, 3).astype(np.float32))
        codes = np.asarray(morton_codes(xyz))[0]
        assert codes.min() >= 0
        # close points get close codes: perturb one point slightly
        xyz2 = xyz.at[0, 0].add(1e-4)
        codes2 = np.asarray(morton_codes(xyz2))[0]
        assert abs(int(codes[0]) - int(codes2[0])) < 1 << 12


class TestKnnWindow:
    """Morton-window approximate KNN (the FAISS-IVF analogue)."""

    def _recall(self, got_i, support, query, k):
        ref_i, _ = _oracle(support, query, k)
        hits = 0
        got = np.asarray(got_i)
        for b in range(got.shape[0]):
            for m in range(got.shape[1]):
                hits += len(set(got[b, m]) & set(ref_i[b, m]))
        return hits / ref_i.size

    def test_high_recall_uniform(self):
        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.rand(1, 9000, 3).astype(np.float32))
        idx, d2 = knn_window(s, s, 8, window_points=2048, query_block=128)
        assert idx.shape == (1, 9000, 8) and d2.shape == (1, 9000, 8)
        assert self._recall(idx, s, s, 8) > 0.9
        # self-neighbour at distance 0 must always be inside the window
        assert float(jnp.max(d2[..., 0])) == 0.0

    def test_returned_distances_consistent(self):
        rng = np.random.RandomState(2)
        s = jnp.asarray(rng.rand(2, 5000, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(2, 700, 3).astype(np.float32))
        idx, d2 = knn_window(s, q, 4, window_points=2048, query_block=64)
        sn = np.asarray(s)
        qn = np.asarray(q)
        for b in range(2):
            pts = sn[b][np.asarray(idx)[b]]
            ref = np.sum((pts - qn[b][:, None, :]) ** 2, axis=-1)
            np.testing.assert_allclose(np.asarray(d2)[b], ref, atol=1e-5)

    def test_small_query_big_support_dispatch_recall(self):
        """knn(approximate) with a big support but a tiny query must not
        route through the Morton window: the window's proportional curve
        mapping assumes query density ~ support density and its recall
        collapses when M << N. The dispatch sends small M·N to the full
        approx_min_k instead (ops/knn.py)."""
        rng = np.random.RandomState(7)
        s = jnp.asarray(rng.rand(1, 40_000, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 100, 3).astype(np.float32))
        idx, d2 = knn(s, q, 8, "approximate")
        assert idx.shape == (1, 100, 8)
        assert self._recall(idx, s, q, 8) > 0.9


    def test_small_support_falls_back(self):
        rng = np.random.RandomState(3)
        s = jnp.asarray(rng.rand(1, 600, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 100, 3).astype(np.float32))
        idx, d2 = knn_window(s, q, 4, window_points=2048)
        _assert_matches_oracle(idx, d2, s, q, 4)

    def test_presorted_contract(self):
        rng = np.random.RandomState(4)
        s = jnp.asarray(rng.rand(1, 6000, 3).astype(np.float32))
        order = morton_order(s)
        s_sorted = jnp.take_along_axis(s, order[..., None], axis=1)
        idx_p, d2_p = knn_window(
            s_sorted, s_sorted, 4, window_points=2048, presorted=True
        )
        idx_u, d2_u = knn_window(s, s, 4, window_points=2048)
        # map presorted results back to original order and compare distances
        inv = invert_permutation(order)
        d2_back = jnp.take_along_axis(d2_p, inv[..., None], axis=1)
        np.testing.assert_allclose(
            np.asarray(d2_back), np.asarray(d2_u), atol=1e-6
        )

    def test_presorted_dispatch_large_approximate(self, monkeypatch):
        """knn_presorted routes big-support 'approximate' to the presorted
        window search (indices into the GIVEN support order)."""
        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 2000)
        rng = np.random.RandomState(6)
        s = jnp.asarray(rng.rand(1, 4096, 3).astype(np.float32))
        order = morton_order(s)
        s_sorted = jnp.take_along_axis(s, order[..., None], axis=1)
        idx, d2 = knn_mod.knn_presorted(s_sorted, s_sorted, 4, "approximate")
        assert idx.shape == (1, 4096, 4)
        # the self-neighbour must be found (distance ~0 up to the matmul
        # formula's cancellation noise), with indices in the GIVEN order
        assert float(jnp.max(d2[..., 0])) < 1e-5
        self_found = np.any(
            np.asarray(idx[0]) == np.arange(4096)[:, None], axis=1
        )
        assert self_found.all()

    def test_dispatch_large_approximate(self, monkeypatch):
        import recognizer3d_tpu.ops.knn as knn_mod

        calls = {}
        orig = knn_mod.knn_window

        def spy(*a, **kw):
            calls["hit"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(knn_mod, "knn_window", spy)
        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 4000)
        monkeypatch.setattr(knn_mod, "_NAIVE_MAX_MN", 500_000)
        rng = np.random.RandomState(5)
        s = jnp.asarray(rng.rand(1, 5000, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 200, 3).astype(np.float32))
        knn_mod.knn(s, q, 4, "approximate")
        assert calls.get("hit")

    def test_dispatch_approximate_1nn_is_exact(self, monkeypatch):
        """approach='approximate' at k=1 routes to the exact 1-NN kernels
        (free accuracy: they beat a full-distance approx_min_k at every
        decoder shape — benchmarks/ablate_approx_routing.py)."""
        import recognizer3d_tpu.ops.knn as knn_mod

        calls = {}
        orig = knn_mod.knn_approximate

        def spy(*a, **kw):
            calls["approx"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(knn_mod, "knn_approximate", spy)
        rng = np.random.RandomState(7)
        s = jnp.asarray(rng.rand(1, 3000, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 500, 3).astype(np.float32))
        idx, d2 = knn_mod.knn(s, q, 1, "approximate")
        assert not calls.get("approx")
        ei, ed2 = knn_mod.knn_naive(s, q, 1)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ei))

        order = morton_order(s)
        s_sorted = jnp.take_along_axis(s, order[..., None], axis=1)
        qo = morton_order(q)
        q_sorted = jnp.take_along_axis(q, qo[..., None], axis=1)
        pi, pd2 = knn_mod.knn_presorted(s_sorted, q_sorted, 1, "approximate")
        assert not calls.get("approx")
        np.testing.assert_allclose(
            np.sort(np.asarray(pd2)[0, :, 0]),
            np.sort(np.asarray(ed2)[0, :, 0]),
            atol=1e-6,
        )

    def test_dispatch_small_query_avoids_window(self, monkeypatch):
        """Big support + tiny query must NOT use the window search (its
        proportional curve mapping breaks when M << N, collapsing recall);
        small M*N goes to the full approx_min_k instead."""
        import recognizer3d_tpu.ops.knn as knn_mod

        calls = {}
        orig = knn_mod.knn_window

        def spy(*a, **kw):
            calls["hit"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(knn_mod, "knn_window", spy)
        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 4000)
        rng = np.random.RandomState(5)
        s = jnp.asarray(rng.rand(1, 5000, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 200, 3).astype(np.float32))
        knn_mod.knn(s, q, 4, "approximate")
        assert not calls.get("hit")


class TestRecallGuard:
    """Runtime recall guard for the approximate default (VERDICT r4 #1):
    a session-first-cloud sampled-recall probe that widens the Morton
    window along ops/knn._WINDOW_LADDER, or demotes the session to the
    exact path when even the widest rung misses the target — so
    out-of-distribution geometry cannot silently under-recall."""

    @pytest.fixture(autouse=True)
    def _reset(self):
        import recognizer3d_tpu.ops.knn as knn_mod

        knn_mod.reset_window_guard()
        yield
        knn_mod.reset_window_guard()

    def test_noop_below_window_regime(self):
        import recognizer3d_tpu.ops.knn as knn_mod

        rng = np.random.RandomState(0)
        x = rng.randn(2048, 3).astype(np.float32)
        before = knn_mod.session_epoch()
        out = knn_mod.ensure_window_recall(x, 8)
        assert out["active"] is False
        assert knn_mod.session_epoch() == before
        assert not knn_mod.session_exact_fallback()

    def test_widens_to_first_passing_rung(self, monkeypatch):
        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 1000)
        monkeypatch.setattr(knn_mod, "_NAIVE_MAX_MN", 1000)
        fake = {512: 0.5, 1024: 0.95, 2048: 0.99}
        monkeypatch.setattr(
            knn_mod, "_window_recall_probe", lambda x, k, w: fake[w]
        )
        rng = np.random.RandomState(1)
        x = rng.randn(4096, 3).astype(np.float32)
        before = knn_mod.session_epoch()
        out = knn_mod.ensure_window_recall(
            x, 8, target=0.9, ladder=(512, 1024, 2048)
        )
        assert out["active"] and out["widened"]
        assert out["window_points"] == 1024  # first rung clearing 0.9
        assert out["recall"] == 0.95
        assert not out["exact_fallback"]
        assert knn_mod.session_window_points() == 1024
        assert knn_mod.session_epoch() == before + 1  # traced callers rekey

    def test_exact_fallback_when_ladder_exhausted(self, monkeypatch, caplog):
        import logging

        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 1000)
        monkeypatch.setattr(knn_mod, "_NAIVE_MAX_MN", 1000)
        monkeypatch.setattr(
            knn_mod, "_window_recall_probe", lambda x, k, w: 0.5
        )
        rng = np.random.RandomState(2)
        x = rng.randn(4096, 3).astype(np.float32)
        with caplog.at_level(logging.WARNING, logger="knn"):
            out = knn_mod.ensure_window_recall(
                x, 8, target=0.9, ladder=(512, 1024)
            )
        assert out["exact_fallback"]
        assert knn_mod.session_exact_fallback()
        assert any("Falling back to EXACT" in r.message for r in caplog.records)
        # the dispatch now routes "approximate" to the exact path: results
        # must match knn_naive bit-for-bit in the window regime
        s = jnp.asarray(rng.rand(1, 4096, 3).astype(np.float32))
        idx, d2 = knn_mod.knn(s, s, 4, "approximate")
        ei, ed2 = knn_mod.knn_naive(s, s, 4)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ei))
        # presorted dispatch too
        order = morton_order(s)
        ss = jnp.take_along_axis(s, order[..., None], axis=1)
        pi, _ = knn_mod.knn_presorted(ss, ss, 4, "approximate")
        pei, _ = knn_mod.knn_presorted(ss, ss, 4, "naive")
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(pei))

    def test_dispatch_uses_widened_window(self, monkeypatch):
        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 1000)
        monkeypatch.setattr(knn_mod, "_NAIVE_MAX_MN", 1000)
        monkeypatch.setattr(
            knn_mod, "_window_recall_probe",
            lambda x, k, w: 0.95 if w >= 1024 else 0.5,
        )
        rng = np.random.RandomState(3)
        knn_mod.ensure_window_recall(
            rng.randn(4096, 3).astype(np.float32), 8,
            target=0.9, ladder=(512, 1024),
        )
        seen = {}
        orig = knn_mod.knn_window

        def spy(*a, **kw):
            seen["window_points"] = kw.get("window_points")
            return orig(*a, **kw)

        monkeypatch.setattr(knn_mod, "knn_window", spy)
        s = jnp.asarray(rng.rand(1, 4096, 3).astype(np.float32))
        knn_mod.knn(s, s, 4, "approximate")
        assert seen["window_points"] == 1024

    def test_reset_restores_default_and_bumps_epoch(self, monkeypatch):
        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 1000)
        monkeypatch.setattr(knn_mod, "_NAIVE_MAX_MN", 1000)
        monkeypatch.setattr(
            knn_mod, "_window_recall_probe", lambda x, k, w: 0.99
        )
        rng = np.random.RandomState(4)
        knn_mod.ensure_window_recall(
            rng.randn(4096, 3).astype(np.float32), 8,
            target=0.9, ladder=(512,),
        )
        assert knn_mod.session_window_points() == 512
        ep = knn_mod.session_epoch()
        knn_mod.reset_window_guard()
        assert knn_mod.session_window_points() == knn_mod._WINDOW_LADDER[0]
        assert knn_mod.session_epoch() == ep + 1

    def test_effective_recall_meets_target_on_gaussian(self, monkeypatch):
        """Integration (real probes, no mocks): a gaussian cloud in the
        window regime ends with >= target EFFECTIVE recall — via a wider
        window or the exact fallback, whichever the probes demand. The
        64k-scale version of this check runs on the TPU
        (tests/test_tpu_kernels.py::test_recall_guard_gaussian_64k) and
        its guarded recall is a bench key."""
        import recognizer3d_tpu.ops.knn as knn_mod

        # put a 12k cloud in the window regime cheaply (CPU suite)
        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 4000)
        monkeypatch.setattr(knn_mod, "_NAIVE_MAX_MN", 4_000_000)
        rng = np.random.RandomState(5)
        x = rng.randn(12288, 3).astype(np.float32)
        out = knn_mod.ensure_window_recall(
            x, 16, target=0.9, ladder=(512, 2048)
        )
        assert out["active"]
        xj = jnp.asarray(x[None])
        effective = knn_mod.measure_recall(xj, xj, 16, "approximate")
        assert effective >= 0.9, (out, effective)


class TestRecallTelemetry:
    """Opt-in runtime recall logging for the approximate default
    (RECOGNIZER3D_KNN_RECALL=1, VERDICT r2 #5)."""

    def test_off_by_default(self, monkeypatch, caplog):
        import logging

        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.delenv("RECOGNIZER3D_KNN_RECALL", raising=False)
        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.rand(1, 500, 3).astype(np.float32))
        with caplog.at_level(logging.WARNING, logger="knn"):
            knn_mod.knn(s, s, 4, "approximate")
        assert not [r for r in caplog.records if "recall@" in r.message]

    def test_logs_recall_inside_jit(self, monkeypatch, caplog):
        import logging

        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.setenv("RECOGNIZER3D_KNN_RECALL", "1")
        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.rand(1, 500, 3).astype(np.float32))
        fn = jax.jit(lambda x: knn_mod.knn(x, x, 4, "approximate"))
        with caplog.at_level(logging.WARNING, logger="knn"):
            idx, d2 = fn(s)
            jax.block_until_ready(d2)
            jax.effects_barrier()
        lines = [r.getMessage() for r in caplog.records if "recall@4" in r.getMessage()]
        assert lines, caplog.records
        # on this path approx_min_k is near-exact -> recall ~= 1
        recall = float(lines[0].split("]: ")[1].split(" ")[0])
        assert recall > 0.99, lines[0]

    def test_logs_recall_on_window_path(self, monkeypatch, caplog):
        import logging

        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.setenv("RECOGNIZER3D_KNN_RECALL", "1")
        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 1000)
        monkeypatch.setattr(knn_mod, "_NAIVE_MAX_MN", 100_000)
        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.rand(1, 4096, 3).astype(np.float32))
        with caplog.at_level(logging.WARNING, logger="knn"):
            idx, d2 = knn_mod.knn(s, s, 4, "approximate")
            jax.block_until_ready(d2)
            jax.effects_barrier()
        lines = [r.getMessage() for r in caplog.records if "window" in r.getMessage()]
        assert lines, caplog.records
        recall = float(lines[0].split("]: ")[1].split(" ")[0])
        assert 0.5 < recall <= 1.0, lines[0]


class TestUpsample:
    def test_nni_copies_nearest(self):
        s = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
        feats = jnp.asarray([[[10.0, 20.0], [30.0, 40.0]]])
        q = jnp.asarray([[[0.1, 0, 0], [0.9, 0, 0], [2.0, 0, 0]]])
        out = upsample(feats, s, q, approach="nni")
        np.testing.assert_array_equal(
            np.asarray(out), [[[10, 20], [30, 40], [30, 40]]]
        )

    def test_idw_weighting(self):
        s = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
        feats = jnp.asarray([[[0.0], [10.0]]])
        q = jnp.asarray([[[0.25, 0, 0]]])
        out = upsample(feats, s, q, approach="idw", n_neighbors=2)
        # weights ~ 1/d: d0=0.25, d1=0.75 -> w0=0.75, w1=0.25 -> 2.5
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 2.5, rtol=1e-3)

    def test_isdw_weighting(self):
        s = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
        feats = jnp.asarray([[[0.0], [10.0]]])
        q = jnp.asarray([[[0.25, 0, 0]]])
        out = upsample(feats, s, q, approach="isdw", n_neighbors=2)
        # weights ~ 1/d²: 16 vs 16/9 -> value = 10*(1/9)/(1+1/9) = 1.0
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 1.0, rtol=1e-3)

    def test_none_identity(self):
        feats = jnp.asarray(np.random.randn(1, 5, 3).astype(np.float32))
        out = upsample(feats, None, None, approach="none")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))


class TestMeasureRecall:
    """Public recall measurement entry (ops/knn.measure_recall) — feeds
    bench.py's knn_window_recall_64k and Model.evaluate's sampled check
    (VERDICT r3 #6)."""

    def test_exact_approach_recall_is_one(self):
        import recognizer3d_tpu.ops.knn as knn_mod

        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.rand(1, 400, 3).astype(np.float32))
        assert knn_mod.measure_recall(s, s, 4, "naive") == pytest.approx(1.0)

    def test_approximate_small_support_near_exact(self):
        import recognizer3d_tpu.ops.knn as knn_mod

        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.rand(1, 600, 3).astype(np.float32))
        # below _WINDOW_MIN_SUPPORT the approximate path is full-distance
        # approx_min_k -> near-perfect recall
        assert knn_mod.measure_recall(s, s, 4, "approximate") > 0.99


class TestWindowGradient:
    """The reference's DEFAULT settings are knn="approximate"; above the
    window threshold training routes d2 through knn_window, so the window
    path must stay differentiable (dynamic_slice + approx_min_k both
    carry JVPs). Gradient checked against the exact path on the k
    nearest distances."""

    def test_window_d2_grad_matches_exact(self):
        import recognizer3d_tpu.ops.knn as knn_mod

        rng = np.random.RandomState(0)
        s = jnp.asarray(rng.rand(1, 256, 3).astype(np.float32))

        def loss_window(x):
            _, d2 = knn_mod.knn_window(
                x, x, 4, window_points=256, query_block=32, block_group=2
            )
            return jnp.sum(d2)

        def loss_exact(x):
            _, d2 = knn_mod.knn_naive(x, x, 4)
            return jnp.sum(d2)

        gw = jax.grad(loss_window)(s)
        ge = jax.grad(loss_exact)(s)
        assert bool(jnp.isfinite(gw).all())
        # window covers the whole cloud here -> recall 1 (approx_min_k's
        # aggregate pass is exact at this size), so gradients must agree
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(ge), rtol=1e-4, atol=1e-5
        )

    def test_window_grad_finite_with_true_windows(self):
        import recognizer3d_tpu.ops.knn as knn_mod

        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32))

        def loss(x):
            _, d2 = knn_mod.knn_window(
                x, x, 4, window_points=64, query_block=32, block_group=2
            )
            return jnp.sum(d2)

        g = jax.grad(loss)(s)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0.0
