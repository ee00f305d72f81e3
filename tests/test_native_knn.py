"""C++ KD-tree exact-KNN kernel tests (build + correctness + jit bridge)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recognizer3d_tpu.ops import knn_cpp
from recognizer3d_tpu.ops.knn import knn, knn_naive

pytestmark = pytest.mark.skipif(
    not knn_cpp.native_available(), reason="native kernel not buildable"
)


class TestNativeKdtree:
    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        s = rng.rand(2, 2000, 3).astype(np.float32)
        q = rng.rand(2, 700, 3).astype(np.float32)
        i, d = knn_cpp.knn_kdtree_host(s, q, 16)
        _, d_ref = knn_naive(jnp.asarray(s), jnp.asarray(q), 16)
        np.testing.assert_allclose(
            np.sort(d, -1), np.sort(np.asarray(d_ref), -1), atol=1e-5
        )
        assert i.dtype == np.int32 and d.dtype == np.float32

    def test_indices_consistent_with_distances(self):
        rng = np.random.RandomState(1)
        s = rng.rand(1, 500, 3).astype(np.float32)
        q = rng.rand(1, 100, 3).astype(np.float32)
        i, d = knn_cpp.knn_kdtree_host(s, q, 8)
        pts = s[0][i[0]]  # (M, k, 3)
        d2 = np.sum((pts - q[0][:, None, :]) ** 2, axis=-1)
        np.testing.assert_allclose(d2, d[0], atol=1e-6)
        # ascending
        assert (np.diff(d[0], axis=-1) >= -1e-7).all()

    def test_k_exceeds_n_pads_last(self):
        s = np.zeros((1, 3, 3), dtype=np.float32)
        s[0, 1, 0] = 1.0
        s[0, 2, 0] = 2.0
        q = np.zeros((1, 1, 3), dtype=np.float32)
        i, d = knn_cpp.knn_kdtree_host(s, q, 5)
        # 3 real neighbours, last two repeat the 3rd
        np.testing.assert_array_equal(i[0, 0, 3:], [i[0, 0, 2]] * 2)

    def test_jit_callback_path(self):
        rng = np.random.RandomState(2)
        s = jnp.asarray(rng.rand(1, 800, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(1, 300, 3).astype(np.float32))
        i, d = jax.jit(lambda s, q: knn(s, q, 8, approach="kdtree"))(s, q)
        _, d_ref = knn_naive(s, q, 8)
        np.testing.assert_allclose(
            np.sort(np.asarray(d), -1),
            np.sort(np.asarray(d_ref), -1),
            atol=1e-5,
        )

    def test_selfknn_first_is_self(self):
        rng = np.random.RandomState(3)
        s = rng.rand(1, 400, 3).astype(np.float32)
        i, d = knn_cpp.knn_kdtree_host(s, s, 4)
        np.testing.assert_array_equal(i[0, :, 0], np.arange(400))
        np.testing.assert_allclose(d[0, :, 0], 0.0, atol=1e-9)

    def test_invalid_inputs_raise(self):
        """The ctypes boundary validates what C++ cannot fail loudly on:
        empty support, k < 1, and mismatched batch sizes would otherwise
        read/write out of bounds in the native kernel."""
        rng = np.random.RandomState(4)
        q = rng.rand(2, 10, 3).astype(np.float32)
        with pytest.raises(ValueError, match="empty"):
            knn_cpp.knn_kdtree_host(np.zeros((2, 0, 3), np.float32), q, 3)
        with pytest.raises(ValueError, match="k must be"):
            knn_cpp.knn_kdtree_host(q, q, 0)
        with pytest.raises(ValueError, match="batch mismatch"):
            knn_cpp.knn_kdtree_host(q, q[:1], 3)

    def test_heapsort_output_ascending(self):
        """Distances per query row come back ascending (the in-place
        heap-sort replacing the old per-query permutation sort)."""
        rng = np.random.RandomState(5)
        s = rng.rand(1, 500, 3).astype(np.float32)
        q = rng.rand(1, 200, 3).astype(np.float32)
        _i, d = knn_cpp.knn_kdtree_host(s, q, 16)
        assert (np.diff(d[0], axis=-1) >= 0).all()
