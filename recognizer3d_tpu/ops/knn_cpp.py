"""Python bridge to the native C++ exact-KNN kernel.

Loads ``recognizer3d_tpu/native/libknn_kdtree.so`` (building it with the
bundled Makefile on first use) through ctypes and exposes it two ways:

- :func:`knn_kdtree_host` — plain numpy in/out, the correctness oracle and
  the host-side batch-preprocessing path;
- :func:`knn_kdtree` — a ``jax.pure_callback`` wrapper, so ``knn="kdtree"``
  works inside jitted programs (the callback hops to the host, like the
  reference's CPU-only ``knn_tpk`` extension did implicitly through torch
  CPU tensors, utils/src/knn.cpp:46-48).

The native kernel is the working equivalent of the reference's dormant
KD-tree path (modules.py:135-148 raises for knn="kdtree"; ours runs).
"""

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libknn_kdtree.so"

_lib: Optional[ctypes.CDLL] = None


def _build_library() -> None:
    subprocess.run(
        ["make", "-C", str(_NATIVE_DIR)],
        check=True,
        capture_output=True,
        text=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    # ALWAYS invoke make (it is mtime-aware, a no-op when current): the
    # library uses -march=native, so it must be built by the machine that
    # runs it, and source edits must never be masked by a stale binary.
    # If the toolchain is missing but a previously built .so exists,
    # fall back to it rather than failing — loudly, so a failed rebuild
    # after a kdtree.cpp edit can't silently serve stale native code.
    try:
        _build_library()
    except Exception as build_error:
        if not _LIB_PATH.exists():
            raise
        detail = getattr(build_error, "stderr", None) or str(build_error)
        logging.warning(
            "native KNN rebuild failed; falling back to the existing "
            "%s (possibly STALE relative to kdtree.cpp): %s",
            _LIB_PATH.name,
            str(detail).strip()[-500:],
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.knn_kdtree_batch.restype = None
    lib.knn_kdtree_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # support
        ctypes.c_int64,  # B
        ctypes.c_int64,  # N
        ctypes.POINTER(ctypes.c_float),  # query
        ctypes.c_int64,  # M
        ctypes.c_int32,  # k
        ctypes.POINTER(ctypes.c_int32),  # out idx
        ctypes.POINTER(ctypes.c_float),  # out d2
    ]
    lib.knn_kdtree_abi_version.restype = ctypes.c_int32
    abi = lib.knn_kdtree_abi_version()
    if abi != 1:  # not an assert: must survive python -O
        raise RuntimeError(f"libknn_kdtree ABI {abi}, expected 1")
    _lib = lib
    return lib


def native_available() -> bool:
    """True when the shared library is present or buildable."""
    try:
        _load()
        return True
    except Exception:
        return False


def knn_kdtree_host(
    support: np.ndarray, query: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact KNN on the host via the C++ KD-tree.

    :param support: (B, N, 3) float32.
    :param query: (B, M, 3) float32.
    :return: (indices int32 (B, M, k), squared distances f32 (B, M, k)).
    """
    lib = _load()
    support = np.ascontiguousarray(support, dtype=np.float32)
    query = np.ascontiguousarray(query, dtype=np.float32)
    if support.ndim != 3 or query.ndim != 3:
        raise ValueError(
            f"expected (B, N, 3) support and (B, M, 3) query, got "
            f"{support.shape} and {query.shape}"
        )
    b, n, _ = support.shape
    m = query.shape[1]
    if query.shape[0] != b:
        raise ValueError(
            f"batch mismatch: support B={b}, query B={query.shape[0]}"
        )
    if n < 1:
        raise ValueError("support is empty (N=0): no neighbours exist")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out_idx = np.empty((b, m, k), dtype=np.int32)
    out_d2 = np.empty((b, m, k), dtype=np.float32)
    lib.knn_kdtree_batch(
        support.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(b),
        ctypes.c_int64(n),
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(m),
        ctypes.c_int32(k),
        out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out_idx, out_d2


def knn_kdtree(
    support: jax.Array, query: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """jit-compatible exact KNN through a host callback to the C++ kernel."""
    b, m = query.shape[0], query.shape[1]
    result_shapes = (
        jax.ShapeDtypeStruct((b, m, k), jnp.int32),
        jax.ShapeDtypeStruct((b, m, k), jnp.float32),
    )

    def host_fn(s, q):
        return knn_kdtree_host(np.asarray(s), np.asarray(q), k)

    return jax.pure_callback(
        host_fn, result_shapes, support, query, vmap_method="sequential"
    )
