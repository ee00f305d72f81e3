"""Functional in-test stand-in for the ``faiss`` module.

The reference's decoder upsampler always routes its 1-NN search through
faiss (``/root/reference/randlanet/utils/modules.py:358`` with the
``approach="approximate"`` default at ``modules.py:123``), so running the
torch reference for parity tests needs a working ``IndexFlatL2`` /
``IndexIVFFlat``. This stub implements them with exact numpy brute force
(returning squared L2 distances like real faiss), which makes the
"approximate" path exact — ideal for numerical comparison.
"""

import sys
import types

import numpy as np


class IndexFlatL2:
    def __init__(self, d: int):
        self.d = d
        self._xb = None

    def train(self, x):  # noqa: D401 - faiss API
        pass

    def add(self, x):
        self._xb = np.asarray(x, dtype=np.float32)

    def search(self, queries, k):
        q = np.asarray(queries, dtype=np.float32)
        n = q.shape[0]
        out_d = np.empty((n, k), dtype=np.float32)
        out_i = np.empty((n, k), dtype=np.int64)
        xb2 = np.sum(self._xb**2, axis=1)[None, :]
        block = 8192  # bound the (block, N) distance matrix
        for s in range(0, n, block):
            qb = q[s : s + block]
            d2 = (
                np.sum(qb**2, axis=1, keepdims=True)
                + xb2
                - 2.0 * qb @ self._xb.T
            )
            if k < d2.shape[1]:
                part = np.argpartition(d2, k, axis=1)[:, :k]
            else:
                part = np.broadcast_to(
                    np.arange(d2.shape[1]), (d2.shape[0], d2.shape[1])
                )[:, :k]
            pd = np.take_along_axis(d2, part, axis=1)
            order = np.argsort(pd, axis=1, kind="stable")
            out_i[s : s + block] = np.take_along_axis(part, order, axis=1)
            out_d[s : s + block] = np.take_along_axis(pd, order, axis=1)
        return np.maximum(out_d, 0.0), out_i


class IndexIVFFlat(IndexFlatL2):
    def __init__(self, quantizer, d, nlist):
        super().__init__(d)
        self.nprobe = 1


def install() -> types.ModuleType:
    """Install the stub into sys.modules (idempotent) and return it."""
    mod = sys.modules.get("faiss")
    if mod is not None and getattr(mod, "__is_recognizer3d_stub__", False):
        return mod
    if mod is not None and hasattr(mod, "IndexFlatL2"):
        return mod  # real faiss present
    mod = types.ModuleType("faiss")
    mod.IndexFlatL2 = IndexFlatL2
    mod.IndexIVFFlat = IndexIVFFlat
    mod.__is_recognizer3d_stub__ = True
    sys.modules["faiss"] = mod
    return mod
