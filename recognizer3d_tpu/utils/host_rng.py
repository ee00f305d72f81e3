"""Host-side threefry key derivation.

All host-driven RNG (epoch shuffles, per-step PRNG keys, dropout keys)
draws from numpy RandomStates: each tiny ``jax.random`` utility call is a
device program whose dispatch pays a full relay round-trip on remote-TPU
setups (~1,300 such calls over a 50-epoch run before the r2 change). The
uint32 pairs drawn here are valid threefry keys consumed by ``jax.random``
inside the big jitted programs, and their shape/dtype (uint32[2]) matches
``jax.random.PRNGKey`` outputs, so jit signatures and compile-cache keys
are unaffected.
"""

from typing import Optional

import numpy as np


def host_threefry_keys(
    rng: np.random.RandomState, n: Optional[int] = None
) -> np.ndarray:
    """(2,) or (n, 2) uint32 threefry key(s) drawn from ``rng``.

    ``randint(0, 2**32, dtype=np.uint32)`` is exact: numpy accepts
    ``high == iinfo(uint32).max + 1`` and draws over the full range.
    """
    shape = (2,) if n is None else (n, 2)
    return rng.randint(0, 2**32, size=shape, dtype=np.uint32)
