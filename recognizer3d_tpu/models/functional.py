"""Functional (pytree-consuming) forms of the RandLA-Net building blocks.

These mirror the flax modules in ``models/randlanet.py`` exactly but take
the variables pytree explicitly, so they can run inside custom execution
strategies the module system can't express directly:

- the point-sharded ring-collective blocks (``parallel/sp_lfa.py``);
- the chunked large-cloud eval forward (``models/large.py``), which
  streams the (N, K, C) neighbour tensors in query chunks to fit
  million-point clouds in HBM.

Eval-mode only (BatchNorm running averages). Parity with the modules is
pinned by tests/test_parallel.py and tests/test_large.py.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

_BN_EPS = 1e-6  # reference modules.py:87


def dense(p: Dict, x: jax.Array) -> jax.Array:
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def bn_eval(p: Dict, stats: Dict, x: jax.Array) -> jax.Array:
    inv = jax.lax.rsqrt(stats["var"] + _BN_EPS)
    return (x - stats["mean"]) * inv * p["scale"] + p["bias"]


def act(name: Optional[str], x: jax.Array) -> jax.Array:
    if name == "relu":
        return jax.nn.relu(x)
    if name == "lrelu":
        return jax.nn.leaky_relu(x, negative_slope=0.01)
    if name == "lrelu0.2":
        return jax.nn.leaky_relu(x, negative_slope=0.2)
    return x


def shared_mlp(
    p: Dict, s: Dict, x: jax.Array, activation: Optional[str] = None
) -> jax.Array:
    """Dense + BN(eval) + activation — SharedMLP (modules.py:60-104)."""
    x = dense(p["conv"], x)
    if "batch_norm" in p:
        x = bn_eval(p["batch_norm"], s["batch_norm"], x)
    return act(activation, x)


def attentive_pool(p: Dict, s: Dict, x: jax.Array) -> jax.Array:
    """Attention over the K axis (modules.py:224-253): x (..., K, C)."""
    scores = jax.nn.softmax(dense(p["score_fn"], x), axis=-2)
    pooled = jnp.sum(scores * x, axis=-2)
    return shared_mlp(p["mlp"], s["mlp"], pooled, "relu")
