"""Parity tests for the fused eval-mode LFA kernels (ops/lfa_pallas.py).

The fused path is an exact reformulation of the unfused XLA math (BN in
eval-affine form, per-channel linears as block-diagonal matmuls, softmax
over K as lane-roll reductions); these tests run it in pallas interpret
mode on the CPU mesh and compare against the unfused flax path
weight-for-weight."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recognizer3d_tpu.models import randlanet as rl
from recognizer3d_tpu.ops import lfa_pallas


@pytest.fixture
def force_fused():
    rl.FORCE_FUSED_LFA_INTERPRET = True
    yield
    rl.FORCE_FUSED_LFA_INTERPRET = False


def _random_cloud(b=1, n=512, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.2)


def test_supports_gate():
    assert lfa_pallas.supports(32, 8, "float32")
    assert lfa_pallas.supports(32, 8, "bfloat16")
    assert lfa_pallas.supports(32, 32, "float32")  # r4 wide-lane level 1
    assert lfa_pallas.supports(32, 32, "bfloat16")
    assert not lfa_pallas.supports(32, 128, "float32")  # level 2: L > 2048
    assert not lfa_pallas.supports(24, 8, "float32")  # K not a power of 2
    assert not lfa_pallas.supports(32, 8, "float16")  # f16 not a model dtype
    assert lfa_pallas.supports(16, 8, "float32")


def test_lfa_block_fused_matches_unfused(force_fused):
    xyz = _random_cloud(2, 384)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 384, 8).astype(np.float32))
    block = rl.LocalFeatureAggregation(16, 32, "naive")
    variables = block.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    # make running stats non-trivial so the BN affine actually matters
    stats = jax.tree.map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        if v.ndim
        else v,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    fused = block.apply(variables, xyz, feats, train=False)
    rl.FORCE_FUSED_LFA_INTERPRET = False
    unfused = block.apply(variables, xyz, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), rtol=2e-4, atol=2e-5
    )


def test_lfa_fused_init_tree_matches(force_fused):
    """Init under the fused branch must create the identical variable tree
    (the probes stand in for the unfused calls)."""
    xyz = _random_cloud(1, 256)
    feats = jnp.zeros((1, 256, 8), jnp.float32)
    block = rl.LocalFeatureAggregation(16, 32, "naive")
    v_fused = block.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    rl.FORCE_FUSED_LFA_INTERPRET = False
    v_unfused = block.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    paths_f = jax.tree_util.tree_structure(v_fused)
    paths_u = jax.tree_util.tree_structure(v_unfused)
    assert paths_f == paths_u
    for a, b in zip(
        jax.tree_util.tree_leaves(v_fused), jax.tree_util.tree_leaves(v_unfused)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_model_fused_matches_unfused(force_fused):
    """End-to-end eval forward through RandLANet with the level-0 block
    fused (interpret mode) vs fully unfused."""
    from recognizer3d_tpu.models.settings import RandLANetSettings

    s = RandLANetSettings(
        n_classes=2, n_points=2048, n_neighbors=32, decimation=4, knn="naive"
    )
    net = rl.RandLANet(s)
    xyz = _random_cloud(1, 2048, seed=3)
    perm = jnp.asarray(np.random.RandomState(4).permutation(2048))
    variables = net.init(jax.random.PRNGKey(0), xyz, perm, train=False)
    logits_fused = net.apply(variables, xyz, perm, train=False)
    rl.FORCE_FUSED_LFA_INTERPRET = False
    logits_unfused = net.apply(variables, xyz, perm, train=False)
    np.testing.assert_allclose(
        np.asarray(logits_fused),
        np.asarray(logits_unfused),
        rtol=2e-4,
        atol=2e-4,
    )


def test_lfa_block_fused_bf16(force_fused):
    """bfloat16 variant: the fused kernel keeps I/O + MXU dots in bf16 but
    runs the RPE linearisation, BN affines and softmax in f32 — so it must
    (a) track the unfused bf16 path to bf16 resolution and (b) sit at least
    as close to the f32 ground truth as the unfused bf16 path does."""
    xyz = _random_cloud(2, 384)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 384, 8).astype(np.float32))
    block32 = rl.LocalFeatureAggregation(16, 32, "naive")
    variables = block32.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    stats = jax.tree.map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        if v.ndim
        else v,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    block16 = rl.LocalFeatureAggregation(16, 32, "naive", dtype="bfloat16")

    fused16 = block16.apply(variables, xyz, feats, train=False)
    assert fused16.dtype == jnp.bfloat16
    rl.FORCE_FUSED_LFA_INTERPRET = False
    unfused16 = block16.apply(variables, xyz, feats, train=False)
    truth = np.asarray(
        block32.apply(variables, xyz, feats, train=False), np.float64
    )
    f16 = np.asarray(fused16, np.float64)
    u16 = np.asarray(unfused16, np.float64)
    # (a) bf16-resolution agreement with the unfused bf16 path
    scale = np.maximum(np.abs(truth), 1.0)
    assert np.max(np.abs(f16 - u16) / scale) < 0.08
    # (b) no less accurate than the unfused bf16 path (bf16 has ~0.4% eps;
    # allow a small slack for error cancellation luck)
    err_fused = np.mean(np.abs(f16 - truth))
    err_unfused = np.mean(np.abs(u16 - truth))
    assert err_fused <= err_unfused * 1.1 + 1e-4


@pytest.mark.tpu
def test_lfa_fused_compiled_matches_unfused():
    """Compiled Mosaic kernels on the real TPU (R3D_TPU_TESTS=1 -m tpu).

    Tolerance note: exact-math parity is pinned by the interpret-mode tests
    above; on hardware BOTH paths round their f32 matmuls through the MXU's
    bf16 passes, and the fused path groups the same math into differently
    shaped dots, so the two quantize differently — measured max |Δ| ≈ 1e-3
    on O(1) activations with ~88 % of elements bit-identical. The bound here
    catches layout/roll/indexing bugs (which produce O(1) errors), not
    matmul-pass noise."""
    xyz = _random_cloud(1, 4096)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 4096, 8).astype(np.float32))
    block = rl.LocalFeatureAggregation(16, 32, "naive")
    variables = block.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    fused = block.apply(variables, xyz, feats, train=False)  # TPU: fused
    try:
        rl.FORCE_FUSED_LFA_INTERPRET = False
        prev = rl._fused_lfa_available
        rl._fused_lfa_available = lambda: False
        unfused = block.apply(variables, xyz, feats, train=False)
    finally:
        rl._fused_lfa_available = prev
    f, u = np.asarray(fused), np.asarray(unfused)
    np.testing.assert_allclose(f, u, rtol=3e-3, atol=3e-3)
    assert np.mean(np.abs(f - u)) < 1e-4


@pytest.mark.tpu
def test_lfa_fused_bf16_compiled():
    """Compiled bf16 Mosaic kernels on the real TPU: bf16 I/O + bf16 MXU
    dots with f32 accumulation must stay within bf16 resolution of the
    unfused bf16 path (both quantize activations to ~0.4%)."""
    xyz = _random_cloud(1, 4096)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 4096, 8).astype(np.float32))
    block = rl.LocalFeatureAggregation(16, 32, "naive", dtype="bfloat16")
    variables = block.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    fused = block.apply(variables, xyz, feats, train=False)  # TPU: fused
    assert fused.dtype == jnp.bfloat16
    try:
        prev = rl._fused_lfa_available
        rl._fused_lfa_available = lambda: False
        unfused = block.apply(variables, xyz, feats, train=False)
    finally:
        rl._fused_lfa_available = prev
    f = np.asarray(fused, dtype=np.float32)
    u = np.asarray(unfused, dtype=np.float32)
    scale = np.maximum(np.abs(u), 1.0)
    assert np.max(np.abs(f - u) / scale) < 0.08
    assert np.mean(np.abs(f - u)) < 5e-3


def test_lfa_block_fused_wide_lane_matches_unfused(force_fused):
    """The r4 grouped-dot extension (half = 32 -> L = 2048 lanes, the
    second encoder level's geometry): the fused path must still be an
    exact reformulation of the unfused one."""
    xyz = _random_cloud(2, 384, seed=3)
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 384, 64).astype(np.float32))
    block = rl.LocalFeatureAggregation(64, 32, "naive")
    variables = block.init(jax.random.PRNGKey(1), xyz, feats, train=False)
    stats = jax.tree.map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        if v.ndim
        else v,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    assert lfa_pallas.supports(32, 32, "float32")  # the new regime
    fused = block.apply(variables, xyz, feats, train=False)
    rl.FORCE_FUSED_LFA_INTERPRET = False
    unfused = block.apply(variables, xyz, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), rtol=2e-4, atol=2e-4
    )


def test_lfa_block_fused_wide_lane_bf16(force_fused):
    xyz = _random_cloud(1, 256, seed=5)
    rng = np.random.RandomState(6)
    feats = jnp.asarray(rng.randn(1, 256, 64).astype(np.float32))
    block32 = rl.LocalFeatureAggregation(64, 32, "naive")
    variables = block32.init(jax.random.PRNGKey(2), xyz, feats, train=False)
    block16 = rl.LocalFeatureAggregation(64, 32, "naive", dtype="bfloat16")

    fused16 = block16.apply(variables, xyz, feats, train=False)
    assert fused16.dtype == jnp.bfloat16
    rl.FORCE_FUSED_LFA_INTERPRET = False
    unfused16 = block16.apply(variables, xyz, feats, train=False)
    truth = np.asarray(
        block32.apply(variables, xyz, feats, train=False), np.float64
    )
    scale = np.maximum(np.abs(truth), 1.0)
    f16 = np.asarray(fused16, np.float64)
    u16 = np.asarray(unfused16, np.float64)
    assert np.max(np.abs(f16 - u16) / scale) < 0.08


def test_lfa_block_fused_k16_half32_matches_unfused(force_fused):
    """k = 16 with half = 32 (L = 1024 lanes): the LAST geometry that still
    routes through the full-kron path (L == _MAX_FULL_BD_LANES), with a
    (1024, 1024) f32 score constant near the VMEM budget. ADVICE r4: this
    admitted-but-untested corner (n_neighbors=16 at the second encoder
    level) must hold the same exact-reformulation parity as the k = 32
    geometries."""
    assert lfa_pallas.supports(16, 32, "float32")
    assert 16 * 2 * 32 == lfa_pallas._MAX_FULL_BD_LANES  # the corner itself
    xyz = _random_cloud(2, 384, seed=9)
    rng = np.random.RandomState(10)
    feats = jnp.asarray(rng.randn(2, 384, 64).astype(np.float32))
    block = rl.LocalFeatureAggregation(64, 16, "naive")
    variables = block.init(jax.random.PRNGKey(4), xyz, feats, train=False)
    stats = jax.tree.map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        if v.ndim
        else v,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    fused = block.apply(variables, xyz, feats, train=False)
    rl.FORCE_FUSED_LFA_INTERPRET = False
    unfused = block.apply(variables, xyz, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), rtol=2e-4, atol=2e-4
    )


@pytest.mark.tpu
def test_lfa_fused_k16_half32_compiled():
    """Compiled k = 16 / half = 32 Mosaic kernels on the real TPU — proves
    the near-VMEM-budget full-kron constants ((1024, 1024) score + two
    (512, 1024) interleaves) actually fit and compute correctly on
    hardware (ADVICE r4 corner)."""
    xyz = _random_cloud(1, 4096, seed=11)
    rng = np.random.RandomState(12)
    feats = jnp.asarray(rng.randn(1, 4096, 64).astype(np.float32))
    block = rl.LocalFeatureAggregation(64, 16, "naive")
    variables = block.init(jax.random.PRNGKey(5), xyz, feats, train=False)
    fused = block.apply(variables, xyz, feats, train=False)  # TPU: fused
    try:
        prev = rl._fused_lfa_available
        rl._fused_lfa_available = lambda: False
        unfused = block.apply(variables, xyz, feats, train=False)
    finally:
        rl._fused_lfa_available = prev
    f, u = np.asarray(fused), np.asarray(unfused)
    np.testing.assert_allclose(f, u, rtol=3e-3, atol=3e-3)
    assert np.mean(np.abs(f - u)) < 2e-4


@pytest.mark.tpu
def test_lfa_fused_wide_lane_compiled():
    """Compiled wide-lane (half = 32, grouped-dot) Mosaic kernels on the
    real TPU — the r4 second-encoder-level extension. Same tolerance
    rationale as test_lfa_fused_compiled_matches_unfused."""
    xyz = _random_cloud(1, 4096, seed=7)
    rng = np.random.RandomState(8)
    feats = jnp.asarray(rng.randn(1, 4096, 64).astype(np.float32))
    block = rl.LocalFeatureAggregation(64, 32, "naive")
    variables = block.init(jax.random.PRNGKey(3), xyz, feats, train=False)
    fused = block.apply(variables, xyz, feats, train=False)  # TPU: fused
    try:
        prev = rl._fused_lfa_available
        rl._fused_lfa_available = lambda: False
        unfused = block.apply(variables, xyz, feats, train=False)
    finally:
        rl._fused_lfa_available = prev
    f, u = np.asarray(fused), np.asarray(unfused)
    np.testing.assert_allclose(f, u, rtol=3e-3, atol=3e-3)
    assert np.mean(np.abs(f - u)) < 2e-4
