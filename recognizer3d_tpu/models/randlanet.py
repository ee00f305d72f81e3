"""RandLA-Net encoder–decoder as a single jit-compiled flax module.

Architectural parity with the reference PyTorch modules
(``/root/reference/randlanet/utils/modules.py``), re-laid-out for TPU:

- features live in ``(B, N, C)`` / ``(B, N, K, C)`` layouts (channels-last,
  lane-dim friendly) instead of the reference's ``(B, C, N, 1)`` 1×1-conv
  trickery (modules.py:60-104); every SharedMLP is a plain Dense that XLA
  maps onto the MXU and fuses with the adjacent BN/activation;
- the per-forward random permutation + prefix decimation
  (modules.py:568-589) is preserved exactly, but the permutation is an
  explicit input array so the whole forward stays a pure function under jit;
- BatchNorm keeps the reference's eps=1e-6 / torch-momentum=0.99 semantics
  (modules.py:87); note torch's ``running = (1−m)·running + m·batch``
  equals flax's convention with momentum 0.01;
- all five per-forward KNN searches run on-device through ops/knn.py.

Weight-for-weight compatible with the reference: see
``recognizer3d_tpu.models.torch_compat`` for the state-dict mapping.
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from recognizer3d_tpu.models.settings import RandLANetSettings
from recognizer3d_tpu.ops import lfa_pallas
from recognizer3d_tpu.ops.knn import gather_neighbors, knn, knn_presorted
from recognizer3d_tpu.ops.knn import FAST_GATHER_MAX_ROWS
from recognizer3d_tpu.ops.knn_pallas import invert_permutation, morton_order

# tests force the fused eval-mode LFA kernels in pallas interpret mode on
# CPU; in production they run only where compiled Mosaic is available.
# RECOGNIZER3D_FUSED_LFA=0 disables the fused path (safety valve / A-B).
FORCE_FUSED_LFA_INTERPRET = False


def _fused_lfa_available() -> bool:
    if os.environ.get("RECOGNIZER3D_FUSED_LFA", "1") == "0":
        return False
    if FORCE_FUSED_LFA_INTERPRET:
        return True
    return jax.devices()[0].platform == "tpu"


def _sort_rows(x: jax.Array, order: jax.Array) -> jax.Array:
    """Reorder the point dimension of (B, N, C) by ``order`` — (B, N), or
    (N,) shared across the batch.

    For B > 1 on big clouds this gathers per batch element: a batched
    row gather over the flattened (B·N)-row table leaves the TPU's
    fast-gather regime (per-row cost grows with table size past ~128k
    rows; measured 6.7× at 4×64k — benchmarks/RESULTS.md)."""
    if order.ndim == 1:
        if x.shape[0] > 1 and x.shape[0] * x.shape[1] > FAST_GATHER_MAX_ROWS:
            return jax.lax.map(lambda xb: jnp.take(xb, order, axis=0), x)
        return x[:, order]
    if x.shape[0] > 1 and x.shape[0] * x.shape[1] > FAST_GATHER_MAX_ROWS:
        return jax.lax.map(
            lambda args: jnp.take(args[0], args[1], axis=0), (x, order)
        )
    return jnp.take_along_axis(x, order[..., None], axis=1)


# torch-style initialisation: kaiming_uniform(a=√5) on a 1×1 conv/linear
# reduces to U(−1/√fan_in, 1/√fan_in) for both kernel and bias.
def _torch_uniform_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _activation(name: Optional[str]):
    if name is None:
        return lambda x: x
    if name == "relu":
        return nn.relu
    if name == "lrelu":  # torch LeakyReLU default slope
        return lambda x: nn.leaky_relu(x, negative_slope=0.01)
    if name == "lrelu0.2":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(name)


class SharedMLP(nn.Module):
    """Dense + BatchNorm + activation over the trailing channel dim.

    Equivalent of the reference's SharedMLP (modules.py:60-104); the
    transpose-conv decoder variant collapses to the same Dense for kernel
    size 1 (only its torch init fan differs, reproduced via ``init_fan``).

    ``dtype`` is the activation dtype (settings.compute_dtype): parameters
    stay float32 (flax ``param_dtype`` default) and flax computes the
    BatchNorm statistics in float32 regardless, so "bfloat16" only changes
    what crosses HBM between ops.
    """

    n_out: int
    bn: bool = True
    activation: Optional[str] = None
    init_fan: Optional[int] = None  # override init fan-in (transpose convs)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        fan = self.init_fan if self.init_fan is not None else x.shape[-1]
        dt = jnp.dtype(self.dtype)
        x = nn.Dense(
            self.n_out,
            kernel_init=_torch_uniform_init(fan),
            bias_init=_torch_uniform_init(fan),
            dtype=dt,
            name="conv",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.01,  # == torch momentum 0.99 (see module docstring)
                epsilon=1e-6,
                dtype=dt,
                name="batch_norm",
            )(x)
        return _activation(self.activation)(x)


def relative_position_encoding(
    xyz: jax.Array,
    neighbors: jax.Array,
    distances: jax.Array,
    neighbor_xyz: Optional[jax.Array] = None,
) -> jax.Array:
    """LocSE relative position encoding (modules.py:153-186).

    :param xyz: (B, N, 3) coordinates.
    :param neighbors: (B, N, K) neighbour indices.
    :param distances: (B, N, K) neighbour (euclidean) distances.
    :param neighbor_xyz: optional pre-gathered (B, N, K, 3) neighbour
        coordinates (gather cost on TPU is per-row, so callers that also
        gather features should fetch both in ONE combined gather).
    :return: (B, N, K, 10) concat of [xyz, neighbour xyz, xyz − neighbour
             xyz, distance].
    """
    if neighbor_xyz is None:
        neighbor_xyz = gather_neighbors(xyz, neighbors)  # (B, N, K, 3)
    center = jnp.broadcast_to(
        xyz[:, :, None, :], neighbor_xyz.shape
    )  # (B, N, K, 3)
    return jnp.concatenate(
        [center, neighbor_xyz, center - neighbor_xyz, distances[..., None]],
        axis=-1,
    )


class _RPEKernel(nn.Module):
    """Parameter holder matching the nn.Dense inside a SharedMLP (path
    ``.../conv/{kernel,bias}``) so archives are interchangeable with the
    unfused formulation (and with reference torch checkpoints via
    models/torch_compat.py)."""

    half: int

    def setup(self):
        init = _torch_uniform_init(10)
        self.kernel = self.param("kernel", init, (10, self.half))
        self.bias = self.param("bias", init, (self.half,))


class FusedRPEMLP(nn.Module):
    """``mlp_rpe1`` (SharedMLP over the 10-channel LocSE encoding,
    reference modules.py:153-186 + :289) restructured for TPU.

    The reference materialises ``rpe = [center, nbr, center − nbr, dist]``
    (B, N, K, 10) and matmuls it to ``half`` channels. That Dense is linear
    in its concat inputs, so it splits exactly:

        W·rpe + b = (Wc + Wd)·center + (Wn − Wd)·nbr + w·dist + b

    The center term is a per-POINT (B, N, 3)→(B, N, half) projection
    broadcast over K; the neighbour term is the SAME projection of the
    support cloud, so it can be computed before the KNN and ride the
    combined neighbour-row gather (TPU row gathers are flat in channel
    width). This removes the (B, N, K, 10) concat, its N·K×10×half matmul,
    and the XLA layout copies both inserted around the gather→matmul pair
    (~10 ms of the 64k forward — benchmarks/RESULTS.md), while keeping the
    parameter tree (and BN semantics) of the unfused SharedMLP.
    """

    half: int
    dtype: str = "float32"

    def setup(self):
        self.conv = _RPEKernel(self.half, name="conv")
        self.batch_norm = nn.BatchNorm(
            momentum=0.01, epsilon=1e-6, dtype=jnp.dtype(self.dtype)
        )

    def support_projection(self, xyz: jax.Array) -> jax.Array:
        """(B, N, 3) → (B, N, half) neighbour-term rows ``(Wn − Wd)·xyz``,
        to be gathered alongside the feature rows (float32: geometry)."""
        k = self.conv.kernel
        return xyz @ (k[3:6] - k[6:9])

    def center_projection(self, xyz: jax.Array) -> jax.Array:
        """(B, N, 3) → (B, N, half) per-point center term ``(Wc + Wd)·xyz``
        (the other half of the split Dense — see class docstring)."""
        k = self.conv.kernel
        return xyz @ (k[0:3] + k[6:9])

    def __call__(
        self,
        xyz: jax.Array,
        q_gathered: jax.Array,
        distances: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        """:param xyz: (B, N, 3) query/center coordinates.
        :param q_gathered: (B, N, K, half) gathered support projections.
        :param distances: (B, N, K) euclidean neighbour distances.
        :return: (B, N, K, half) — relu(BN(Dense(rpe)))."""
        k = self.conv.kernel
        center = self.center_projection(xyz)  # (B, N, half)
        out = (
            center[:, :, None, :]
            + q_gathered
            + distances[..., None] * k[9]
            + self.conv.bias
        )
        out = self.batch_norm(
            out.astype(jnp.dtype(self.dtype)), use_running_average=not train
        )
        return nn.relu(out)


class AttentivePooling(nn.Module):
    """Attention over the K neighbours (modules.py:224-253)."""

    n_out: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, N, K, C) -> (B, N, C)
        c = x.shape[-1]
        scores = nn.Dense(
            c,
            use_bias=False,
            kernel_init=_torch_uniform_init(c),
            dtype=jnp.dtype(self.dtype),
            name="score_fn",
        )(x)
        scores = jax.nn.softmax(scores, axis=-2)  # softmax over K
        pooled = jnp.sum(scores * x.astype(scores.dtype), axis=-2)
        return SharedMLP(self.n_out, activation="relu", dtype=self.dtype, name="mlp")(
            pooled, train=train
        )


def _bn_eval_affine(bn: nn.BatchNorm, n_features: int):
    """Exact eval-mode per-channel affine ``y = s·x + o`` of a flax
    BatchNorm (s = γ/√(var+ε), o = β − mean·s), computed from the raw
    variables — NOT by differencing two probe outputs, which would lose
    ~log2(|mean|/s) mantissa bits to cancellation on checkpoints with
    large running means. The one zero call only CREATES the module's
    params/stats at init time, so the fused eval path leaves the variable
    tree identical to the unfused one; its output is discarded."""
    bn(jnp.zeros((1, 1, n_features), jnp.float32), use_running_average=True)
    f32 = lambda name, col: bn.get_variable(col, name).astype(jnp.float32)
    s = f32("scale", "params") * jax.lax.rsqrt(
        f32("var", "batch_stats") + bn.epsilon
    )
    o = f32("bias", "params") - f32("mean", "batch_stats") * s
    return s, o


class _EvalFusableMLP(nn.Module):
    """SharedMLP twin with a STATIC input width, declared setup-style so the
    fused eval path (ops/lfa_pallas.py) can extract its Dense/BatchNorm
    pieces; ``__call__`` is the exact SharedMLP math (the train path and
    non-TPU backends use it unchanged). Param paths match SharedMLP's
    ("conv", "batch_norm"), so archives and reference torch checkpoints
    (models/torch_compat.py) are interchangeable."""

    n_in: int
    n_out: int
    activation: Optional[str] = None
    dtype: str = "float32"

    def setup(self):
        init = _torch_uniform_init(self.n_in)
        self.conv = nn.Dense(
            self.n_out,
            kernel_init=init,
            bias_init=init,
            dtype=jnp.dtype(self.dtype),
            name="conv",
        )
        self.batch_norm = nn.BatchNorm(
            momentum=0.01, epsilon=1e-6, dtype=jnp.dtype(self.dtype),
            name="batch_norm",
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.conv(x)
        x = self.batch_norm(x, use_running_average=not train)
        return _activation(self.activation)(x)

    def dense_wb(self):
        """Exact (W (n_in, n_out), b (n_out,)) from the Dense's variables;
        the zero call only creates them at init time."""
        self.conv(jnp.zeros((1, self.n_in), jnp.float32))
        return (
            self.conv.get_variable("params", "kernel").astype(jnp.float32),
            self.conv.get_variable("params", "bias").astype(jnp.float32),
        )

    def bn_affine(self):
        return _bn_eval_affine(self.batch_norm, self.n_out)


class _EvalFusablePool(nn.Module):
    """AttentivePooling twin with a STATIC input width (see
    :class:`_EvalFusableMLP`); param paths match AttentivePooling's
    ("score_fn", "mlp")."""

    n_in: int
    n_out: int
    dtype: str = "float32"

    def setup(self):
        self.score_fn = nn.Dense(
            self.n_in,
            use_bias=False,
            kernel_init=_torch_uniform_init(self.n_in),
            dtype=jnp.dtype(self.dtype),
            name="score_fn",
        )
        self.mlp = _EvalFusableMLP(
            self.n_in, self.n_out, activation="relu", dtype=self.dtype,
            name="mlp",
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        scores = jax.nn.softmax(self.score_fn(x), axis=-2)
        pooled = jnp.sum(scores * x.astype(scores.dtype), axis=-2)
        return self.mlp(pooled, train=train)

    def score_kernel(self):
        """Exact (n_in, n_in) score matrix from the Dense's variables; the
        zero call only creates them at init time."""
        self.score_fn(jnp.zeros((1, self.n_in), jnp.float32))
        return self.score_fn.get_variable("params", "kernel").astype(
            jnp.float32
        )


class LocalFeatureAggregation(nn.Module):
    """The RandLA-Net LFA block (modules.py:256-325).

    One self-KNN per block, two rounds of (RPE-MLP → neighbour-feature
    concat → attentive pooling), then the residual
    ``lrelu(mlp2(features) + shortcut(input))`` producing (B, N, 2·n_out).
    """

    n_out: int
    n_neighbors: int
    knn_approach: str
    backend: Optional[object] = None  # SPBackend for point-sharded runs
    dtype: str = "float32"  # activation dtype (settings.compute_dtype)

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: jax.Array,
        train: bool = False,
        order: Optional[jax.Array] = None,
        inv_order: Optional[jax.Array] = None,
        sorted_io: bool = False,
    ) -> jax.Array:
        """When ``order``/``inv_order`` are given, ``xyz`` must already be in
        that (Morton) order and the whole block runs in the sorted domain —
        the KNN skips its index remap/unsort, and only ``features`` rows are
        reordered at entry/exit (all the block's math is either pointwise or
        a permutation-invariant reduction over batch/neighbours, so the
        result is bit-identical up to distance ties). The output is returned
        in the ORIGINAL feature order either way.

        With ``sorted_io`` the entry/exit row sorts are skipped entirely:
        ``features`` must already follow ``xyz``'s (sorted) order and the
        output stays in that order — the caller composes the inter-level
        permutations instead (RandLANet keeps the whole encoder/decoder in
        the sorted domain, r4 re-permute elimination).

        With a ``backend`` (point-sharded execution) the block instead runs
        unsorted: the self-KNN + first neighbour gather fuse into one ring
        rotation and the second gather is one more (parallel/sp_model.py).
        """
        sorted_domain = sorted_io or order is not None
        if order is not None and not sorted_io:
            features = _sort_rows(features, order)

        half = self.n_out // 2
        dt = self.dtype
        # input transformation (independent of the KNN, so it can run first
        # and its output ride the fused KNN+gather on the backend path)
        feats = SharedMLP(half, activation="lrelu0.2", dtype=dt, name="mlp1")(
            features, train=train
        )
        # first locSE + attentive pooling. Gather cost on TPU is per-ROW
        # (flat in channel count), so the mlp_rpe1 neighbour-term rows (see
        # FusedRPEMLP — they REPLACE the raw neighbour xyz) and the feature
        # rows are fetched in ONE combined gather. The gather table stays
        # float32 even under compute_dtype=bfloat16: row-gather cost is flat
        # in channel width, and the RPE geometry must stay exact.
        rpe_mlp = FusedRPEMLP(half, dtype=dt, name="mlp_rpe1")
        table = jnp.concatenate(
            [rpe_mlp.support_projection(xyz), feats.astype(jnp.float32)],
            axis=-1,
        )
        if self.backend is not None:
            neighbors, d2, gathered = self.backend.knn_gather(
                xyz, xyz, table, self.n_neighbors
            )
        else:
            if sorted_domain:
                neighbors, d2 = knn_presorted(
                    xyz, xyz, self.n_neighbors, self.knn_approach
                )
            else:
                neighbors, d2 = knn(
                    xyz, xyz, self.n_neighbors, self.knn_approach
                )
            gathered = gather_neighbors(table, neighbors)  # (B, N, K, 2·half)
        pool1 = _EvalFusablePool(self.n_out, half, dtype=dt, name="pool1")
        pool2 = _EvalFusablePool(self.n_out, self.n_out, dtype=dt, name="pool2")
        rpe2_mlp = _EvalFusableMLP(
            half, half, activation="relu", dtype=dt, name="mlp_rpe2"
        )
        if (
            self.backend is None
            and not train
            and _fused_lfa_available()
            and lfa_pallas.supports(self.n_neighbors, half, dt)
        ):
            # eval-mode fused inner chain: the whole RPE/pool/RPE2 sequence
            # runs lane-flattened in VMEM (ops/lfa_pallas.py) — at this
            # level's channel width XLA pays an 8× lane-padding tax on
            # every (N, K, C) op. Exact reformulation (BN in eval-affine
            # form); parity-tested in tests/test_lfa_fused.py.
            interp = FORCE_FUSED_LFA_INTERPRET
            s1, o1 = _bn_eval_affine(rpe_mlp.batch_norm, half)
            wp1, bp1 = pool1.mlp.dense_wb()
            sp1, op1 = pool1.mlp.bn_affine()
            w2, b2 = rpe2_mlp.dense_wb()
            s2, o2 = rpe2_mlp.bn_affine()
            # The kernel's I/O (and its MXU dots) run in the activation
            # dtype: under bfloat16 that halves the (N, K·C) HBM traffic
            # and runs single-pass bf16 MXU dots, exactly like the unfused
            # flax path (which casts params to the activation dtype); the
            # RPE sum, BN affines and softmax stay f32 inside the kernel.
            pooled1, rpe2_flat = lfa_pallas.lfa_round1_fused(
                gathered.astype(jnp.dtype(dt)),
                d2,
                rpe_mlp.center_projection(xyz),
                rpe_mlp.conv.kernel[9],
                rpe_mlp.conv.bias,
                s1,
                o1,
                pool1.score_kernel(),
                wp1,
                bp1,
                sp1,
                op1,
                w2,
                b2,
                s2,
                o2,
                interpret=interp,
            )
            g2 = gather_neighbors(pooled1, neighbors)
            wp2, bp2 = pool2.mlp.dense_wb()
            sp2, op2 = pool2.mlp.bn_affine()
            # the residual (mlp2 + shortcut + leaky-relu) rides the pool-2
            # kernel's epilogue in eval-affine form — two fewer XLA ops and
            # HBM round-trips over (N, 2·n_out) per block (VERDICT r4 #4).
            # _EvalFusableMLP's param paths match SharedMLP's, so archives
            # and the train path are unchanged.
            mlp2_m = _EvalFusableMLP(
                self.n_out, 2 * self.n_out, dtype=dt, name="mlp2"
            )
            short_m = _EvalFusableMLP(
                features.shape[-1], 2 * self.n_out, dtype=dt, name="shortcut"
            )
            wm, bm = mlp2_m.dense_wb()
            sm, om = mlp2_m.bn_affine()
            wsh, bsh = short_m.dense_wb()
            ssh, osh = short_m.bn_affine()
            return_sorted = lfa_pallas.attentive_pool2_residual_fused(
                rpe2_flat,
                g2,
                pool2.score_kernel(),
                wp2,
                bp2,
                sp2,
                op2,
                features,
                wm * sm[None, :],
                wsh * ssh[None, :],
                (sm * bm + om) + (ssh * bsh + osh),
                k=self.n_neighbors,
                interpret=interp,
            )
            if inv_order is not None and not sorted_io:
                return _sort_rows(return_sorted, inv_order)
            return return_sorted
        else:
            distances = jnp.sqrt(d2)
            rpe = rpe_mlp(xyz, gathered[..., :half], distances, train=train)
            cat = jnp.concatenate(
                [rpe, gathered[..., half:].astype(rpe.dtype)], axis=-1
            )  # (B, N, K, n_out)
            feats = pool1(cat, train=train)
            # second locSE + attentive pooling
            rpe = rpe2_mlp(rpe, train=train)
            if self.backend is not None:
                neighbor_feats = self.backend.gather(feats, neighbors)
            else:
                neighbor_feats = gather_neighbors(feats, neighbors)
            cat = jnp.concatenate([rpe, neighbor_feats], axis=-1)
            feats = pool2(cat, train=train)
        # residual
        out = SharedMLP(2 * self.n_out, dtype=dt, name="mlp2")(feats, train=train)
        shortcut = SharedMLP(2 * self.n_out, dtype=dt, name="shortcut")(
            features, train=train
        )
        out = nn.leaky_relu(out + shortcut, negative_slope=0.01)
        if inv_order is not None and not sorted_io:
            out = _sort_rows(out, inv_order)
        return out


def upsample_nni(
    features: jax.Array,
    xyz: jax.Array,
    xyz_upsampled: jax.Array,
    knn_approach: str,
    inv_fine: Optional[jax.Array] = None,
    presorted: bool = False,
) -> jax.Array:
    """1-NN feature copy (modules.py:343-364): each upsampled point takes the
    features of its nearest coarse point.

    With ``inv_fine`` given, ``xyz``/``xyz_upsampled`` are pre-Morton-sorted
    and ``features`` rows follow ``xyz``'s sorted order; the result is
    unsorted back to the original fine order via ``inv_fine``. With
    ``presorted`` (and no ``inv_fine``) the result STAYS in the fine sorted
    order — the sorted-domain decoder (RandLANet) consumes it directly."""
    if inv_fine is not None or presorted:
        neighbors, _ = knn_presorted(xyz, xyz_upsampled, 1, knn_approach)
        up = gather_neighbors(features, neighbors)[:, :, 0, :]
        return up if inv_fine is None else _sort_rows(up, inv_fine)
    neighbors, _ = knn(xyz, xyz_upsampled, 1, knn_approach)
    return gather_neighbors(features, neighbors)[:, :, 0, :]


class RandLANet(nn.Module):
    """Full encoder–decoder (modules.py:459-611).

    ``__call__(inputs (B, N, 3+F), permutation (N,) int32, train)`` returns
    logits (B, C, N). The permutation implements the reference's random
    sampling hierarchy: apply it once, then each encoder level keeps the
    first N/decimation^i points (modules.py:568-589); the inverse
    permutation restores original point order before the head.
    """

    settings: RandLANetSettings
    backend: Optional[object] = None  # SPBackend for point-sharded runs

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        permutation: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        s = self.settings
        B, N, dim = inputs.shape
        assert dim == 3 + s.n_features, "Input should have shape (B, N, 3 + F)!"
        assert N >= s.min_n_points, (
            f"Input point cloud should have at least {s.min_n_points} points!"
        )

        xyz = inputs[..., :3].astype(jnp.float32)
        dt = jnp.dtype(s.compute_dtype)

        # input transformation (fc_start + bn_start, modules.py:495-499,564-566)
        feats = nn.Dense(
            8,
            kernel_init=_torch_uniform_init(dim),
            bias_init=_torch_uniform_init(dim),
            dtype=dt,
            name="fc_start",
        )(inputs)
        feats = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.01,
            epsilon=1e-6,
            dtype=dt,
            name="bn_start",
        )(feats)
        feats = nn.leaky_relu(feats, negative_slope=0.2)

        # random permutation (random-sampling hierarchy). On the sorted-
        # domain path the features skip this sort: the level-0 entry below
        # composes permutation∘order_0 into ONE gather.
        # RECOGNIZER3D_SORTED_FLOW=0 re-enables the r3 per-level-sort flow
        # (A/B pricing hook, benchmarks/ablate_sorted_flow.py).
        sorted_flow = (
            self.backend is None
            and os.environ.get("RECOGNIZER3D_SORTED_FLOW", "1") != "0"
        )
        xyz = _sort_rows(xyz, permutation)
        if not sorted_flow:
            feats = _sort_rows(feats, permutation)

        decimation = s.decimation
        level_sizes = [N]
        ratio = 1
        for _ in s.layer_sizes:
            ratio *= decimation
            level_sizes.append(N // ratio)

        if self.backend is not None:
            # point-sharded execution: levels stay in permuted order (the
            # ring KNN is order-agnostic); each decimation prefix is pinned
            # back to the block-sharded layout so GSPMD rebalances it
            self.backend.check_level_sizes(level_sizes)
            orders = invs = [None] * len(level_sizes)
            xyz = self.backend.constrain(xyz)
            feats = self.backend.constrain(feats)
            xyz_levels = [
                self.backend.constrain(xyz[:, :n]) for n in level_sizes
            ]
        else:
            # per-level Morton orders, computed ONCE and shared by the
            # encoder self-KNNs and the decoder 1-NN upsamplings (each
            # level's point set is a prefix of the permuted cloud, so
            # encoder and decoder see the same arrays). All neighbourhood
            # searches then run in the sorted domain — the pallas kernels
            # skip their index remap/unsort, which dominates their
            # non-kernel cost at 64k points (see benchmarks/RESULTS.md).
            orders, invs, xyz_levels = [], [], []
            for n_level in level_sizes:
                x_level = xyz[:, :n_level]
                order = morton_order(x_level)
                orders.append(order)
                invs.append(invert_permutation(order))
                xyz_levels.append(_sort_rows(x_level, order))

        # encoder (modules.py:582-589). Sorted-domain path (no backend):
        # features live in each level's Morton order END TO END — every
        # level transition is ONE composed gather (inv_prev ∘ order_next
        # subsumes the exit unsort, the decimation prefix slice and the
        # next entry sort), instead of the exit + entry row sorts the r3
        # code paid per level (VERDICT r4 re-permute elimination; all maps
        # are exact permutations, so outputs are bit-identical).
        skip_stack = []
        if sorted_flow:
            # permutation ∘ order_0 in one gather (features are still in
            # ORIGINAL order here — see above)
            entry = jnp.take(permutation, orders[0], axis=0)
            feats_sampled = _sort_rows(feats, entry)
        else:
            feats_sampled = feats
        for i, n_out in enumerate(s.layer_sizes):
            feats = LocalFeatureAggregation(
                n_out,
                s.n_neighbors,
                s.knn,
                backend=self.backend,
                dtype=s.compute_dtype,
                name=f"encoder_{i}",
            )(
                xyz_levels[i],
                feats_sampled,
                train=train,
                order=orders[i],
                inv_order=invs[i],
                sorted_io=sorted_flow,
            )
            skip_stack.append(feats)
            if sorted_flow:
                # sorted_i -> sorted_{i+1}: gather the decimation prefix's
                # rows straight out of the sorted-i array
                step = jnp.take_along_axis(invs[i], orders[i + 1], axis=1)
                feats_sampled = _sort_rows(feats, step)
            else:
                # random sampling == prefix slice after the permutation
                feats_sampled = feats[:, : level_sizes[i + 1]]
                if self.backend is not None:
                    feats_sampled = self.backend.constrain(feats_sampled)

        feats = SharedMLP(
            feats_sampled.shape[-1],
            activation="relu",
            dtype=s.compute_dtype,
            name="mlp",
        )(feats_sampled, train=train)

        # decoder (modules.py:594-605); upsampler hardcoded to 1-NN copy.
        # Sorted-domain path: the upsample emits the FINE level's sorted
        # order directly, which is exactly what the skip concat and the
        # next iteration consume — no per-level sorts.
        n_outs = list(s.layer_sizes[::-1][1:])
        decoder_channels = [2 * n for n in n_outs] + [8]
        for i, n_out_ch in enumerate(decoder_channels):
            level = len(s.layer_sizes) - i  # current (coarse) level index
            if self.backend is not None:
                # fused ring 1-NN + feature copy: coarse shards rotate past
                # the fine queries once
                _, _, up = self.backend.knn_gather(
                    xyz_levels[level], xyz_levels[level - 1], feats, 1
                )
                upsampled = up[:, :, 0, :]
            elif sorted_flow:
                upsampled = upsample_nni(
                    feats,
                    xyz_levels[level],
                    xyz_levels[level - 1],
                    s.knn,
                    presorted=True,
                )
            else:
                upsampled = upsample_nni(
                    _sort_rows(feats, orders[level]),
                    xyz_levels[level],
                    xyz_levels[level - 1],
                    s.knn,
                    inv_fine=invs[level - 1],
                )
            feats = jnp.concatenate([upsampled, skip_stack.pop()], axis=-1)
            feats = SharedMLP(
                n_out_ch,
                activation="relu",
                init_fan=n_out_ch,  # torch ConvTranspose2d init fan quirk
                dtype=s.compute_dtype,
                name=f"decoder_{i}",
            )(feats, train=train)

        # restore original point order (modules.py:607-608). Sorted path:
        # inv_0 ∘ inverse-permutation composed into one gather (the inverse
        # permutation itself is computed by scatter — an argsort here costs
        # several ms at 64k points).
        if sorted_flow:
            exit_map = jnp.take(
                invs[0], invert_permutation(permutation), axis=1
            )
            feats = _sort_rows(feats, exit_map)
        else:
            feats = _sort_rows(feats, invert_permutation(permutation))
            if self.backend is not None:
                feats = self.backend.constrain(feats)

        # head (fc_end, modules.py:525-530)
        feats = SharedMLP(
            64, activation="relu", dtype=s.compute_dtype, name="fc_end_0"
        )(feats, train=train)
        feats = SharedMLP(
            32, activation="relu", dtype=s.compute_dtype, name="fc_end_1"
        )(feats, train=train)
        feats = nn.Dropout(0.5, deterministic=not train)(feats)
        feats = SharedMLP(
            s.n_classes, bn=False, dtype=s.compute_dtype, name="fc_end_2"
        )(feats, train=train)

        # logits always leave in float32 (loss/softmax/parity contracts)
        return jnp.swapaxes(feats, -1, -2).astype(jnp.float32)  # (B, C, N)
