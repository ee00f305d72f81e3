"""Fused eval-mode LFA inner kernels (RPE-MLP → attentive pooling → RPE2).

Motivation (benchmarks/RESULTS.md "Where the time goes at 64k"): after the
KNN kernel and the neighbour gathers, the remaining ~30 ms of the 64k exact
forward is spread over the LFA's dense/BN/softmax chain. At the first
encoder level the per-neighbour tensors are (N, K, C) with C = 16 — XLA
lays the C axis on the 128-wide lane dimension, so every elementwise op,
softmax and small matmul in that chain pays an 8× lane-padding tax (the
measured ~7× gap between the stage cost and its HBM-bandwidth floor).

These kernels run the whole inner chain of one LFA round in VMEM on a
lane-FLATTENED layout, (QB, K·C) — no padding, one HBM read of the gathered
table and one write of each output:

- round 1 (``lfa_round1_fused``): fused-RPE linearisation (the mlp_rpe1
  neighbour term rides the combined gather — models/randlanet.py
  FusedRPEMLP) + BN affine + relu, attentive pooling 1 (scores, softmax
  over K, weighted sum, pool MLP + BN + relu), and mlp_rpe2 + BN + relu —
  one kernel, outputs ``(pooled (B,N,h), rpe2 (B,N,K·h))``;
- round 2 (``attentive_pool2_fused``): the second pooling over the concat
  of rpe2 and the gathered pooled features.

The trick making the flattened layout workable: every per-channel linear
op becomes a BLOCK-DIAGONAL matmul ``kron(I_K, W)`` that the MXU executes
directly — scores = cat @ kron(I_K, Ws); the K-axis softmax reductions are
log2(K) lane-rolls (``pltpu.roll`` by C·2^j — the k-slots form stride-C
groups that the cyclic roll permutes exactly); the sum over K folds into
the pool MLP as ``kron(1_K, Wp)``. BatchNorm enters eval-affine form
(scale/offset per channel, read exactly from the flax variables at trace
time — models/randlanet.py ``_bn_eval_affine``):
``relu(BN(x @ W + b))`` ≡ ``relu(x @ (W·s) + (s·b + o))`` with the scale
folded into the matmul constants outside the kernel.

Train mode keeps the unfused XLA path (batch statistics need global
reductions); the reference semantics are unchanged — this is an exact
reformulation, parity-tested against the unfused path in
tests/test_lfa_fused.py.

Reference scope: modules.py:153-253 (RPE, PFA concat, AttentivePooling)
and modules.py:298-325 (the LFA forward wiring).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QB = 256  # query rows per program


#: above this lane count the kron'd (L, L) score matrix leaves the VMEM
#: budget; the kernels switch to 128-aligned GROUPED block-diagonal dots
#: (r4 — this is what admits the second encoder level, half = 32)
_MAX_FULL_BD_LANES = 1024
#: smaller query block at the wide-lane levels keeps the live (QB, L)
#: f32 temporaries inside VMEM
_QB_WIDE = 128


def supports(k: int, half: int, dtype: str) -> bool:
    """The fused path covers encoder levels whose per-neighbour channel
    width pays a lane-padding tax in XLA's (N, K, C) layout: half == 8
    (level 0, 8× tax) and half == 32 (level 1, 2× tax — r4 grouped-dot
    extension). K must be a power of two (the roll-reduce) and the
    flattened lane count K·2h a 128-multiple within the grouped-dot
    budget. dtype float32 or bfloat16: under bfloat16 the kernel keeps
    its I/O and the block-diagonal MXU dots in bf16 (single MXU pass,
    matching the unfused flax path which casts params to the activation
    dtype) while the RPE linearisation, BN affines and the softmax still
    run in f32 — strictly tighter numerics than the unfused bf16 chain,
    whose softmax is bf16 end to end."""
    lanes = k * 2 * half
    return (
        dtype in ("float32", "bfloat16")
        and half in (8, 32)
        and k >= 8
        and (k & (k - 1)) == 0
        and lanes % 128 == 0
        and lanes <= 2048
        and (half * 2) <= 128  # grouped dots need >=1 k-slot per tile
    )


def _roll(x: jax.Array, shift: int, interpret: bool) -> jax.Array:
    if interpret:
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift, 1)


def _softmax_over_k(scores: jax.Array, c: int, k: int, interpret: bool):
    """Softmax over the K groups of a (QB, K·C) lane-flattened array.

    Lane l = k·C + c: rolling by C·2^j cyclically permutes the k index with
    c preserved (the lane count is exactly K·C), so log2(K) roll-max /
    roll-add steps all-reduce every k-group."""
    m = scores
    shift = c
    while shift < c * k:
        m = jnp.maximum(m, _roll(m, shift, interpret))
        shift *= 2
    e = jnp.exp(scores - m)
    z = e
    shift = c
    while shift < c * k:
        z = z + _roll(z, shift, interpret)
        shift *= 2
    return e / z


def _bd_dot(x, mat_ref):
    """``x @ blockdiag(mat, mat, ...)`` with the block matrix held ONCE:
    ``mat_ref`` is (gin, gout); the same block applies to every aligned
    group of ``gin`` input lanes, outputs concatenated. gin/gout are
    128-multiples (the k-slots are grouped so slices stay tile-aligned —
    misaligned lane slicing would force Mosaic relayouts). Used at the
    wide-lane levels where the full kron'd (L, L) matrix would not fit
    VMEM; at L <= %d the full matrix is passed instead (one MXU dot).
    """ % _MAX_FULL_BD_LANES
    gin, gout = mat_ref.shape
    n_groups = x.shape[1] // gin
    if n_groups == 1:
        return jnp.dot(x, mat_ref[...], preferred_element_type=jnp.float32)
    pieces = [
        jnp.dot(
            x[:, g * gin : (g + 1) * gin],
            mat_ref[...],
            preferred_element_type=jnp.float32,
        )
        for g in range(n_groups)
    ]
    return jnp.concatenate(pieces, axis=1)


def _round1_kernel(
    g_ref,
    c_ref,
    d2_ref,
    e_ref,
    dm_ref,
    bd_ref,
    bd2_ref,
    sp_ref,
    s1_ref,
    o1_ref,
    o2_ref,
    op_ref,
    out1_ref,
    rpe2_ref,
    *,
    h: int,
    k: int,
    interpret: bool,
):
    c2 = 2 * h
    L = k * c2
    # (QB, L) gathered [support-proj | feats] per neighbour; under bfloat16
    # the block arrives bf16 (half the HBM traffic) and the elementwise RPE
    # linearisation + BN affine below still run in f32.
    g = g_ref[0].astype(jnp.float32)
    centerb = jnp.dot(
        c_ref[0], e_ref[...], preferred_element_type=jnp.float32
    )  # (QB, L) center-term broadcast over K (rpe lanes only)
    distb = jnp.dot(
        jnp.sqrt(jnp.maximum(d2_ref[0], 0.0)),
        dm_ref[...],
        preferred_element_type=jnp.float32,
    )  # (QB, L) w9·dist on the rpe lanes
    lane = lax.broadcasted_iota(jnp.int32, (1, L), 1)
    is_rpe = lax.rem(lane, c2) < h
    pre = g + centerb + distb
    rpe = jnp.maximum(pre * s1_ref[...] + o1_ref[...], 0.0)
    cat = jnp.where(is_rpe, rpe, g)
    # The block-diagonal dots run in the constants' dtype (bf16 = one MXU
    # pass vs ~6 f32 passes) with f32 accumulation via preferred_element_type.
    catd = cat.astype(bd_ref.dtype)
    scores = _bd_dot(catd, bd_ref)
    w = _softmax_over_k(scores, c2, k, interpret)  # f32 softmax
    pooled = jnp.dot(
        (w * cat).astype(sp_ref.dtype),
        sp_ref[...],
        preferred_element_type=jnp.float32,
    )
    out1_ref[0] = jnp.maximum(pooled + op_ref[...], 0.0).astype(out1_ref.dtype)
    r2 = _bd_dot(catd, bd2_ref)
    rpe2_ref[0] = jnp.maximum(r2 + o2_ref[...], 0.0).astype(rpe2_ref.dtype)


def _pool2_kernel(
    r2_ref,
    g2_ref,
    e1_ref,
    e2_ref,
    bd_ref,
    sp_ref,
    op_ref,
    out_ref,
    *,
    h: int,
    k: int,
    interpret: bool,
):
    c2 = 2 * h
    # e1/e2 are exact 0/1 placement matrices, so the interleave dots are
    # exact in either dtype; accumulation is f32 via preferred_element_type.
    cat = _bd_dot(r2_ref[0], e1_ref) + _bd_dot(g2_ref[0], e2_ref)
    catd = cat.astype(bd_ref.dtype)
    scores = _bd_dot(catd, bd_ref)
    w = _softmax_over_k(scores, c2, k, interpret)  # f32 softmax
    pooled = jnp.dot(
        (w * cat).astype(sp_ref.dtype),
        sp_ref[...],
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = jnp.maximum(pooled + op_ref[...], 0.0).astype(out_ref.dtype)


def _pool2_res_kernel(
    r2_ref,
    g2_ref,
    fs_ref,
    e1_ref,
    e2_ref,
    bd_ref,
    sp_ref,
    op_ref,
    wm_ref,
    wsh_ref,
    off_ref,
    out_ref,
    *,
    h: int,
    k: int,
    interpret: bool,
):
    """_pool2_kernel + the block residual absorbed (VERDICT r4 #4): the
    pooled output feeds mlp2's eval-affine Dense, the block INPUT rows
    (fs) feed the shortcut's, and the leaky-relu of the sum leaves the
    kernel — mlp2/shortcut stop existing as separate HBM round-trips."""
    c2 = 2 * h
    cat = _bd_dot(r2_ref[0], e1_ref) + _bd_dot(g2_ref[0], e2_ref)
    catd = cat.astype(bd_ref.dtype)
    scores = _bd_dot(catd, bd_ref)
    w = _softmax_over_k(scores, c2, k, interpret)  # f32 softmax
    pooled = jnp.dot(
        (w * cat).astype(sp_ref.dtype),
        sp_ref[...],
        preferred_element_type=jnp.float32,
    )
    pooled = jnp.maximum(pooled + op_ref[...], 0.0)
    res = (
        jnp.dot(
            pooled.astype(wm_ref.dtype),
            wm_ref[...],
            preferred_element_type=jnp.float32,
        )
        + jnp.dot(
            fs_ref[0].astype(wsh_ref.dtype),
            wsh_ref[...],
            preferred_element_type=jnp.float32,
        )
        + off_ref[...]
    )
    out_ref[0] = jnp.where(res > 0.0, res, 0.01 * res).astype(out_ref.dtype)


def _pad_rows(x: jax.Array, qb: int) -> jax.Array:
    n = x.shape[1]
    pad = (-n) % qb
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)


def lfa_round1_fused(
    gathered: jax.Array,
    d2: jax.Array,
    center_term: jax.Array,
    w9: jax.Array,
    b1: jax.Array,
    s1: jax.Array,
    o1: jax.Array,
    ws: jax.Array,
    wp: jax.Array,
    bp: jax.Array,
    sp: jax.Array,
    op: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    s2: jax.Array,
    o2: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """First LFA round, fused: RPE-MLP(+BN,relu) → attentive pool 1 →
    mlp_rpe2(+BN,relu).

    :param gathered: (B, N, K, 2h) combined neighbour gather — lanes
        [:h] = support-projection rows ((Wn−Wd)·xyz, FusedRPEMLP),
        [h:] = mlp1 features.
    :param d2: (B, N, K) squared neighbour distances.
    :param center_term: (B, N, h) per-point (Wc+Wd)·xyz.
    :param w9/b1: mlp_rpe1 distance-column weight (h,) and bias (h,).
    :param s1/o1: mlp_rpe1 BatchNorm eval affine (h,).
    :param ws: pool1 score kernel (2h, 2h); wp/bp pool1 MLP (2h, h)/(h,);
        sp/op its BN affine (h,).
    :param w2/b2: mlp_rpe2 Dense (h, h)/(h,); s2/o2 its BN affine (h,).
    :return: (pooled1 (B, N, h), rpe2 (B, N, K·h)) — both post-BN-relu,
        in ``gathered``'s dtype (float32 or bfloat16 — the bf16 variant
        keeps I/O and the MXU dots bf16 with f32 accumulation/softmax).
    """
    B, n, k, c2 = gathered.shape
    h = c2 // 2
    L = k * c2
    f32 = jnp.float32
    io = jnp.bfloat16 if gathered.dtype == jnp.bfloat16 else f32
    qb = _QB if L <= _MAX_FULL_BD_LANES else _QB_WIDE
    g = _pad_rows(gathered.reshape(B, n, L).astype(io), qb)
    d2p = _pad_rows(d2.astype(f32), qb)
    ct = _pad_rows(center_term.astype(f32), qb)
    n_pad = g.shape[1]

    eye_k = jnp.eye(k, dtype=f32)
    ones_row = jnp.ones((1, k), f32)
    pad_h = lambda a: jnp.pad(a, ((0, 0), (0, h)))  # (h, h) -> (h, 2h)
    e_mat = jnp.kron(ones_row, pad_h(jnp.eye(h, dtype=f32)))  # (h, L)
    dm = jnp.kron(eye_k, pad_h(w9.astype(f32)[None, :]))  # (K, L)
    w2s = w2.astype(f32) * s2.astype(f32)[None, :]
    if L <= _MAX_FULL_BD_LANES:
        bd = jnp.kron(eye_k, ws.astype(f32)).astype(io)  # (L, L)
        bd2 = jnp.kron(
            eye_k, jnp.pad(w2s, ((0, h), (0, 0)))
        ).astype(io)  # (L, K·h)
    else:
        # grouped block-diagonal pieces (see _bd_dot): one VMEM-resident
        # block applied per 128-aligned lane group inside the kernel
        g1 = max(1, 128 // c2)
        bd = jnp.kron(jnp.eye(g1, dtype=f32), ws.astype(f32)).astype(io)
        g2k = max(1, 128 // h)
        bd2 = jnp.kron(
            jnp.eye(g2k, dtype=f32), jnp.pad(w2s, ((0, h), (0, 0)))
        ).astype(io)
    sp_mat = jnp.kron(
        jnp.ones((k, 1), f32), wp.astype(f32) * sp.astype(f32)[None, :]
    ).astype(io)  # (L, h)
    s1v = jnp.tile(jnp.concatenate([s1.astype(f32), jnp.ones(h, f32)]), k)[None]
    o1v = jnp.tile(
        jnp.concatenate([s1.astype(f32) * b1.astype(f32) + o1.astype(f32),
                         jnp.zeros(h, f32)]),
        k,
    )[None]
    o2v = jnp.tile(s2.astype(f32) * b2.astype(f32) + o2.astype(f32), k)[None]
    opv = (sp.astype(f32) * bp.astype(f32) + op.astype(f32))[None]

    grid = (B, n_pad // qb)
    row_spec = lambda width: pl.BlockSpec(
        (1, qb, width), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out1, rpe2 = pl.pallas_call(
        functools.partial(_round1_kernel, h=h, k=k, interpret=interpret),
        grid=grid,
        in_specs=[
            row_spec(L),
            row_spec(h),
            row_spec(k),
            _const_spec((h, L)),
            _const_spec((k, L)),
            _const_spec(tuple(bd.shape)),
            _const_spec(tuple(bd2.shape)),
            _const_spec((L, h)),
            _const_spec((1, L)),
            _const_spec((1, L)),
            _const_spec((1, k * h)),
            _const_spec((1, h)),
        ],
        out_specs=[row_spec(h), row_spec(k * h)],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, h), io),
            jax.ShapeDtypeStruct((B, n_pad, k * h), io),
        ],
        interpret=interpret,
    )(g, ct, d2p, e_mat, dm, bd, bd2, sp_mat, s1v, o1v, o2v, opv)
    return out1[:, :n], rpe2[:, :n]


def _pool2_mats(k, h, ws, wp, sp, io):
    """Interleave/score/pool matrices for the pool-2 kernels — full kron
    versions at L <= _MAX_FULL_BD_LANES, 128-aligned grouped blocks for
    the wide-lane levels (consumed by _bd_dot)."""
    f32 = jnp.float32
    c2 = 2 * h
    L = k * c2
    eye_h = jnp.eye(h, dtype=f32)
    if L <= _MAX_FULL_BD_LANES:
        eye_k = jnp.eye(k, dtype=f32)
        e1 = jnp.kron(eye_k, jnp.pad(eye_h, ((0, 0), (0, h)))).astype(io)
        e2 = jnp.kron(eye_k, jnp.pad(eye_h, ((0, 0), (h, 0)))).astype(io)
        bd = jnp.kron(eye_k, ws.astype(f32)).astype(io)
    else:
        ge = max(1, 128 // h)
        eg = jnp.eye(ge, dtype=f32)
        e1 = jnp.kron(eg, jnp.pad(eye_h, ((0, 0), (0, h)))).astype(io)
        e2 = jnp.kron(eg, jnp.pad(eye_h, ((0, 0), (h, 0)))).astype(io)
        g1 = max(1, 128 // c2)
        bd = jnp.kron(jnp.eye(g1, dtype=f32), ws.astype(f32)).astype(io)
    sp_mat = jnp.kron(
        jnp.ones((k, 1), f32), wp.astype(f32) * sp.astype(f32)[None, :]
    ).astype(io)  # (L, 2h)
    return e1, e2, bd, sp_mat


def attentive_pool2_fused(
    rpe2: jax.Array,
    g2: jax.Array,
    ws: jax.Array,
    wp: jax.Array,
    bp: jax.Array,
    sp: jax.Array,
    op: jax.Array,
    k: int,
    interpret: bool = False,
) -> jax.Array:
    """Second attentive pooling, fused: concat(rpe2, gathered pooled
    features) → scores → softmax over K → weighted sum → pool MLP + BN +
    relu.

    :param rpe2: (B, N, K·h) from :func:`lfa_round1_fused`.
    :param g2: (B, N, K, h) gathered pooled-feature rows (flattened OK).
    :param ws: pool2 score kernel (2h, 2h); wp/bp pool2 MLP (2h, 2h)/(2h,);
        sp/op its BN affine (2h,).
    :return: (B, N, 2h) pooled output (post-BN-relu), in ``rpe2``'s dtype.
    """
    B, n = rpe2.shape[:2]
    kh = rpe2.shape[-1] if rpe2.ndim == 3 else rpe2.shape[-2] * rpe2.shape[-1]
    h = kh // k
    c2 = 2 * h
    L = k * c2
    f32 = jnp.float32
    io = jnp.bfloat16 if rpe2.dtype == jnp.bfloat16 else f32
    qb = _QB if L <= _MAX_FULL_BD_LANES else _QB_WIDE
    r2 = _pad_rows(rpe2.reshape(B, n, kh).astype(io), qb)
    g2f = _pad_rows(g2.reshape(B, n, kh).astype(io), qb)
    n_pad = r2.shape[1]

    e1, e2, bd, sp_mat = _pool2_mats(k, h, ws, wp, sp, io)
    opv = (sp.astype(f32) * bp.astype(f32) + op.astype(f32))[None]

    grid = (B, n_pad // qb)
    row_spec = lambda width: pl.BlockSpec(
        (1, qb, width), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_pool2_kernel, h=h, k=k, interpret=interpret),
        grid=grid,
        in_specs=[
            row_spec(kh),
            row_spec(kh),
            _const_spec(tuple(e1.shape)),
            _const_spec(tuple(e2.shape)),
            _const_spec(tuple(bd.shape)),
            _const_spec((L, c2)),
            _const_spec((1, c2)),
        ],
        out_specs=row_spec(c2),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, c2), io),
        interpret=interpret,
    )(r2, g2f, e1, e2, bd, sp_mat, opv)
    return out[:, :n]


def attentive_pool2_residual_fused(
    rpe2: jax.Array,
    g2: jax.Array,
    ws: jax.Array,
    wp: jax.Array,
    bp: jax.Array,
    sp: jax.Array,
    op: jax.Array,
    f_in: jax.Array,
    wm: jax.Array,
    wsh: jax.Array,
    off: jax.Array,
    k: int,
    interpret: bool = False,
) -> jax.Array:
    """:func:`attentive_pool2_fused` with the block residual absorbed:
    returns ``leaky_relu(mlp2(pool2(...)) + shortcut(f_in), 0.01)`` —
    the LFA block's final output — in one kernel.

    :param f_in: (B, N, F) the block's INPUT feature rows (sorted order).
    :param wm: mlp2 eval-affine matrix ``W·s`` (2h, 4h).
    :param wsh: shortcut eval-affine matrix ``W·s`` (F, 4h).
    :param off: combined offset ``(s_m·b_m + o_m) + (s_sh·b_sh + o_sh)``
        (4h,).
    """
    B, n = rpe2.shape[:2]
    kh = rpe2.shape[-1] if rpe2.ndim == 3 else rpe2.shape[-2] * rpe2.shape[-1]
    h = kh // k
    c2 = 2 * h
    n2 = wm.shape[-1]
    L = k * c2
    f32 = jnp.float32
    io = jnp.bfloat16 if rpe2.dtype == jnp.bfloat16 else f32
    nf = f_in.shape[-1]
    qb = _QB if L <= _MAX_FULL_BD_LANES else _QB_WIDE
    r2 = _pad_rows(rpe2.reshape(B, n, kh).astype(io), qb)
    g2f = _pad_rows(g2.reshape(B, n, kh).astype(io), qb)
    fs = _pad_rows(f_in.astype(io), qb)
    n_pad = r2.shape[1]

    e1, e2, bd, sp_mat = _pool2_mats(k, h, ws, wp, sp, io)
    opv = (sp.astype(f32) * bp.astype(f32) + op.astype(f32))[None]
    wm_c = wm.astype(f32).astype(io)
    wsh_c = wsh.astype(f32).astype(io)
    off_c = off.astype(f32)[None]

    grid = (B, n_pad // qb)
    row_spec = lambda width: pl.BlockSpec(
        (1, qb, width), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_pool2_res_kernel, h=h, k=k, interpret=interpret),
        grid=grid,
        in_specs=[
            row_spec(kh),
            row_spec(kh),
            row_spec(nf),
            _const_spec(tuple(e1.shape)),
            _const_spec(tuple(e2.shape)),
            _const_spec(tuple(bd.shape)),
            _const_spec((L, c2)),
            _const_spec((1, c2)),
            _const_spec((c2, n2)),
            _const_spec((nf, n2)),
            _const_spec((1, n2)),
        ],
        out_specs=row_spec(n2),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, n2), io),
        interpret=interpret,
    )(r2, g2f, fs, e1, e2, bd, sp_mat, opv, wm_c, wsh_c, off_c)
    return out[:, :n]
