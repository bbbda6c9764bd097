"""Fused blocked wavefront kernels — natural-layout Pallas backend.

The diagonal-streaming backend (:mod:`deepblast_tpu.ops.dp_pallas`) needs
its operands re-laid diagonal-major in HBM, and those XLA skew/unskew
transposes cost more than the DP itself.  This backend keeps every HBM
array in its natural ``(B, N, M)`` layout and performs the skewing *inside*
the kernel, per VMEM block:

* the DP matrix is tiled into ``(RB, MB)`` blocks processed in row-major
  order by a sequential grid — each block depends only on its left/top
  neighbours, whose boundary vectors ride in persistent VMEM scratch
  (left column / previous slab-row's bottom row / corner);
* inside a block, operands are skewed with a single strided-roll
  (``pltpu.roll(..., stride=1, stride_axis=sublane)``) plus an in-VMEM
  transpose, so every local anti-diagonal is one contiguous
  ``(Bt, RB)`` vector and the wavefront walk is a `fori_loop` of pure
  (8, 128)-register VPU steps;
* results are un-skewed the same way and written back in natural layout —
  Q/E traffic shrinks by the 2.5x diagonal-padding factor and no XLA
  transpose ever touches HBM.

Cross-block halo values needed by the reverse passes (the Q row/column just
outside each block) are emitted by the forward kernel as small extra
boundary arrays.

Reference semantics are identical to deepblast/nw.py:46-135 (CPU indexing
``A[i-1, j-1]``); parity is tested against the scan oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.ops import smooth
from deepblast_tpu.ops.dp_scan import MODE_BOUNDS

__all__ = ["forward_fused", "backward_fused", "expected_fused"]

BT = 8      # batch sublane tile
RB = 128    # block rows (= diagonal vector lanes)
MBK = 128   # block cols


def _round_up(x, m):
    return -(-x // m) * m


def _interpret():
    return jax.default_backend() != "tpu"


def _skew_block(blk, KL):
    """(Bt, RB, MB) -> (Bt, KL, RB); out[b, d, i] = blk[b, i, d - i]."""
    p = jnp.pad(blk, ((0, 0), (0, 0), (0, KL - blk.shape[2])))
    rolled = pltpu.roll(p, 0, 2, stride=1, stride_axis=1)
    return jnp.swapaxes(rolled, 1, 2)


def _sublane_rev(x):
    """Reverse dim 1 with static slices (Mosaic has no `rev` primitive)."""
    n = x.shape[1]
    return jnp.concatenate(
        [x[:, i:i + 1, :] for i in range(n - 1, -1, -1)], axis=1)


def _unskew_block(sk, MB):
    """(Bt, KL, RB) -> (Bt, RB, MB); inverse of :func:`_skew_block`.

    Mosaic only supports non-negative small strides and has no reverse
    primitive in this toolchain, so the ``-i`` per-row shift is expressed
    as ``rev . roll(shift=KL-RB+1, stride=+1) . rev`` over sublanes (for a
    cyclic roll, conjugating a positive-stride roll with a reversal flips
    the stride sign).
    """
    r = jnp.swapaxes(sk, 1, 2)            # (Bt, RB, KL)
    KL = r.shape[2]
    RBl = r.shape[1]
    sh = KL - RBl + 1
    un = _sublane_rev(
        pltpu.roll(_sublane_rev(r), sh, 2, stride=1, stride_axis=1))
    return un[:, :, :MB]


def _shr_lane(v):
    """out[:, i] = v[:, i-1]; out[:, 0] = 0 (lane shift within (Bt, RB))."""
    z = jnp.zeros((v.shape[0], 1), v.dtype)
    return jnp.concatenate([z, v[:, :-1]], axis=1)


def _fwd_kernel(ln_ref, lm_ref, th_ref, ad_ref,
                vt_ref, qx_ref, qm_ref, qy_ref,
                qxr_ref, qmr_ref, qyc_ref, qmc_ref, qmcc_ref,
                top_scr, left_scr, corner_scr, topsk,
                thsk, adsk, vsk, qxsk, qmsk, qysk,
                *, lo, operator, MB, NS, MS):
    s = pl.program_id(1)
    m = pl.program_id(2)
    KL = RB + MB
    dtype = vt_ref.dtype

    @pl.when((s == 0) & (m == 0))
    def _():
        vt_ref[:] = jnp.zeros_like(vt_ref)

    ln = ln_ref[:]                       # (Bt, 1) int32 (DP lengths)
    lm = lm_ref[:]
    th_blk = th_ref[:]                   # (Bt, RB, MB)
    ad_blk = ad_ref[:]

    thsk[:] = _skew_block(th_blk, KL)
    adsk[:] = _skew_block(ad_blk, KL)

    zero = jnp.zeros((), dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BT, RB), 1)
    gi = s * RB + lane                                    # global theta row

    # boundary vectors (masked at the sheet edges)
    top_full = jnp.where(s > 0, top_scr[:, pl.ds(m * MB, MB)], zero)
    left_col = jnp.where(m > 0, left_scr[:], zero)        # (Bt, RB)
    corner = jnp.where((s > 0) & (m > 0), corner_scr[:], zero)  # (Bt, 1)
    shr_left = _shr_lane(left_col)
    # boundary row re-laid sublane-major so the walk can index it by d
    topT = jnp.swapaxes(top_full[:, None, :], 1, 2)       # (Bt, MB, 1)
    topsk[:] = jnp.pad(topT, ((0, 0), (0, KL - MB), (0, 0)))


    corner_b = jnp.broadcast_to(corner, (BT, RB))

    def step(d, carry):
        v1, v2, vt_acc = carry
        thv = thsk[:, d, :]
        adv = adsk[:, d, :]
        # top-row values V[-1, d] and V[-1, d-1]
        dm1 = jnp.maximum(d - 1, 0)
        top_d = jnp.broadcast_to(
            jnp.where(d < MB, topsk[:, d, 0:1], zero), (BT, RB))
        top_dm1 = jnp.broadcast_to(
            jnp.where((d >= 1) & (d - 1 < MB), topsk[:, dm1, 0:1], zero),
            (BT, RB))

        is_lane0 = lane == 0
        is_j0 = lane == d                                 # local j == 0
        v1s = _shr_lane(v1)
        v2s = _shr_lane(v2)
        x_base = jnp.where(is_lane0, top_d, v1s)          # V[i-1, j]
        m_base = jnp.where(is_lane0, top_dm1, v2s)        # V[i-1, j-1]
        m_base = jnp.where(is_j0, shr_left, m_base)
        m_base = jnp.where(is_lane0 & (d == 0), corner_b, m_base)
        y_base = jnp.where(is_j0, left_col, v1)           # V[i, j-1]

        xarg = adv + x_base
        marg = m_base
        yarg = adv + y_base
        val, (qx, qm, qy) = smooth.max3(operator, xarg, marg, yarg)
        vnew = thv + val

        gj = m * MB + d - lane                            # global theta col
        in_block = (lane <= d) & (d - lane < MB)
        valid = (in_block & (gi >= lo - 1) & (gj >= lo - 1)
                 & (gi < ln) & (gj < lm))
        vnew = jnp.where(valid, vnew, zero)
        qx = jnp.where(valid, qx, zero)
        qm = jnp.where(valid, qm, zero)
        qy = jnp.where(valid, qy, zero)

        vsk[:, d, :] = vnew
        qxsk[:, d, :] = qx
        qmsk[:, d, :] = qm
        qysk[:, d, :] = qy

        term = (gi == ln - 1) & (gj == lm - 1)
        vt_acc = vt_acc + jnp.where(term, vnew, zero)
        return vnew, v1, vt_acc

    # derive the zero init from real data: a constant-splat init would get a
    # replicated Mosaic layout the loop body cannot re-materialise
    zerov = th_blk[:, :, 0] * 0.0
    _, _, vt_acc = jax.lax.fori_loop(
        0, RB + MB - 1, step, (zerov, zerov, zerov))
    vt_ref[:] += jnp.sum(vt_acc, axis=1, keepdims=True)

    v_nat = _unskew_block(vsk[:], MB)
    qx_nat = _unskew_block(qxsk[:], MB)
    qm_nat = _unskew_block(qmsk[:], MB)
    qy_nat = _unskew_block(qysk[:], MB)
    qx_ref[:] = qx_nat
    qm_ref[:] = qm_nat
    qy_ref[:] = qy_nat

    # halo rows/cols for the reverse pass: this block's TOP row and LEFT col
    qxr_ref[0] = qx_nat[:, 0, :]
    qmr_ref[0] = qm_nat[:, 0, :]
    qyc_ref[0] = qy_nat[:, :, 0]
    qmc_ref[0] = qm_nat[:, :, 0]
    qmcc_ref[0, 0] = qm_nat[:, 0, 0:1]

    # update boundary carries for the next blocks (read-before-write order)
    corner_scr[:] = top_full[:, MB - 1:MB]
    top_scr[:, pl.ds(m * MB, MB)] = v_nat[:, RB - 1, :]
    left_scr[:] = v_nat[:, :, MB - 1]


def forward_fused(theta, A, ln, lm, *, mode="nw", operator="softmax"):
    """Natural-layout blocked forward pass.

    Returns ``vt (B,)`` and a residual dict with natural-layout ``q``
    components plus the halo boundary arrays for the reverse pass.
    """
    B, N, M = theta.shape
    dtype = theta.dtype
    Bp = _round_up(B, BT)
    Np = _round_up(N, RB)
    MB = MBK
    Mp = _round_up(M, MB)
    NS, MS = Np // RB, Mp // MB
    KL = RB + MB
    lo = MODE_BOUNDS[mode][0]

    th = jnp.pad(theta, ((0, Bp - B), (0, Np - N), (0, Mp - M)))
    ad = jnp.pad(A, ((0, Bp - B), (0, Np - N), (0, Mp - M)))
    lnp = jnp.pad(ln.astype(jnp.int32), (0, Bp - B)).reshape(Bp, 1)
    lmp = jnp.pad(lm.astype(jnp.int32), (0, Bp - B)).reshape(Bp, 1)

    def blk(i=None, j=None):
        return pl.BlockSpec((BT, RB, MB), lambda b, s, m: (b, s, m),
                            memory_space=pltpu.VMEM)

    len_spec = pl.BlockSpec((BT, 1), lambda b, s, m: (b, 0),
                            memory_space=pltpu.VMEM)
    # halo arrays lead with the small block-index dims so the trailing two
    # block dims stay (8, 128)-aligned, as compiled TPU lowering requires
    row_spec = pl.BlockSpec((1, BT, MB), lambda b, s, m: (s, b, m),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, BT, RB), lambda b, s, m: (m, b, s),
                            memory_space=pltpu.VMEM)
    cc_spec = pl.BlockSpec((1, 1, BT, 1), lambda b, s, m: (s, m, b, 0),
                           memory_space=pltpu.VMEM)

    kern = functools.partial(_fwd_kernel, lo=lo, operator=operator,
                             MB=MB, NS=NS, MS=MS)
    out = pl.pallas_call(
        kern,
        grid=(Bp // BT, NS, MS),
        in_specs=[len_spec, len_spec, blk(), blk()],
        out_specs=[
            pl.BlockSpec((BT, 1), lambda b, s, m: (b, 0),
                         memory_space=pltpu.VMEM),
            blk(), blk(), blk(),
            row_spec, row_spec, col_spec, col_spec, cc_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), dtype),
            jax.ShapeDtypeStruct((Bp, Np, Mp), dtype),
            jax.ShapeDtypeStruct((Bp, Np, Mp), dtype),
            jax.ShapeDtypeStruct((Bp, Np, Mp), dtype),
            jax.ShapeDtypeStruct((NS, Bp, Mp), dtype),   # qx top rows
            jax.ShapeDtypeStruct((NS, Bp, Mp), dtype),   # qm top rows
            jax.ShapeDtypeStruct((MS, Bp, Np), dtype),   # qy left cols
            jax.ShapeDtypeStruct((MS, Bp, Np), dtype),   # qm left cols
            jax.ShapeDtypeStruct((NS, MS, Bp, 1), dtype),  # qm corners
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, Mp), dtype),       # top rows (bottom of s-1)
            pltpu.VMEM((BT, RB), dtype),       # left col
            pltpu.VMEM((BT, 1), dtype),        # corner
            pltpu.VMEM((BT, KL, 1), dtype),    # top row, sublane-major
            pltpu.VMEM((BT, KL, RB), dtype),   # th skewed
            pltpu.VMEM((BT, KL, RB), dtype),   # ad skewed
            pltpu.VMEM((BT, KL, RB), dtype),   # V skewed
            pltpu.VMEM((BT, KL, RB), dtype),   # qx skewed
            pltpu.VMEM((BT, KL, RB), dtype),   # qm skewed
            pltpu.VMEM((BT, KL, RB), dtype),   # qy skewed
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(lnp, lmp, th, ad)
    vt, qx, qm, qy, qxr, qmr, qyc, qmc, qmcc = out
    return vt[:B, 0], dict(qx=qx, qm=qm, qy=qy, qx_rows=qxr, qm_rows=qmr,
                           qy_cols=qyc, qm_cols=qmc, qm_corners=qmcc,
                           shape=(B, N, M))


# ---------------------------------------------------------------------------
# backward: E[i,j] = Qx[i+1,j] E[i+1,j] + Qm[i+1,j+1] E[i+1,j+1]
#                  + Qy[i,j+1] E[i,j+1]     (theta-indexed: all shifted by 1)
# Blocks processed in reverse row-major order; halo Q values come from the
# forward's boundary outputs.
# ---------------------------------------------------------------------------

def _bwd_kernel(ln_ref, lm_ref, et_ref, qx_ref, qm_ref, qy_ref,
                qxr_ref, qmr_ref, qyc_ref, qmc_ref, qmcc_ref,
                e_ref,
                bot_scr, right_scr, corner_scr, botsk,
                qxsk, qmsk, qysk, esk,
                *, lo, MB, NS, MS):
    KL = RB + MB
    s = (NS - 1) - pl.program_id(1)
    m = (MS - 1) - pl.program_id(2)
    dtype = e_ref.dtype
    zero = jnp.zeros((), dtype)

    ln = ln_ref[:]
    lm = lm_ref[:]
    et_b = jnp.broadcast_to(et_ref[:], (BT, RB))

    # q blocks shifted: for cell (i, j) we need q at (i+1, j), (i+1, j+1),
    # (i, j+1) in DP coords == (i, j), (i, j+1)... in *theta* coords the
    # recursion over E (theta-indexed, E[i,j] ~ DP cell (i+1, j+1)) is
    #   E[i,j] = Qx[i+1,j] E[i+1,j] + Qm[i+1,j+1] E[i+1,j+1]
    #          + Qy[i,j+1] E[i,j+1]
    # with Q in theta coords.  Build shifted in-block Q with halo:
    qx_blk = qx_ref[:]
    qm_blk = qm_ref[:]
    qy_blk = qy_ref[:]
    # rows i+1: shift up, halo = next slab's top row
    qx_dn = jnp.concatenate([qx_blk[:, 1:, :], qxr_ref[0][:, None, :]],
                            axis=1)
    qm_dn = jnp.concatenate([qm_blk[:, 1:, :], qmr_ref[0][:, None, :]],
                            axis=1)
    # cols j+1 on the row-shifted qm: need qm[i+1, j+1]
    qm_col = jnp.concatenate([qmc_ref[0][:, 1:], qmcc_ref[0, 0]], axis=1)
    qm_dn_rt = jnp.concatenate([qm_dn[:, :, 1:], qm_col[:, :, None]],
                               axis=2)
    qy_rt = jnp.concatenate([qy_blk[:, :, 1:], qyc_ref[0][:, :, None]],
                            axis=2)

    qxsk[:] = _skew_block(qx_dn, KL)
    qmsk[:] = _skew_block(qm_dn_rt, KL)
    qysk[:] = _skew_block(qy_rt, KL)

    lane = jax.lax.broadcasted_iota(jnp.int32, (BT, RB), 1)
    gi = s * RB + lane

    bot_full = jnp.where(s < NS - 1, bot_scr[:, pl.ds(m * MB, MB)], zero)
    right_col = jnp.where(m < MS - 1, right_scr[:], zero)
    corner = jnp.where((s < NS - 1) & (m < MS - 1), corner_scr[:], zero)
    corner_b = jnp.broadcast_to(corner, (BT, RB))
    # shl of right_col: right_col[i+1]
    shl_right = jnp.concatenate(
        [right_col[:, 1:], jnp.zeros((BT, 1), dtype)], axis=1)
    botT = jnp.swapaxes(bot_full[:, None, :], 1, 2)       # (Bt, MB, 1)
    botsk[:] = jnp.pad(botT, ((0, 0), (0, KL - MB), (0, 0)))

    def step(dd, carry):
        e1, e2 = carry          # E diags d+1, d+2 (local)
        d = (RB + MB - 2) - dd
        qxv = qxsk[:, d, :]
        qmv = qmsk[:, d, :]
        qyv = qysk[:, d, :]

        # E[i+1, j] lives on diag d+1 at lane i+1 -> shl(e1); bottom halo
        # enters at lane RB-1: E[RB, j] = bot_full[d - (RB - 1)]
        is_lastlane = lane == (RB - 1)
        is_jlast = lane == d - (MB - 1)          # local j == MB-1
        dmrb = d - (RB - 1)
        dmrb_c = jnp.clip(dmrb, 0, MB - 1)
        bot_d = jnp.broadcast_to(jnp.where(
            (dmrb >= 0) & (dmrb < MB), botsk[:, dmrb_c, 0:1], zero),
            (BT, RB))
        dmrb1_c = jnp.clip(dmrb + 1, 0, MB - 1)
        bot_d1 = jnp.broadcast_to(jnp.where(
            (dmrb + 1 >= 0) & (dmrb + 1 < MB), botsk[:, dmrb1_c, 0:1],
            zero), (BT, RB))

        e1l = jnp.concatenate(
            [e1[:, 1:], jnp.zeros((BT, 1), dtype)], axis=1)
        e2l = jnp.concatenate(
            [e2[:, 1:], jnp.zeros((BT, 1), dtype)], axis=1)
        eb_dn = jnp.where(is_lastlane, bot_d, e1l)        # E[i+1, j]
        eb_dg = jnp.where(is_lastlane, bot_d1, e2l)       # E[i+1, j+1]
        eb_dg = jnp.where(is_jlast, shl_right, eb_dg)
        eb_dg = jnp.where(is_lastlane & (d == RB + MB - 2), corner_b,
                          eb_dg)
        eb_rt = jnp.where(is_jlast, right_col, e1)        # E[i, j+1]

        enew = qxv * eb_dn + qmv * eb_dg + qyv * eb_rt
        gj = m * MB + d - lane
        in_block = (lane <= d) & (d - lane < MB)
        valid = (in_block & (gi >= lo - 1) & (gj >= lo - 1)
                 & (gi < ln) & (gj < lm))
        enew = jnp.where(valid, enew, zero)
        seed = (gi == ln - 1) & (gj == lm - 1)
        enew = enew + jnp.where(seed & in_block, et_b, zero)
        esk[:, d, :] = enew
        return enew, e1

    zerov = qx_blk[:, :, 0] * 0.0
    jax.lax.fori_loop(0, RB + MB - 1, step, (zerov, zerov))

    e_nat = _unskew_block(esk[:], MB)
    e_ref[:] = e_nat

    corner_scr[:] = bot_full[:, 0:1]
    bot_scr[:, pl.ds(m * MB, MB)] = e_nat[:, 0, :]
    right_scr[:] = e_nat[:, :, 0]


def backward_fused(Et, res, ln, lm, *, mode="nw"):
    B, N, M = res["shape"]
    qx = res["qx"]
    Bp, Np, Mp = qx.shape
    MB = MBK
    NS, MS = Np // RB, Mp // MB
    KL = RB + MB
    dtype = qx.dtype
    lo = MODE_BOUNDS[mode][1]

    lnp = jnp.pad(ln.astype(jnp.int32), (0, Bp - B)).reshape(Bp, 1)
    lmp = jnp.pad(lm.astype(jnp.int32), (0, Bp - B)).reshape(Bp, 1)
    etp = jnp.pad(Et.astype(dtype), (0, Bp - B)).reshape(Bp, 1)

    def rev(b, s, m):
        return (b, NS - 1 - s, MS - 1 - m)

    blk = pl.BlockSpec((BT, RB, MB), rev, memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((BT, 1), lambda b, s, m: (b, 0),
                            memory_space=pltpu.VMEM)
    # halo specs read the *next* block row/col (clamped at the far edge;
    # the kernel masks the contribution so clamped garbage never matters)
    row_next = pl.BlockSpec(
        (1, BT, MB),
        lambda b, s, m: (jnp.minimum(NS - s, NS - 1), b, MS - 1 - m),
        memory_space=pltpu.VMEM)
    col_next = pl.BlockSpec(
        (1, BT, RB),
        lambda b, s, m: (jnp.minimum(MS - m, MS - 1), b, NS - 1 - s),
        memory_space=pltpu.VMEM)
    cc_next = pl.BlockSpec(
        (1, 1, BT, 1),
        lambda b, s, m: (jnp.minimum(NS - s, NS - 1),
                         jnp.minimum(MS - m, MS - 1), b, 0),
        memory_space=pltpu.VMEM)

    kern = functools.partial(_bwd_kernel, lo=lo, MB=MB, NS=NS, MS=MS)
    (E,) = pl.pallas_call(
        kern,
        grid=(Bp // BT, NS, MS),
        in_specs=[len_spec, len_spec, len_spec,
                  blk, blk, blk,
                  row_next, row_next, col_next, col_next, cc_next],
        out_specs=[blk],
        out_shape=[jax.ShapeDtypeStruct((Bp, Np, Mp), dtype)],
        scratch_shapes=[
            pltpu.VMEM((BT, Mp), dtype),       # bottom rows (top of s+1)
            pltpu.VMEM((BT, RB), dtype),       # right col
            pltpu.VMEM((BT, 1), dtype),        # corner
            pltpu.VMEM((BT, KL, 1), dtype),    # bottom row, sublane-major
            pltpu.VMEM((BT, KL, RB), dtype),
            pltpu.VMEM((BT, KL, RB), dtype),
            pltpu.VMEM((BT, KL, RB), dtype),
            pltpu.VMEM((BT, KL, RB), dtype),   # E skewed
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(lnp, lmp, etp, res["qx"], res["qm"], res["qy"],
      res["qx_rows"], res["qm_rows"], res["qy_cols"], res["qm_cols"],
      res["qm_corners"])
    return E[:B, :N, :M]


def expected_fused(theta, A, Et, ln, lm, *, mode="nw", operator="softmax",
                   return_gap=False):
    """Fused natural-layout decode: forward + backward, E in (B, N, M)."""
    vt, res = forward_fused(theta, A, ln, lm, mode=mode, operator=operator)
    E = backward_fused(Et, res, ln, lm, mode=mode)
    if return_gap:
        B, N, M = res["shape"]
        EA = E * (res["qx"][:B, :N, :M] + res["qy"][:B, :N, :M])
        return E, EA
    return E
