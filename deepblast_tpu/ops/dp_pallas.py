"""Pallas TPU wavefront kernels for the smoothed alignment DP.

This is the performance backend replacing the reference's Numba-CUDA kernels
(reference: deepblast/nw_cuda.py:46-165, deepblast/sw_cuda.py:46-165).  The
reference launches one CUDA *thread* per pair, each running the whole O(N*M)
recursion serially with a 2-row rolling buffer (deepblast/nw_cuda.py:46-79).
Here each grid step processes one anti-diagonal for a whole sublane-tile of
pairs at once:

* grid = (batch_tiles, K) with K = N + M - 1 anti-diagonals; the diagonal
  axis is innermost and sequential, the DP carry lives in VMEM scratch.
* every input/output stream is in diagonal-major (skew) layout
  ``(K, B, L)`` so each step's block is a dense, contiguous
  ``(B_tile, L)`` tile — sublane = batch, lane = diagonal slot.  Pallas
  double-buffers the HBM streams across grid steps automatically.
* the per-step compute is pure VPU work of width ``B_tile * L`` — i.e.
  ``B_tile * L``-way parallelism per diagonal versus the reference's
  ``B``-way (one lane per pair), which is where the on-paper >=10x headroom
  of BASELINE.md comes from.

The boundary conditions of the four passes (masking, terminal selection,
seeding, and the clamped off-end diagonal reads of the reverse passes) are
identical to :mod:`deepblast_tpu.ops.dp_scan`, which is the oracle this
backend is parity-tested against (interpreter mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.ops import smooth
from deepblast_tpu.ops.dp_scan import MODE_BOUNDS
from deepblast_tpu.ops.skew_pallas import skew_pallas, unskew_pallas

__all__ = [
    "skew_input",
    "unskew_output",
    "forward_pallas",
    "backward_pallas",
    "adjoint_forward_pallas",
    "adjoint_backward_pallas",
    "register",
]

# Batch sublane-tile per kernel instance.  8 is the fp32 sublane quantum; a
# larger tile amortises per-step pipeline overhead when the batch allows.
BTILE = 8
LANE = 128

# Anti-diagonals computed per grid step in the forward/adjoint-forward
# kernels.  The DP carry chain is inherently serial, so per-step grid and
# DMA-issue overhead (~7 us/step measured) dominates the ~2.6 us of VPU
# work per diagonal; unrolling T diagonals into one step amortises it.
# Streams are row-padded to a multiple of T by skew_input.
DIAG_UNROLL = 8

# Zero out soft-argmax outputs outside the valid region.  Correctness does
# not require it: every consumer multiplies Q against values that are
# masked-zero off the valid region (the backward/adjoint E carries and the
# masked E_A products), so the default skips three select passes per
# diagonal step.  The scan oracle keeps masking; parity tests compare the
# valid region only.
MASK_Q = False

# Storage dtype for the soft-argmax (Q) streams.  They are probabilities in
# [0, 1] consumed multiplicatively, so bfloat16 halves the dominant HBM
# traffic at ~3 decimal digits of precision; compute stays fp32.  Opt-in:
# set to jnp.bfloat16 (e.g. for inference/benchmarks); tests pin fp32.
Q_DTYPE = None  # None = same as input dtype


def _round_up(x, m):
    return -(-x // m) * m


def _interpret():
    return jax.default_backend() != "tpu"


def _shr(v):
    """out[:, i] = v[:, i-1]; out[:, 0] = 0."""
    z = jnp.zeros((v.shape[0], 1), v.dtype)
    return jnp.concatenate([z, v[:, :-1]], axis=1)


def _shl(v):
    """out[:, i] = v[:, i+1]; out[:, -1] = 0."""
    z = jnp.zeros((v.shape[0], 1), v.dtype)
    return jnp.concatenate([v[:, 1:], z], axis=1)


def _masks(iarr, d, ln, lm, lo):
    j = d - iarr
    valid = (iarr >= lo) & (j >= lo) & (iarr <= ln) & (j <= lm)
    term = (iarr == ln) & (d == ln + lm)
    return valid, term


def _pad_skew(x, Bp, L, shift):
    """(K, B, N) -> (K, Bp, L); with shift=1 slot ``i`` holds row ``i-1``."""
    K, B, N = x.shape
    return jnp.pad(x, ((0, 0), (0, Bp - B), (shift, L - N - shift)))


def _pad_vec(v, Bp, dtype):
    B = v.shape[0]
    return jnp.pad(v.astype(dtype), (0, Bp - B)).reshape(Bp, 1)


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _len_spec(btile):
    return pl.BlockSpec((btile, 1), lambda b, k: (_i32(b), _i32(0)),
                        memory_space=pltpu.VMEM)


def _vt_spec(btile):
    return pl.BlockSpec((btile, 1), lambda b, k: (_i32(b), _i32(0)),
                        memory_space=pltpu.VMEM)


def _diag_spec(btile, L, rowfn):
    return pl.BlockSpec(
        (1, btile, L), lambda b, k: (_i32(rowfn(k)), _i32(b), _i32(0)),
        memory_space=pltpu.VMEM)


def _block_spec(T, btile, L, rowfn):
    """T-row diagonal block: row-block index along the (padded) diag axis."""
    return pl.BlockSpec(
        (T, btile, L), lambda b, k: (_i32(rowfn(k)), _i32(b), _i32(0)),
        memory_space=pltpu.VMEM)


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))


def _btile_for(B):
    # Bigger batch tiles amortise per-grid-step overhead; 128 keeps the
    # worst kernel (adjoint backward: 7 streams x double-buffer + 4
    # scratch) within ~7 MB of VMEM at L = 640.
    for t in (128, 64, 32, 16, 8):
        if B >= t:
            return t
    return 8


def skew_input(x):
    """Relayout a natural ``(B, N, M)`` potential into the padded
    diagonal-major stream ``(K2, Bp, L)`` this backend's passes consume
    (shear kernel; replaces the XLA skew + pad).  ``K2`` is ``N + M - 1``
    rounded up to :data:`DIAG_UNROLL`; the pad rows are zero."""
    B, N, M = x.shape
    Bp = _round_up(B, _btile_for(B))
    L = _round_up(N + 1, LANE)
    K2 = _round_up(N + M - 1, DIAG_UNROLL)
    return skew_pallas(x, Bp, L, rows=K2)


def unskew_output(s, N, M, B, mul=None):
    """Inverse relayout of a diagonal stream back to ``(B, N, M)``."""
    return unskew_pallas(s, N, M, B, mul=mul)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(ln_ref, lm_ref, th_ref, ad_ref,
                vt_ref, qx_ref, qm_ref, qy_ref,
                v1, v2, *, lo, operator, T):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        v1[:] = jnp.zeros_like(v1)
        v2[:] = jnp.zeros_like(v2)
        vt_ref[:] = jnp.zeros_like(vt_ref)

    Bt, L = v1.shape
    iarr = jax.lax.broadcasted_iota(jnp.int32, (Bt, L), 1)
    ln = ln_ref[:]
    lm = lm_ref[:]
    v1v = v1[:]
    v2v = v2[:]
    qdt = qx_ref.dtype
    acc = jnp.zeros((Bt, 1), vt_ref.dtype)
    for t in range(T):
        d = k * T + t + 2
        ash = ad_ref[t]
        xarg = ash + _shr(v1v)
        marg = _shr(v2v)
        yarg = ash + v1v
        val, (qx, qm, qy) = smooth.max3(operator, xarg, marg, yarg)
        vnew = th_ref[t] + val
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vnew.dtype)
        vnew = jnp.where(valid, vnew, zero)
        if MASK_Q:
            qx = jnp.where(valid, qx, zero)
            qm = jnp.where(valid, qm, zero)
            qy = jnp.where(valid, qy, zero)
        qx_ref[t] = qx.astype(qdt)
        qm_ref[t] = qm.astype(qdt)
        qy_ref[t] = qy.astype(qdt)
        acc += jnp.sum(jnp.where(term, vnew, zero), axis=1, keepdims=True)
        v2v = v1v
        v1v = vnew
    vt_ref[:] += acc
    v2[:] = v2v
    v1[:] = v1v


def forward_pallas(th, ad, ln, lm, *, mode="nw", operator="softmax", nm=None):
    """``th``/``ad`` are padded diagonal streams from :func:`skew_input`."""
    K2, Bp, L = th.shape
    dtype = th.dtype
    T = DIAG_UNROLL if K2 % DIAG_UNROLL == 0 else 1
    btile = min(_btile_for(Bp), 64) if T > 1 else _btile_for(Bp)
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][0]

    qdt = Q_DTYPE or dtype
    kern = functools.partial(_fwd_kernel, lo=lo, operator=operator, T=T)
    vt, qx, qm, qy = pl.pallas_call(
        kern,
        grid=(Bp // btile, K2 // T),
        in_specs=[
            _len_spec(btile), _len_spec(btile),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
        ],
        out_specs=[
            _vt_spec(btile),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), dtype),
            jax.ShapeDtypeStruct((K2, Bp, L), qdt),
            jax.ShapeDtypeStruct((K2, Bp, L), qdt),
            jax.ShapeDtypeStruct((K2, Bp, L), qdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((btile, L), dtype),
            pltpu.VMEM((btile, L), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, th, ad)
    return vt[:B, 0], (qx, qm, qy)


# ---------------------------------------------------------------------------
# backward (expected alignment)
# ---------------------------------------------------------------------------

def _bwd_kernel(ln_ref, lm_ref, et_ref, qx_ref, qm_ref, qy_ref,
                e_ref, e1, e2, sqx0, sqm0, sqm1, sqy0, *, lo, T, KB):
    """Processes T diagonals (descending) per step.  Rows ``r+1``/``r+2``
    that fall in the previously-processed (higher) block are carried in the
    ``s*`` scratches (q rows 0 and 1 of that block); the initial zeros
    reproduce the old clamped-read-times-zero-carry behaviour at the top."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        e1[:] = jnp.zeros_like(e1)
        e2[:] = jnp.zeros_like(e2)
        sqx0[:] = jnp.zeros_like(sqx0)
        sqm0[:] = jnp.zeros_like(sqm0)
        sqm1[:] = jnp.zeros_like(sqm1)
        sqy0[:] = jnp.zeros_like(sqy0)

    Bt, L = e1.shape
    iarr = jax.lax.broadcasted_iota(jnp.int32, (Bt, L), 1)
    ln = ln_ref[:]
    lm = lm_ref[:]
    et = et_ref[:]
    e1v = e1[:]
    e2v = e2[:]
    dt = e1v.dtype
    rqm0 = sqm0[:]
    pqx0 = sqx0[:].astype(dt)
    pqm0 = rqm0.astype(dt)
    pqm1 = sqm1[:].astype(dt)
    pqy0 = sqy0[:].astype(dt)
    r0 = (KB - 1 - kk) * T
    for lt in reversed(range(T)):
        d = r0 + lt + 2
        qx1 = pqx0 if lt == T - 1 else qx_ref[lt + 1].astype(dt)
        qy1 = pqy0 if lt == T - 1 else qy_ref[lt + 1].astype(dt)
        if lt == T - 1:
            qm2 = pqm1
        elif lt == T - 2:
            qm2 = pqm0
        else:
            qm2 = qm_ref[lt + 2].astype(dt)
        enew = _shl(qx1 * e1v) + _shl(qm2 * e2v) + qy1 * e1v
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), enew.dtype)
        enew = jnp.where(valid, enew, zero)
        enew = enew + jnp.where(term, et, zero)
        e_ref[lt] = enew
        e2v = e1v
        e1v = enew
    e1[:] = e1v
    e2[:] = e2v
    sqx0[:] = qx_ref[0]
    # with T == 1 the r+2 row lives two blocks back: shift the chain
    sqm1[:] = qm_ref[1] if T > 1 else rqm0
    sqm0[:] = qm_ref[0]
    sqy0[:] = qy_ref[0]


def backward_pallas(Et, qs, ln, lm, *, mode="nw", nm=None):
    qx, qm, qy = qs
    K2, Bp, L = qx.shape
    dtype = Et.dtype
    T = DIAG_UNROLL if K2 % DIAG_UNROLL == 0 else 1
    btile = min(_btile_for(Bp), 64) if T > 1 else _btile_for(Bp)
    qdt = qx.dtype
    B = Et.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    etp = _pad_vec(Et, Bp, dtype)
    lo = MODE_BOUNDS[mode][1]
    KB = K2 // T

    kern = functools.partial(_bwd_kernel, lo=lo, T=T, KB=KB)
    (Ediag,) = pl.pallas_call(
        kern,
        grid=(Bp // btile, KB),
        in_specs=[
            _len_spec(btile), _len_spec(btile), _len_spec(btile),
            _block_spec(T, btile, L, lambda k: KB - 1 - k),
            _block_spec(T, btile, L, lambda k: KB - 1 - k),
            _block_spec(T, btile, L, lambda k: KB - 1 - k),
        ],
        out_specs=[
            _block_spec(T, btile, L, lambda k: KB - 1 - k),
        ],
        out_shape=[jax.ShapeDtypeStruct((K2, Bp, L), dtype)],
        scratch_shapes=[
            pltpu.VMEM((btile, L), dtype),
            pltpu.VMEM((btile, L), dtype),
            pltpu.VMEM((btile, L), qdt),
            pltpu.VMEM((btile, L), qdt),
            pltpu.VMEM((btile, L), qdt),
            pltpu.VMEM((btile, L), qdt),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, etp, qx, qm, qy)
    return Ediag


# ---------------------------------------------------------------------------
# adjoint forward (JVP of forward; Hessian-product for Qd)
# ---------------------------------------------------------------------------

def _adj_fwd_kernel(ln_ref, lm_ref, zt_ref, za_ref, qx_ref, qm_ref, qy_ref,
                    vtd_ref, qdx_ref, qdm_ref, qdy_ref,
                    vd1, vd2, *, lo, operator, T):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        vd1[:] = jnp.zeros_like(vd1)
        vd2[:] = jnp.zeros_like(vd2)
        vtd_ref[:] = jnp.zeros_like(vtd_ref)

    Bt, L = vd1.shape
    iarr = jax.lax.broadcasted_iota(jnp.int32, (Bt, L), 1)
    ln = ln_ref[:]
    lm = lm_ref[:]
    vd1v = vd1[:]
    vd2v = vd2[:]
    acc = jnp.zeros((Bt, 1), vtd_ref.dtype)
    for t in range(T):
        d = k * T + t + 2
        zash = za_ref[t]
        dt = zash.dtype
        qx = qx_ref[t].astype(dt)
        qm = qm_ref[t].astype(dt)
        qy = qy_ref[t].astype(dt)
        xargd = zash + _shr(vd1v)
        margd = _shr(vd2v)
        yargd = zash + vd1v
        vdnew = zt_ref[t] + qx * xargd + qm * margd + qy * yargd
        qdx, qdm, qdy = smooth.hessian3(
            operator, (qx, qm, qy), (xargd, margd, yargd))
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vdnew.dtype)
        vdnew = jnp.where(valid, vdnew, zero)
        if MASK_Q:
            qdx = jnp.where(valid, qdx, zero)
            qdm = jnp.where(valid, qdm, zero)
            qdy = jnp.where(valid, qdy, zero)
        qdx_ref[t] = qdx
        qdm_ref[t] = qdm
        qdy_ref[t] = qdy
        acc += jnp.sum(jnp.where(term, vdnew, zero), axis=1, keepdims=True)
        vd2v = vd1v
        vd1v = vdnew
    vtd_ref[:] += acc
    vd2[:] = vd2v
    vd1[:] = vd1v


def adjoint_forward_pallas(qs, zt, za, ln, lm, *, mode="nw",
                           operator="softmax", nm=None):
    """``zt``/``za`` are padded diagonal streams from :func:`skew_input`."""
    qx, qm, qy = qs
    K2, Bp, L = qx.shape
    dtype = zt.dtype
    T = DIAG_UNROLL if K2 % DIAG_UNROLL == 0 else 1
    btile = min(_btile_for(Bp), 32) if T > 1 else _btile_for(Bp)
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][2]

    kern = functools.partial(_adj_fwd_kernel, lo=lo, operator=operator, T=T)
    vtd, qdx, qdm, qdy = pl.pallas_call(
        kern,
        grid=(Bp // btile, K2 // T),
        in_specs=[
            _len_spec(btile), _len_spec(btile),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
        ],
        out_specs=[
            _vt_spec(btile),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
            _block_spec(T, btile, L, lambda k: k),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), dtype),
            jax.ShapeDtypeStruct((K2, Bp, L), dtype),
            jax.ShapeDtypeStruct((K2, Bp, L), dtype),
            jax.ShapeDtypeStruct((K2, Bp, L), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((btile, L), dtype),
            pltpu.VMEM((btile, L), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, zt, za, qx, qm, qy)
    return vtd[:B, 0], (qdx, qdm, qdy)


# ---------------------------------------------------------------------------
# adjoint backward
# ---------------------------------------------------------------------------

def _adj_bwd_kernel(ln_ref, lm_ref,
                    qx_ref, qm_ref, qy_ref,
                    qdx_ref, qdm_ref, qdy_ref, e_ref,
                    ed_ref, ed1, ed2, e1, e2,
                    sqx0, sqm0, sqm1, sqy0, sdx0, sdm0, sdm1, sdy0,
                    *, lo, T, KB):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        for ref in (ed1, ed2, e1, e2,
                    sqx0, sqm0, sqm1, sqy0, sdx0, sdm0, sdm1, sdy0):
            ref[:] = jnp.zeros_like(ref)

    Bt, L = ed1.shape
    iarr = jax.lax.broadcasted_iota(jnp.int32, (Bt, L), 1)
    ln = ln_ref[:]
    lm = lm_ref[:]
    ed1v = ed1[:]
    ed2v = ed2[:]
    e1v = e1[:]
    e2v = e2[:]
    dt = e1v.dtype
    rqm0 = sqm0[:]
    rdm0 = sdm0[:]
    pqx0 = sqx0[:].astype(dt)
    pqm0 = rqm0.astype(dt)
    pqm1 = sqm1[:].astype(dt)
    pqy0 = sqy0[:].astype(dt)
    pdx0 = sdx0[:].astype(dt)
    pdm0 = rdm0.astype(dt)
    pdm1 = sdm1[:].astype(dt)
    pdy0 = sdy0[:].astype(dt)
    r0 = (KB - 1 - kk) * T
    # every product pairs a (possibly off-end) stream read with a carried
    # value that is exactly zero off the end, so no garbage can leak in
    for lt in reversed(range(T)):
        d = r0 + lt + 2
        last = lt == T - 1
        qx1 = pqx0 if last else qx_ref[lt + 1].astype(dt)
        qy1 = pqy0 if last else qy_ref[lt + 1].astype(dt)
        qdx1 = pdx0 if last else qdx_ref[lt + 1].astype(dt)
        qdy1 = pdy0 if last else qdy_ref[lt + 1].astype(dt)
        if last:
            qm2, qdm2 = pqm1, pdm1
        elif lt == T - 2:
            qm2, qdm2 = pqm0, pdm0
        else:
            qm2 = qm_ref[lt + 2].astype(dt)
            qdm2 = qdm_ref[lt + 2].astype(dt)
        ednew = (_shl(qdx1 * e1v + qx1 * ed1v)
                 + _shl(qdm2 * e2v + qm2 * ed2v)
                 + qdy1 * e1v + qy1 * ed1v)
        valid, _ = _masks(iarr, d, ln, lm, lo)
        ednew = jnp.where(valid, ednew, jnp.zeros((), ednew.dtype))
        ed_ref[lt] = ednew
        ed2v = ed1v
        ed1v = ednew
        e2v = e1v
        e1v = e_ref[lt]
    ed1[:] = ed1v
    ed2[:] = ed2v
    e1[:] = e1v
    e2[:] = e2v
    sqx0[:] = qx_ref[0]
    sqm1[:] = qm_ref[1] if T > 1 else rqm0
    sqm0[:] = qm_ref[0]
    sqy0[:] = qy_ref[0]
    sdx0[:] = qdx_ref[0]
    sdm1[:] = qdm_ref[1] if T > 1 else rdm0
    sdm0[:] = qdm_ref[0]
    sdy0[:] = qdy_ref[0]


def adjoint_backward_pallas(Ediag, qs, qds, ln, lm, *, mode="nw", nm=None):
    qx, qm, qy = qs
    qdx, qdm, qdy = qds
    K2, Bp, L = qx.shape
    dtype = Ediag.dtype
    T = DIAG_UNROLL if K2 % DIAG_UNROLL == 0 and Ediag.shape[0] == K2 else 1
    btile = min(_btile_for(Bp), 32) if T > 1 else _btile_for(Bp)
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][3]
    qdt = qx.dtype

    if T == 1 and Ediag.shape[0] != K2:
        # legacy single-row path over true-K buffers (direct callers)
        K = Ediag.shape[0]
    else:
        K = K2
    KB = K // T

    kern = functools.partial(_adj_bwd_kernel, lo=lo, T=T, KB=KB)
    blk = functools.partial(_block_spec, T, btile, L)
    (Eddiag,) = pl.pallas_call(
        kern,
        grid=(Bp // btile, KB),
        in_specs=[
            _len_spec(btile), _len_spec(btile),
            blk(lambda k: KB - 1 - k),
            blk(lambda k: KB - 1 - k),
            blk(lambda k: KB - 1 - k),
            blk(lambda k: KB - 1 - k),
            blk(lambda k: KB - 1 - k),
            blk(lambda k: KB - 1 - k),
            blk(lambda k: KB - 1 - k),   # E @ current rows
        ],
        out_specs=[
            blk(lambda k: KB - 1 - k),
        ],
        out_shape=[jax.ShapeDtypeStruct((K, Bp, L), dtype)],
        scratch_shapes=[pltpu.VMEM((btile, L), dtype)] * 4
        + [pltpu.VMEM((btile, L), qdt)] * 4
        + [pltpu.VMEM((btile, L), dtype)] * 4,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, qx, qm, qy, qdx, qdm, qdy, Ediag)
    return Eddiag


def _backward_v2(Et, aux, ln, lm, *, mode="nw", operator="softmax",
                 want_gap=False, nm=None):
    from deepblast_tpu.ops.dp import _gap_mul
    E = backward_pallas(Et, aux, ln, lm, mode=mode, nm=nm)
    EA = _gap_mul(E, aux[0], aux[2]) if want_gap else None
    return E, EA


def _adjoint_backward_v2(E_s, aux, adj_aux, ln, lm, *, mode="nw",
                         operator="softmax", nm=None):
    from deepblast_tpu.ops.dp import _gap_mul
    Ed = adjoint_backward_pallas(E_s, aux, adj_aux, ln, lm, mode=mode, nm=nm)
    EdA = _gap_mul(Ed, aux[0], aux[2]) + _gap_mul(E_s, adj_aux[0],
                                                  adj_aux[2])
    return Ed, EdA


# ---------------------------------------------------------------------------
# "pallas_long": the same DP kernels behind XLA pad+reshape relayouts.
# The shear relayout kernels buffer a full (K2, L) window per pair in VMEM,
# which cannot scale past ~len-2800 (at len 4096 the window is 138 MB
# against the v5e's 128 MiB VMEM); the XLA layout ops scale to any length
# at a modest cost, which the huge DP dominates anyway in this regime.
# The XLA skew is exactly a slot shift away from the kernel stream layout:
# skew(x)[d, b, i] = x[b, i, d-i]  ->  stream[d, b, s] = x[b, s-1, d+1-s].
# ---------------------------------------------------------------------------

def skew_input_long(x):
    import jax.numpy as _jnp

    from deepblast_tpu.ops.skew import skew as _xla_skew
    B, N, M = x.shape
    Bp = _round_up(B, _btile_for(B))
    L = _round_up(N + 1, LANE)
    K2 = _round_up(N + M - 1, DIAG_UNROLL)
    z = _xla_skew(x)
    return _jnp.pad(z, ((0, K2 - z.shape[0]), (0, Bp - B),
                        (1, L - N - 1)))


def unskew_output_long(s, N, M, B, mul=None):
    from deepblast_tpu.ops.skew import unskew as _xla_unskew
    K, Bp, L = s.shape
    if mul:
        q = mul[0][:K].astype(s.dtype)
        for m in mul[1:]:
            q = q + m[:K].astype(s.dtype)
        s = s * q
    return _xla_unskew(s, N, M, offset=1)[:B]


def register_long():
    """Register the long-sequence variant (never the default)."""
    from deepblast_tpu.ops import dp
    dp.register_backend("pallas_long", {
        "skew": skew_input_long,
        "unskew": unskew_output_long,
        "forward": forward_pallas,
        "backward": _backward_v2,
        "adjoint_forward": adjoint_forward_pallas,
        "adjoint_backward": _adjoint_backward_v2,
    })


def register(make_default=None):
    """Register the pallas backend with the DP dispatcher.

    By default it becomes the default backend on TPU hosts.
    """
    from deepblast_tpu.ops import dp
    if make_default is None:
        # must not raise when the configured platform cannot initialize
        # (tunnel down) — the package still imports for host-only work
        try:
            make_default = jax.default_backend() == "tpu"
        except RuntimeError:
            make_default = False
    dp.register_backend("pallas", {
        "skew": skew_input,
        "unskew": unskew_output,
        "forward": forward_pallas,
        "backward": _backward_v2,
        "adjoint_forward": adjoint_forward_pallas,
        "adjoint_backward": _adjoint_backward_v2,
    }, make_default=make_default)
