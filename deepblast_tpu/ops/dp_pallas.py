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

def _bwd_kernel(ln_ref, lm_ref, et_ref, qx1_ref, qm2_ref, qy1_ref,
                e_ref, e1, e2, *, lo, K):
    kk = pl.program_id(1)
    r = K - 1 - kk
    d = r + 2

    @pl.when(kk == 0)
    def _():
        e1[:] = jnp.zeros_like(e1)
        e2[:] = jnp.zeros_like(e2)

    Bt, L = e1.shape
    iarr = jax.lax.broadcasted_iota(jnp.int32, (Bt, L), 1)
    ln = ln_ref[:]
    lm = lm_ref[:]
    e1v = e1[:]
    e2v = e2[:]
    dt = e1v.dtype
    # clamped off-end reads are harmless: they always multiply a zero carry
    enew = (_shl(qx1_ref[0].astype(dt) * e1v)
            + _shl(qm2_ref[0].astype(dt) * e2v)
            + qy1_ref[0].astype(dt) * e1v)
    valid, term = _masks(iarr, d, ln, lm, lo)
    zero = jnp.zeros((), enew.dtype)
    enew = jnp.where(valid, enew, zero)
    enew = enew + jnp.where(term, et_ref[:], zero)
    e_ref[0] = enew
    e2[:] = e1v
    e1[:] = enew


def backward_pallas(Et, qs, ln, lm, *, mode="nw", nm=None):
    qx, qm, qy = qs
    K2, Bp, L = qx.shape
    K = (nm[0] + nm[1] - 1) if nm is not None else K2
    dtype = Et.dtype
    btile = _btile_for(Bp)
    B = Et.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    etp = _pad_vec(Et, Bp, dtype)
    lo = MODE_BOUNDS[mode][1]

    def row(off):
        return lambda k: jnp.minimum(K - 1, K - 1 - k + off)

    kern = functools.partial(_bwd_kernel, lo=lo, K=K)
    (Ediag,) = pl.pallas_call(
        kern,
        grid=(Bp // btile, K),
        in_specs=[
            _len_spec(btile), _len_spec(btile), _len_spec(btile),
            _diag_spec(btile, L, row(1)),   # qx @ d+1
            _diag_spec(btile, L, row(2)),   # qm @ d+2
            _diag_spec(btile, L, row(1)),   # qy @ d+1
        ],
        out_specs=[
            _diag_spec(btile, L, lambda k: K - 1 - k),
        ],
        out_shape=[jax.ShapeDtypeStruct((K, Bp, L), dtype)],
        scratch_shapes=[
            pltpu.VMEM((btile, L), dtype),
            pltpu.VMEM((btile, L), dtype),
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
                    qx1_ref, qm2_ref, qy1_ref,
                    qdx1_ref, qdm2_ref, qdy1_ref, e_ref,
                    ed_ref, ed1, ed2, e1, e2, *, lo, K):
    kk = pl.program_id(1)
    r = K - 1 - kk
    d = r + 2

    @pl.when(kk == 0)
    def _():
        ed1[:] = jnp.zeros_like(ed1)
        ed2[:] = jnp.zeros_like(ed2)
        e1[:] = jnp.zeros_like(e1)
        e2[:] = jnp.zeros_like(e2)

    Bt, L = ed1.shape
    iarr = jax.lax.broadcasted_iota(jnp.int32, (Bt, L), 1)
    ln = ln_ref[:]
    lm = lm_ref[:]
    ed1v = ed1[:]
    ed2v = ed2[:]
    e1v = e1[:]
    e2v = e2[:]
    # every product pairs a (possibly clamped) stream read with a carried
    # value that is exactly zero off the end, so no garbage can leak in
    dt = e1v.dtype
    ednew = (_shl(qdx1_ref[0].astype(dt) * e1v
                  + qx1_ref[0].astype(dt) * ed1v)
             + _shl(qdm2_ref[0].astype(dt) * e2v
                    + qm2_ref[0].astype(dt) * ed2v)
             + qdy1_ref[0].astype(dt) * e1v
             + qy1_ref[0].astype(dt) * ed1v)
    valid, _ = _masks(iarr, d, ln, lm, lo)
    ednew = jnp.where(valid, ednew, jnp.zeros((), ednew.dtype))
    ed_ref[0] = ednew
    ed2[:] = ed1v
    ed1[:] = ednew
    e2[:] = e1v
    e1[:] = e_ref[0]


def adjoint_backward_pallas(Ediag, qs, qds, ln, lm, *, mode="nw", nm=None):
    qx, qm, qy = qs
    qdx, qdm, qdy = qds
    K2, Bp, L = qx.shape
    K = (nm[0] + nm[1] - 1) if nm is not None else K2
    dtype = Ediag.dtype
    btile = _btile_for(Bp)
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][3]

    def row(off):
        return lambda k: jnp.minimum(K - 1, K - 1 - k + off)

    kern = functools.partial(_adj_bwd_kernel, lo=lo, K=K)
    (Eddiag,) = pl.pallas_call(
        kern,
        grid=(Bp // btile, K),
        in_specs=[
            _len_spec(btile), _len_spec(btile),
            _diag_spec(btile, L, row(1)),   # qx @ d+1
            _diag_spec(btile, L, row(2)),   # qm @ d+2
            _diag_spec(btile, L, row(1)),   # qy @ d+1
            _diag_spec(btile, L, row(1)),   # qdx @ d+1
            _diag_spec(btile, L, row(2)),   # qdm @ d+2
            _diag_spec(btile, L, row(1)),   # qdy @ d+1
            _diag_spec(btile, L, row(0)),   # E @ d (carried to d+1, d+2)
        ],
        out_specs=[
            _diag_spec(btile, L, lambda k: K - 1 - k),
        ],
        out_shape=[jax.ShapeDtypeStruct((K, Bp, L), dtype)],
        scratch_shapes=[
            pltpu.VMEM((btile, L), dtype),
            pltpu.VMEM((btile, L), dtype),
            pltpu.VMEM((btile, L), dtype),
            pltpu.VMEM((btile, L), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, qx, qm, qy, qdx, qdm, qdy, Ediag)
    return Eddiag


def register(make_default=None):
    """Register the pallas backend with the DP dispatcher.

    By default it becomes the default backend on TPU hosts.
    """
    from deepblast_tpu.ops import dp
    if make_default is None:
        make_default = jax.default_backend() == "tpu"
    dp.register_backend("pallas", {
        "skew": skew_input,
        "unskew": unskew_output,
        "forward": forward_pallas,
        "backward": backward_pallas,
        "adjoint_forward": adjoint_forward_pallas,
        "adjoint_backward": adjoint_backward_pallas,
    }, make_default=make_default)
