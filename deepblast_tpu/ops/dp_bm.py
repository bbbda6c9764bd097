"""Batch-minor Pallas TPU wavefront kernels with flash-style recomputation.

Round-2 redesign of :mod:`deepblast_tpu.ops.dp_pallas` combining the two
ranked perf items of docs/PERF_NOTES.md:

1. **Batch-minor streams** ``(K2, S, Bp)`` — DP slot on sublanes
   (``S = Np + 8``, ~1.5% padding vs 25% lane padding in round 1), batch on
   lanes; relayouts in :mod:`deepblast_tpu.ops.skew_bm`; slot shifts are
   static one-sublane shifts.

2. **Q recomputation** (the DP analogue of flash-attention's softmax
   recomputation): the forward stores only the *value* stream ``Vs``
   instead of the three soft-argmax streams ``(Qx, Qm, Qy)``; every reverse
   pass recomputes the soft-argmax rows it needs from ``Vs`` and the gap
   stream ``A`` — 3 exps per cell of VPU work against ~2 streams of HBM
   round-trip saved per pass.  In fp32 the recomputation is bit-exact: it
   reads the same masked values the forward's in-flight carries held.

The one-row-delayed V-stream contract makes this work in *both* walk
directions with only previous-block scratch carries:

    Vs[r] = V[r-1]  (r >= 1),  Vs[0] = 0

where ``V[r]`` are the masked DP values of diagonal row ``r`` (diagonal
``d = r + 2``).  The soft-argmax of row ``r`` is then

    Q[r] = smooth.max3(A[r] + shr(Vs[r]), shr(Vs[r-1]), A[r] + Vs[r])

so a descending block ``[r0, r0+T)`` can compute all fresh rows
``Q[r0+1 .. r0+T]`` from in-block rows plus the *above* block's row 0
(carried in scratch), and an ascending block computes ``Q[r0 .. r0+T-1]``
from in-block rows plus the *below* block's last row — no unaligned or
double block reads.  The forward produces the delayed stream for free: its
value carry ``v1`` entering step ``k`` is exactly ``V[r0-1]``.

Residuals through the dispatcher (deepblast_tpu.ops.dp v2 interface):
``aux = (Vs, A_s)``, ``adj_aux = (Vds, Za_s)`` — the adjoint forward
stores the tangent value stream ``Vds`` (same delayed contract) and the
adjoint backward recomputes the soft-argmax *tangents* via the operator
Hessian-product from ``(Vds, Za)``.

Boundary semantics (masking, seeding, terminal selection) are identical to
:mod:`deepblast_tpu.ops.dp_scan`, the oracle these kernels are
parity-tested against.  Reference being replaced: the paired CUDA kernels
deepblast/nw_cuda.py:46-165 (one serial thread per pair; stores the full
Q tensor, deepblast/nw_cuda.py:171-200).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.ops import smooth
from deepblast_tpu.ops.dp_scan import MODE_BOUNDS
from deepblast_tpu.ops.skew_bm import skew_bm, unskew_bm

__all__ = [
    "forward_bm",
    "backward_bm",
    "adjoint_forward_bm",
    "adjoint_backward_bm",
    "gap_expectation_bm",
    "register",
]

LANE = 128

# Per-kernel diagonal unroll factors, bounded by VMEM (~16 MB/core): each
# stream block is T x S x 128 fp32 per batch chunk, double-buffered.
T_FWD = 8     # 3 streams
T_BWD = 4     # 3 streams + 5 scratch planes
T_AFWD = 4    # 5 streams
T_ABWD = 2    # 6 streams + 10 scratch planes
T_EA = 4      # 3-4 streams

# Storage dtype for the value streams Vs/Vds (None = input dtype).  bf16
# halves the dominant HBM traffic; compute stays fp32.  Opt-in
# (bench/inference); tests pin fp32.
V_DTYPE = None


def _interpret():
    return jax.default_backend() != "tpu"


# Sublane-shift lowering (both probed correct on-chip; perf-selectable via
# DEEPBLAST_SHIFT=roll for measurement, see scripts/profile_bm.py)
import os as _os  # noqa: E402

SHIFT_CONCAT = _os.environ.get("DEEPBLAST_SHIFT", "concat") == "concat"


def _shr(v):
    """out[s, :] = v[s-1, :]; out[0, :] = 0 (slot shift down)."""
    if SHIFT_CONCAT:
        z = jnp.zeros((1, v.shape[1]), v.dtype)
        return jnp.concatenate([z, v[:-1, :]], axis=0)
    if _interpret():
        r = jnp.roll(v, 1, 0)
    else:
        r = pltpu.roll(v, 1, 0)
    i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(i == 0, jnp.zeros((), v.dtype), r)


def _shl(v):
    """out[s, :] = v[s+1, :]; out[-1, :] = 0 (slot shift up)."""
    S = v.shape[0]
    if SHIFT_CONCAT:
        z = jnp.zeros((1, v.shape[1]), v.dtype)
        return jnp.concatenate([v[1:, :], z], axis=0)
    if _interpret():
        r = jnp.roll(v, S - 1, 0)
    else:
        r = pltpu.roll(v, S - 1, 0)
    i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(i == S - 1, jnp.zeros((), v.dtype), r)


def _masks(iarr, d, ln, lm, lo):
    j = d - iarr
    valid = (iarr >= lo) & (j >= lo) & (iarr <= ln) & (j <= lm)
    term = (iarr == ln) & (d == ln + lm)
    return valid, term


def _q_row(operator, a_q, vs_hi, vs_lo):
    """Soft-argmax of one diagonal row from the delayed value stream:
    ``vs_hi = Vs[rq] (= V[rq-1])``, ``vs_lo = Vs[rq-1] (= V[rq-2])``."""
    xarg = a_q + _shr(vs_hi)
    marg = _shr(vs_lo)
    yarg = a_q + vs_hi
    _, qs = smooth.max3(operator, xarg, marg, yarg)
    return qs


def _qd_row(operator, qs, za_q, vds_hi, vds_lo):
    """Soft-argmax tangent of one row (operator Hessian-product) from the
    delayed tangent stream."""
    xargd = za_q + _shr(vds_hi)
    margd = _shr(vds_lo)
    yargd = za_q + vds_hi
    return smooth.hessian3(operator, qs, (xargd, margd, yargd))


def _pad_vec(v, Bp, dtype):
    B = v.shape[0]
    return jnp.pad(v.astype(dtype), (0, Bp - B)).reshape(1, Bp)


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _len_spec():
    return pl.BlockSpec((1, LANE), lambda b, k: (_i32(0), b),
                        memory_space=pltpu.VMEM)


def _vt_spec():
    return pl.BlockSpec((8, LANE), lambda b, k: (_i32(0), b),
                        memory_space=pltpu.VMEM)


def _block_spec(T, S, rowfn):
    return pl.BlockSpec(
        (T, S, LANE), lambda b, k: (_i32(rowfn(k)), _i32(0), b),
        memory_space=pltpu.VMEM)


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))


def skew_input(x):
    """Relayout a natural ``(B, N, M)`` potential into the batch-minor
    diagonal stream ``(K2, S, Bp)`` (see skew_bm)."""
    return skew_bm(x)


def unskew_output(s, N, M, B):
    return unskew_bm(s, N, M, B)


# ---------------------------------------------------------------------------
# forward: (th, A) -> (vt, Vs)
# ---------------------------------------------------------------------------

def _fwd_kernel(ln_ref, lm_ref, th_ref, ad_ref,
                vt_ref, vs_ref, v1, v2, *, lo, operator, T):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        v1[...] = jnp.zeros_like(v1)
        v2[...] = jnp.zeros_like(v2)
        vt_ref[...] = jnp.zeros_like(vt_ref)

    S = v1.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    v1v = v1[...]
    v2v = v2[...]
    vdt = vs_ref.dtype
    acc = jnp.zeros((1, LANE), vt_ref.dtype)
    for t in range(T):
        d = k * T + t + 2
        # delayed V-stream write: Vs[r] = V[r-1] = the incoming carry
        vs_ref[t] = v1v.astype(vdt)
        ash = ad_ref[t]
        xarg = ash + _shr(v1v)
        marg = _shr(v2v)
        yarg = ash + v1v
        val, _ = smooth.max3(operator, xarg, marg, yarg)
        vnew = th_ref[t] + val
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vnew.dtype)
        vnew = jnp.where(valid, vnew, zero)
        acc += jnp.sum(jnp.where(term, vnew, zero), axis=0, keepdims=True)
        v2v = v1v
        v1v = vnew
    vt_ref[...] += acc
    v2[...] = v2v
    v1[...] = v1v


def forward_bm(th, ad, ln, lm, *, mode="nw", operator="softmax", nm=None):
    """``th``/``ad`` are batch-minor streams from :func:`skew_input`.
    Returns ``(vt, aux)`` with ``aux = (Vs, ad)`` — the delayed value
    stream plus the gap stream the reverse passes recompute Q from."""
    K2, S, Bp = th.shape
    dtype = th.dtype
    T = T_FWD if K2 % T_FWD == 0 else 1
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][0]

    vdt = V_DTYPE or dtype
    kern = functools.partial(_fwd_kernel, lo=lo, operator=operator, T=T)
    blk = functools.partial(_block_spec, T, S)
    vt, vs = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[
            _len_spec(), _len_spec(),
            blk(lambda k: k), blk(lambda k: k),
        ],
        out_specs=[_vt_spec(), blk(lambda k: k)],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((K2, S, Bp), vdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, LANE), dtype),
            pltpu.VMEM((S, LANE), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, th, ad)
    return vt[0, :B], (vs, ad)


# ---------------------------------------------------------------------------
# backward (expected alignment), recomputing Q from (Vs, A)
# ---------------------------------------------------------------------------

def _bwd_kernel(ln_ref, lm_ref, et_ref, vs_ref, ad_ref,
                e_ref, e1, e2, cvs0, ca0, cqm, *, lo, operator, T, KB):
    """T diagonals (descending) per step.  Fresh soft-argmax rows
    ``Q[r0+1 .. r0+T]`` are recomputed from the delayed value stream; the
    above block's row-0 planes of Vs/A and its lowest fresh ``qm`` are
    carried in scratch."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        for ref in (e1, e2, cvs0, ca0, cqm):
            ref[...] = jnp.zeros_like(ref)

    S = e1.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    et = et_ref[...]
    e1v = e1[...]
    e2v = e2[...]
    dt = e1v.dtype
    pvs0 = cvs0[...].astype(dt)
    pa0 = ca0[...]
    qm2 = cqm[...]
    r0 = (KB - 1 - kk) * T
    for lt in reversed(range(T)):
        d = r0 + lt + 2
        last = lt == T - 1
        vs_hi = pvs0 if last else vs_ref[lt + 1].astype(dt)
        vs_lo = vs_ref[lt].astype(dt)
        a_q = pa0 if last else ad_ref[lt + 1]
        qx, qm, qy = _q_row(operator, a_q, vs_hi, vs_lo)
        enew = _shl(qx * e1v) + _shl(qm2 * e2v) + qy * e1v
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), enew.dtype)
        enew = jnp.where(valid, enew, zero)
        enew = enew + jnp.where(term, et, zero)
        e_ref[lt] = enew
        e2v = e1v
        e1v = enew
        qm2 = qm
    e1[...] = e1v
    e2[...] = e2v
    cvs0[...] = vs_ref[0]
    ca0[...] = ad_ref[0]
    cqm[...] = qm2


def backward_bm(Et, aux, ln, lm, *, mode="nw", operator="softmax",
                want_gap=False, nm=None):
    vs, ad = aux
    K2, S, Bp = vs.shape
    dtype = ad.dtype
    T = T_BWD if K2 % T_BWD == 0 else 1
    B = Et.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    etp = _pad_vec(Et, Bp, dtype)
    lo = MODE_BOUNDS[mode][1]
    KB = K2 // T

    kern = functools.partial(_bwd_kernel, lo=lo, operator=operator,
                             T=T, KB=KB)
    blk = functools.partial(_block_spec, T, S)
    rev = lambda k: KB - 1 - k  # noqa: E731
    (Ediag,) = pl.pallas_call(
        kern,
        grid=(Bp // LANE, KB),
        in_specs=[
            _len_spec(), _len_spec(), _len_spec(),
            blk(rev), blk(rev),
        ],
        out_specs=[blk(rev)],
        out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), dtype)],
        scratch_shapes=[pltpu.VMEM((S, LANE), dtype)] * 2
        + [pltpu.VMEM((S, LANE), vs.dtype)]
        + [pltpu.VMEM((S, LANE), dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, etp, vs, ad)
    EA = (gap_expectation_bm(Ediag, aux, operator=operator)
          if want_gap else None)
    return Ediag, EA


# ---------------------------------------------------------------------------
# adjoint forward (JVP of forward): (aux, Zt, Za) -> (vtd, Vds)
# ---------------------------------------------------------------------------

def _adj_fwd_kernel(ln_ref, lm_ref, zt_ref, za_ref, vs_ref, ad_ref,
                    vtd_ref, vds_ref, vd1, vd2, cvsl,
                    *, lo, operator, T):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        vd1[...] = jnp.zeros_like(vd1)
        vd2[...] = jnp.zeros_like(vd2)
        cvsl[...] = jnp.zeros_like(cvsl)
        vtd_ref[...] = jnp.zeros_like(vtd_ref)

    S = vd1.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    vd1v = vd1[...]
    vd2v = vd2[...]
    dt = vd1v.dtype
    vs_below = cvsl[...].astype(dt)                  # Vs[r0-1]
    vdt = vds_ref.dtype
    acc = jnp.zeros((1, LANE), vtd_ref.dtype)
    for t in range(T):
        d = k * T + t + 2
        vds_ref[t] = vd1v.astype(vdt)
        vs_hi = vs_ref[t].astype(dt)                 # Vs[r] = V[r-1]
        vs_lo = vs_below if t == 0 else vs_ref[t - 1].astype(dt)
        qx, qm, qy = _q_row(operator, ad_ref[t], vs_hi, vs_lo)
        zash = za_ref[t]
        xargd = zash + _shr(vd1v)
        margd = _shr(vd2v)
        yargd = zash + vd1v
        vdnew = zt_ref[t] + qx * xargd + qm * margd + qy * yargd
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vdnew.dtype)
        vdnew = jnp.where(valid, vdnew, zero)
        acc += jnp.sum(jnp.where(term, vdnew, zero), axis=0, keepdims=True)
        vd2v = vd1v
        vd1v = vdnew
    vtd_ref[...] += acc
    vd2[...] = vd2v
    vd1[...] = vd1v
    cvsl[...] = vs_ref[T - 1]


def adjoint_forward_bm(aux, zt, za, ln, lm, *, mode="nw",
                       operator="softmax", nm=None):
    vs, ad = aux
    K2, S, Bp = zt.shape
    dtype = zt.dtype
    T = T_AFWD if K2 % T_AFWD == 0 else 1
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][2]

    vdt = V_DTYPE or dtype
    kern = functools.partial(_adj_fwd_kernel, lo=lo, operator=operator, T=T)
    blk = functools.partial(_block_spec, T, S)
    vtd, vds = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[
            _len_spec(), _len_spec(),
            blk(lambda k: k), blk(lambda k: k),
            blk(lambda k: k), blk(lambda k: k),
        ],
        out_specs=[_vt_spec(), blk(lambda k: k)],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((K2, S, Bp), vdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, LANE), dtype),
            pltpu.VMEM((S, LANE), dtype),
            pltpu.VMEM((S, LANE), vs.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, zt, za, vs, ad)
    return vtd[0, :B], (vds, za)


# ---------------------------------------------------------------------------
# adjoint backward, recomputing Q and Qd from (Vs, A) / (Vds, Za)
# ---------------------------------------------------------------------------

def _adj_bwd_kernel(ln_ref, lm_ref,
                    vs_ref, ad_ref, vds_ref, za_ref, e_ref,
                    ed_ref, ed1, ed2, e1, e2,
                    cvs0, ca0, cqm, cvds0, cza0, cqdm,
                    *, lo, operator, T, KB):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        for ref in (ed1, ed2, e1, e2, cvs0, ca0, cqm, cvds0, cza0, cqdm):
            ref[...] = jnp.zeros_like(ref)

    S = ed1.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    ed1v = ed1[...]
    ed2v = ed2[...]
    e1v = e1[...]
    e2v = e2[...]
    dt = e1v.dtype
    pvs0 = cvs0[...].astype(dt)
    pa0 = ca0[...]
    pvds0 = cvds0[...].astype(dt)
    pza0 = cza0[...]
    qm2 = cqm[...]
    qdm2 = cqdm[...]
    r0 = (KB - 1 - kk) * T
    for lt in reversed(range(T)):
        d = r0 + lt + 2
        last = lt == T - 1
        vs_hi = pvs0 if last else vs_ref[lt + 1].astype(dt)
        vs_lo = vs_ref[lt].astype(dt)
        a_q = pa0 if last else ad_ref[lt + 1]
        qs = _q_row(operator, a_q, vs_hi, vs_lo)
        qx, qm, qy = qs
        vds_hi = pvds0 if last else vds_ref[lt + 1].astype(dt)
        vds_lo = vds_ref[lt].astype(dt)
        za_q = pza0 if last else za_ref[lt + 1]
        qdx, qdm, qdy = _qd_row(operator, qs, za_q, vds_hi, vds_lo)
        ednew = (_shl(qdx * e1v + qx * ed1v)
                 + _shl(qdm2 * e2v + qm2 * ed2v)
                 + qdy * e1v + qy * ed1v)
        valid, _ = _masks(iarr, d, ln, lm, lo)
        ednew = jnp.where(valid, ednew, jnp.zeros((), ednew.dtype))
        ed_ref[lt] = ednew
        ed2v = ed1v
        ed1v = ednew
        e2v = e1v
        e1v = e_ref[lt]
        qm2 = qm
        qdm2 = qdm
    ed1[...] = ed1v
    ed2[...] = ed2v
    e1[...] = e1v
    e2[...] = e2v
    cvs0[...] = vs_ref[0]
    ca0[...] = ad_ref[0]
    cqm[...] = qm2
    cvds0[...] = vds_ref[0]
    cza0[...] = za_ref[0]
    cqdm[...] = qdm2


def adjoint_backward_bm(Ediag, aux, adj_aux, ln, lm, *, mode="nw",
                        operator="softmax", nm=None):
    vs, ad = aux
    vds, za = adj_aux
    K2, S, Bp = ad.shape
    dtype = Ediag.dtype
    T = T_ABWD if K2 % T_ABWD == 0 else 1
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][3]
    KB = K2 // T

    kern = functools.partial(_adj_bwd_kernel, lo=lo, operator=operator,
                             T=T, KB=KB)
    blk = functools.partial(_block_spec, T, S)
    rev = lambda k: KB - 1 - k  # noqa: E731
    (Eddiag,) = pl.pallas_call(
        kern,
        grid=(Bp // LANE, KB),
        in_specs=[_len_spec(), _len_spec(),
                  blk(rev), blk(rev), blk(rev), blk(rev), blk(rev)],
        out_specs=[blk(rev)],
        out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), dtype)],
        scratch_shapes=[pltpu.VMEM((S, LANE), dtype)] * 4
        + [pltpu.VMEM((S, LANE), vs.dtype)]
        + [pltpu.VMEM((S, LANE), dtype)] * 2
        + [pltpu.VMEM((S, LANE), vds.dtype)]
        + [pltpu.VMEM((S, LANE), dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, vs, ad, vds, za, Ediag)
    EdA = _gap_adjoint_bm(Ediag, Eddiag, aux, adj_aux, operator=operator)
    return Eddiag, EdA


# ---------------------------------------------------------------------------
# gap expectations: EA = E*(Qx+Qy); EdA = Ed*(Qx+Qy) + E*(Qdx+Qdy)
# (ascending streaming kernels; Q/Qd recomputed row-by-row)
# ---------------------------------------------------------------------------

def _ea_kernel(e_ref, vs_ref, ad_ref, ea_ref, cvsl, *, operator, T):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        cvsl[...] = jnp.zeros_like(cvsl)

    dt = e_ref.dtype
    vs_below = cvsl[...].astype(dt)
    for t in range(T):
        vs_hi = vs_ref[t].astype(dt)
        vs_lo = vs_below if t == 0 else vs_ref[t - 1].astype(dt)
        qx, _, qy = _q_row(operator, ad_ref[t], vs_hi, vs_lo)
        ea_ref[t] = e_ref[t] * (qx + qy)
    cvsl[...] = vs_ref[T - 1]


def gap_expectation_bm(Ediag, aux, *, operator="softmax"):
    """``EA = E * (Qx + Qy)`` as a stream (the dVt/dA expectation)."""
    vs, ad = aux
    K2, S, Bp = ad.shape
    dtype = Ediag.dtype
    T = T_EA if K2 % T_EA == 0 else 1
    kern = functools.partial(_ea_kernel, operator=operator, T=T)
    blk = functools.partial(_block_spec, T, S)
    (EA,) = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[blk(lambda k: k)] * 3,
        out_specs=[blk(lambda k: k)],
        out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), dtype)],
        scratch_shapes=[pltpu.VMEM((S, LANE), vs.dtype)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(Ediag, vs, ad)
    return EA


def _eda_kernel(e_ref, ed_ref, vs_ref, ad_ref, vds_ref, za_ref,
                eda_ref, cvsl, cvdsl, *, operator, T):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        cvsl[...] = jnp.zeros_like(cvsl)
        cvdsl[...] = jnp.zeros_like(cvdsl)

    dt = e_ref.dtype
    vs_below = cvsl[...].astype(dt)
    vds_below = cvdsl[...].astype(dt)
    for t in range(T):
        vs_hi = vs_ref[t].astype(dt)
        vs_lo = vs_below if t == 0 else vs_ref[t - 1].astype(dt)
        qs = _q_row(operator, ad_ref[t], vs_hi, vs_lo)
        vds_hi = vds_ref[t].astype(dt)
        vds_lo = vds_below if t == 0 else vds_ref[t - 1].astype(dt)
        qdx, _, qdy = _qd_row(operator, qs, za_ref[t], vds_hi, vds_lo)
        eda_ref[t] = (ed_ref[t] * (qs[0] + qs[2])
                      + e_ref[t] * (qdx + qdy))
    cvsl[...] = vs_ref[T - 1]
    cvdsl[...] = vds_ref[T - 1]


def _gap_adjoint_bm(Ediag, Eddiag, aux, adj_aux, *, operator="softmax"):
    vs, ad = aux
    vds, za = adj_aux
    K2, S, Bp = ad.shape
    dtype = Ediag.dtype
    T = T_ABWD if K2 % T_ABWD == 0 else 1
    kern = functools.partial(_eda_kernel, operator=operator, T=T)
    blk = functools.partial(_block_spec, T, S)
    (EdA,) = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[blk(lambda k: k)] * 6,
        out_specs=[blk(lambda k: k)],
        out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), dtype)],
        scratch_shapes=[pltpu.VMEM((S, LANE), vs.dtype),
                        pltpu.VMEM((S, LANE), vds.dtype)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(Ediag, Eddiag, vs, ad, vds, za)
    return EdA


def register(make_default=None):
    """Register the batch-minor pallas backend with the DP dispatcher."""
    from deepblast_tpu.ops import dp
    if make_default is None:
        make_default = jax.default_backend() == "tpu"
    dp.register_backend("pallas_bm", {
        "skew": skew_input,
        "unskew": unskew_output,
        "forward": forward_bm,
        "backward": backward_bm,
        "adjoint_forward": adjoint_forward_bm,
        "adjoint_backward": adjoint_backward_bm,
    }, make_default=make_default)
