"""Batch-minor (lane = batch) Pallas TPU wavefront kernels for the DP.

Round-2 redesign of :mod:`deepblast_tpu.ops.dp_pallas` (see
docs/PERF_NOTES.md "Next (ranked; round 2)" #1).  Streams are
``(K2, S, Bp)`` — DP slot on sublanes, batch on lanes (layout contract in
:mod:`deepblast_tpu.ops.skew_bm`) — instead of round 1's ``(K, Bp, L)``:

* slot padding drops from 25% (``513 -> 640`` lanes) to 1.5%
  (``513 -> 520`` sublanes) at the bench config, cutting every stream's
  HBM traffic by the same fraction;
* the per-diagonal slot shifts (``i-1`` / ``i+1`` neighbours) become
  static one-sublane shifts of a ``(S, 128)`` plane;
* the relayouts drop their log2(N) masked shear passes (see skew_bm).

Grid/recursion structure is otherwise identical to dp_pallas (and the
boundary semantics to :mod:`deepblast_tpu.ops.dp_scan`, the oracle both
are parity-tested against): grid = (batch-chunks, diagonal-blocks), the
diagonal axis inner and sequential, DP carries in VMEM scratch, T
diagonals unrolled per step with in-register carries; the reverse passes
carry block-straddling rows in VMEM scratch planes.

Per-pass unroll T is bounded by VMEM (~16 MB): each stream block is
``T x S x 128`` fp32 per 128-lane batch chunk, double-buffered, so the
5-stream forward runs T=4 and the 7/8-stream adjoints T=2.

Reference being replaced: deepblast/nw_cuda.py:46-165 (one serial CUDA
thread per pair); here each grid step advances ``S x 128`` cells.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.ops import smooth
from deepblast_tpu.ops.dp_scan import MODE_BOUNDS
from deepblast_tpu.ops.skew_bm import bm_dims, skew_bm, unskew_bm

__all__ = [
    "forward_bm",
    "backward_bm",
    "adjoint_forward_bm",
    "adjoint_backward_bm",
    "register",
]

LANE = 128

# Sublane-shift strategy (set from scripts/probe_bm_patterns.py results):
# True = jnp.concatenate slices; False = pltpu.roll + iota mask.
SHIFT_CONCAT = True

# Storage dtype for the soft-argmax (Q) streams (see dp_pallas.Q_DTYPE).
Q_DTYPE = None


def _interpret():
    return jax.default_backend() != "tpu"


def _roll(x, shift, axis):
    if _interpret():
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift, axis)


def _shr(v):
    """out[s, :] = v[s-1, :]; out[0, :] = 0 (slot shift down)."""
    if SHIFT_CONCAT:
        z = jnp.zeros((1, v.shape[1]), v.dtype)
        return jnp.concatenate([z, v[:-1, :]], axis=0)
    i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(i == 0, jnp.zeros((), v.dtype), _roll(v, 1, 0))


def _shl(v):
    """out[s, :] = v[s+1, :]; out[-1, :] = 0 (slot shift up)."""
    S = v.shape[0]
    if SHIFT_CONCAT:
        z = jnp.zeros((1, v.shape[1]), v.dtype)
        return jnp.concatenate([v[1:, :], z], axis=0)
    i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(i == S - 1, jnp.zeros((), v.dtype), _roll(v, S - 1, 0))


def _masks(iarr, d, ln, lm, lo):
    j = d - iarr
    valid = (iarr >= lo) & (j >= lo) & (iarr <= ln) & (j <= lm)
    term = (iarr == ln) & (d == ln + lm)
    return valid, term


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


def unskew_output(s, N, M, B, mul=None):
    return unskew_bm(s, N, M, B, mul=mul)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(ln_ref, lm_ref, th_ref, ad_ref,
                vt_ref, qx_ref, qm_ref, qy_ref,
                v1, v2, *, lo, operator, T):
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
    qdt = qx_ref.dtype
    acc = jnp.zeros((1, LANE), vt_ref.dtype)
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
        qx_ref[t] = qx.astype(qdt)
        qm_ref[t] = qm.astype(qdt)
        qy_ref[t] = qy.astype(qdt)
        acc += jnp.sum(jnp.where(term, vnew, zero), axis=0, keepdims=True)
        v2v = v1v
        v1v = vnew
    vt_ref[...] += acc
    v2[...] = v2v
    v1[...] = v1v


def forward_bm(th, ad, ln, lm, *, mode="nw", operator="softmax", nm=None):
    """``th``/``ad`` are batch-minor diagonal streams from
    :func:`skew_input`."""
    K2, S, Bp = th.shape
    dtype = th.dtype
    T = 4 if K2 % 4 == 0 else 1
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][0]

    qdt = Q_DTYPE or dtype
    kern = functools.partial(_fwd_kernel, lo=lo, operator=operator, T=T)
    blk = functools.partial(_block_spec, T, S)
    vt, qx, qm, qy = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[
            _len_spec(), _len_spec(),
            blk(lambda k: k), blk(lambda k: k),
        ],
        out_specs=[
            _vt_spec(),
            blk(lambda k: k), blk(lambda k: k), blk(lambda k: k),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((K2, S, Bp), qdt),
            jax.ShapeDtypeStruct((K2, S, Bp), qdt),
            jax.ShapeDtypeStruct((K2, S, Bp), qdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, LANE), dtype),
            pltpu.VMEM((S, LANE), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, th, ad)
    return vt[0, :B], (qx, qm, qy)


# ---------------------------------------------------------------------------
# backward (expected alignment)
# ---------------------------------------------------------------------------

def _bwd_kernel(ln_ref, lm_ref, et_ref, qx_ref, qm_ref, qy_ref,
                e_ref, e1, e2, sqx0, sqm0, sqm1, sqy0, *, lo, T, KB):
    """T diagonals (descending) per step.  Rows ``d+1``/``d+2`` falling in
    the previously-processed (higher) block are carried in the ``s*``
    scratches (that block's rows 0 and 1)."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        for ref in (e1, e2, sqx0, sqm0, sqm1, sqy0):
            ref[...] = jnp.zeros_like(ref)

    S = e1.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    et = et_ref[...]
    e1v = e1[...]
    e2v = e2[...]
    dt = e1v.dtype
    rqm0 = sqm0[...]
    pqx0 = sqx0[...].astype(dt)
    pqm0 = rqm0.astype(dt)
    pqm1 = sqm1[...].astype(dt)
    pqy0 = sqy0[...].astype(dt)
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
    e1[...] = e1v
    e2[...] = e2v
    sqx0[...] = qx_ref[0]
    sqm1[...] = qm_ref[1] if T > 1 else rqm0
    sqm0[...] = qm_ref[0]
    sqy0[...] = qy_ref[0]


def backward_bm(Et, qs, ln, lm, *, mode="nw", nm=None):
    qx, qm, qy = qs
    K2, S, Bp = qx.shape
    dtype = Et.dtype
    T = 4 if K2 % 4 == 0 else 1
    qdt = qx.dtype
    B = Et.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    etp = _pad_vec(Et, Bp, dtype)
    lo = MODE_BOUNDS[mode][1]
    KB = K2 // T

    kern = functools.partial(_bwd_kernel, lo=lo, T=T, KB=KB)
    blk = functools.partial(_block_spec, T, S)
    (Ediag,) = pl.pallas_call(
        kern,
        grid=(Bp // LANE, KB),
        in_specs=[
            _len_spec(), _len_spec(), _len_spec(),
            blk(lambda k: KB - 1 - k),
            blk(lambda k: KB - 1 - k),
            blk(lambda k: KB - 1 - k),
        ],
        out_specs=[blk(lambda k: KB - 1 - k)],
        out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), dtype)],
        scratch_shapes=[pltpu.VMEM((S, LANE), dtype)] * 2
        + [pltpu.VMEM((S, LANE), qdt)] * 4,
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
        vd1[...] = jnp.zeros_like(vd1)
        vd2[...] = jnp.zeros_like(vd2)
        vtd_ref[...] = jnp.zeros_like(vtd_ref)

    S = vd1.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    vd1v = vd1[...]
    vd2v = vd2[...]
    acc = jnp.zeros((1, LANE), vtd_ref.dtype)
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
        qdx_ref[t] = qdx
        qdm_ref[t] = qdm
        qdy_ref[t] = qdy
        acc += jnp.sum(jnp.where(term, vdnew, zero), axis=0, keepdims=True)
        vd2v = vd1v
        vd1v = vdnew
    vtd_ref[...] += acc
    vd2[...] = vd2v
    vd1[...] = vd1v


def adjoint_forward_bm(qs, zt, za, ln, lm, *, mode="nw",
                       operator="softmax", nm=None):
    qx, qm, qy = qs
    K2, S, Bp = zt.shape
    dtype = zt.dtype
    T = 2 if K2 % 2 == 0 else 1
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][2]

    kern = functools.partial(_adj_fwd_kernel, lo=lo, operator=operator, T=T)
    blk = functools.partial(_block_spec, T, S)
    vtd, qdx, qdm, qdy = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[
            _len_spec(), _len_spec(),
            blk(lambda k: k), blk(lambda k: k),
            blk(lambda k: k), blk(lambda k: k), blk(lambda k: k),
        ],
        out_specs=[
            _vt_spec(),
            blk(lambda k: k), blk(lambda k: k), blk(lambda k: k),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((K2, S, Bp), dtype),
            jax.ShapeDtypeStruct((K2, S, Bp), dtype),
            jax.ShapeDtypeStruct((K2, S, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, LANE), dtype),
            pltpu.VMEM((S, LANE), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, zt, za, qx, qm, qy)
    return vtd[0, :B], (qdx, qdm, qdy)


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
    rqm0 = sqm0[...]
    rdm0 = sdm0[...]
    pqx0 = sqx0[...].astype(dt)
    pqm0 = rqm0.astype(dt)
    pqm1 = sqm1[...].astype(dt)
    pqy0 = sqy0[...].astype(dt)
    pdx0 = sdx0[...].astype(dt)
    pdm0 = rdm0.astype(dt)
    pdm1 = sdm1[...].astype(dt)
    pdy0 = sdy0[...].astype(dt)
    r0 = (KB - 1 - kk) * T
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
    ed1[...] = ed1v
    ed2[...] = ed2v
    e1[...] = e1v
    e2[...] = e2v
    sqx0[...] = qx_ref[0]
    sqm1[...] = qm_ref[1] if T > 1 else rqm0
    sqm0[...] = qm_ref[0]
    sqy0[...] = qy_ref[0]
    sdx0[...] = qdx_ref[0]
    sdm1[...] = qdm_ref[1] if T > 1 else rdm0
    sdm0[...] = qdm_ref[0]
    sdy0[...] = qdy_ref[0]


def adjoint_backward_bm(Ediag, qs, qds, ln, lm, *, mode="nw", nm=None):
    qx, qm, qy = qs
    qdx, qdm, qdy = qds
    K2, S, Bp = qx.shape
    dtype = Ediag.dtype
    T = 2 if K2 % 2 == 0 else 1
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][3]
    qdt = qx.dtype
    KB = K2 // T

    kern = functools.partial(_adj_bwd_kernel, lo=lo, T=T, KB=KB)
    blk = functools.partial(_block_spec, T, S)
    rev = blk(lambda k: KB - 1 - k)
    (Eddiag,) = pl.pallas_call(
        kern,
        grid=(Bp // LANE, KB),
        in_specs=[_len_spec(), _len_spec()] + [
            _block_spec(T, S, lambda k: KB - 1 - k) for _ in range(7)],
        out_specs=[rev],
        out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), dtype)],
        scratch_shapes=[pltpu.VMEM((S, LANE), dtype)] * 4
        + [pltpu.VMEM((S, LANE), qdt)] * 4
        + [pltpu.VMEM((S, LANE), dtype)] * 4,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, qx, qm, qy, qdx, qdm, qdy, Ediag)
    return Eddiag


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
