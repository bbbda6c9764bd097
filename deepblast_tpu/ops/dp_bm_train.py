"""Phase-split (triangle-windowed) TRAINING kernels for the batch-minor
backend — round 5.

The decode path proved (dp_bm.decode_stream_bm, PERF_NOTES rounds 2-3)
that splitting the diagonal walk into P contiguous phases, each its own
pallas_call with a static valid-slot window [w0, w1), skips ~36% of the
padded diagonal rectangle's invalid half at square shapes.  Round 4 left
the four *training-path* kernels monolithic (VERDICT r4 item 1); this
module applies the same windowing to them — the reference's actual hot
path (fwd + bwd + both adjoints through the nested custom_vjp; reference:
deepblast/nw_cuda.py:232-262, SURVEY §3.1).

Phase-output contracts (what makes this work without the dense-assembly
memset the round-2 analysis feared, docs/PERF_NOTES.md "Dynamic Element
offsets do NOT unlock output folding"):

* **Opaque residual streams** (Dx/Dm from the forward, Dxd/Dmd from the
  adjoint-forward) are emitted as standalone per-phase *segment* arrays
  ``(nr, W, Bp)`` — their only consumers are the reverse phase kernels,
  which read them back under the same static plan.  No dense D stream
  ever exists (in the monolithic kernels the two D writes were ~2/3 of
  the forward's traffic).

* **Expectation streams** (E and the gap adjoints Ed/EdA, plus EA when
  the caller wants the gap expectation) must reach
  :func:`deepblast_tpu.ops.skew_bm.unskew_bm`, whose contract is one
  dense ``(K2, S, Bp)`` stream.  Each phase writes its window *in place*
  into one dense buffer through an Element-indexed out-spec (k-varying
  element offsets: probed compile+exact on chip for reads AND writes,
  scripts/probe_dynamic_element.py round 3), threaded phase-to-phase via
  ``input_output_aliases``.  The first (highest-row) phase writes a
  fresh buffer, so the window complement is never written — and never
  needs to be: ``unskew[b, r, c] = s[r+c, r+1, b]`` is pure data
  movement, and every natural cell inside the padded ``(Np, Mp)``
  rectangle maps to a slot inside its phase's window (for rows
  [r0, r1): ``s = k - c + 1 >= r0 + 2 - Mp >= w0`` and
  ``s <= min(Np, r1) < w1``), so the uninitialised complement is cropped
  by the unskew and the adjoint-backward reads E through exactly the
  windows the backward wrote.  Expectation write traffic drops to the
  windowed ~64% with no zero-fill.

* **Boundary carries** (V/Vd/E/Ed rolling planes and the one-row Q
  carries of the reverse recurrences) flow between phases as small
  ``(S, Bp)`` arrays, exactly like the decode path.

The recurrences are the monolithic kernels' bodies evaluated on
zero-extended window planes; outputs agree with the monolithic kernels
at every consumed cell (tests/test_dp_bm_phased.py) because
masked-invalid cells are zeroed by both and out-of-window cells are
never consumed.

Extra structural win over the monolithic path: when the VJP's gap
cotangent is zero (training decodes with ``return_gap=False`` — the loss
only consumes E), the dispatcher passes ``za=None`` and the
adjoint-forward phase kernel drops the Za stream entirely; the
monolithic path materialised and streamed a zeros tensor.

Gate: ``DEEPBLAST_TRAIN_PHASES`` (phase count; ``0`` = monolithic
kernels, default 8 — the decode path's measured knee, PERF_NOTES r3).
Unlike the decode plan, phase boundaries here are 8-*row*-aligned rather
than T-block-aligned, so every kernel (and every phase) picks its own
unroll T — the adjoint-backward moves 7 streams and would otherwise drag
the forward down to its T.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.ops import smooth
from deepblast_tpu.ops.dp_scan import MODE_BOUNDS
from deepblast_tpu.ops import dp_bm as _bm
from deepblast_tpu.ops.dp_bm import (
    LANE, T_FWD, T_BWD, T_AFWD, T_ABWD,
    _menu, _cdt, _stream_inv, _deq, _eq, _is_i16, _interpret,
    _shl, _masks, _q_row, _pad_vec, _i32,
    _len_spec, _vt_spec, _block_spec, _fit_T, _compiler_params,
    _carry_spec, _place, _unfold_dims,
)
from deepblast_tpu.ops.skew_bm import bm_dims

__all__ = [
    "TRAIN_PHASES",
    "forward_bm_phased",
    "backward_bm_phased",
    "adjoint_forward_bm_phased",
    "adjoint_backward_bm_phased",
]

# Phase count for the training passes; 0 disables (monolithic kernels).
# Snapshot at import like the other kernel gates (dp_bm.SKEW_PAIR note);
# probes that flip it mid-process must also clear dp._build's lru_cache.
TRAIN_PHASES = int(_os.environ.get("DEEPBLAST_TRAIN_PHASES", "8"))


def _train_plan(K2, S, Kc, P=None):
    """Static plan ``[(r0, nr, w0, w1), ...]`` splitting the K2 diagonal
    rows into up to P phases with per-phase valid-slot windows (same
    window math as :func:`dp_bm._phase_plan`, in row units with 8-aligned
    boundaries)."""
    P = TRAIN_PHASES if P is None else P
    Np, Mp = S - 8, Kc
    nblk = K2 // 8
    P = max(1, min(P, nblk))
    bounds = [nblk * p // P * 8 for p in range(P + 1)]
    plan = []
    for p in range(P):
        r0, r1 = bounds[p], bounds[p + 1]
        if r1 <= r0:
            continue
        lo = max(0, r0 + 2 - Mp)
        hi = min(Np, r1) + 1
        w0 = (lo // 16) * 16
        w1 = min(-(-hi // 16) * 16, S)
        w1 = max(w1, min(w0 + 16, S))
        plan.append((r0, r1 - r0, w0, w1))
    return plan


def _dims_from_nm(nm):
    if nm is None:
        raise ValueError("phased training kernels need nm=(N, M) to "
                         "reconstruct the phase plan")
    N, M = nm
    Np, Mp, S, K2 = bm_dims(int(N), int(M))
    return Np, Mp, S, K2


def _elem_in(T, W, Kc, r0, w0):
    """Element-indexed window into a *compact* input stream (rows folded
    mod Kc): block (T, W, LANE) at element offset ((r0 + k*T) % Kc, w0,
    b*LANE).  8-aligned r0 and T | 8 | 16 | Kc guarantee blocks never
    straddle the fold wrap."""
    return pl.BlockSpec(
        (pl.Element(T), pl.Element(W), pl.Element(LANE)),
        lambda b, k, r0=r0, w0=w0, T=T, Kc=Kc: (
            _i32((r0 + k * T) % Kc), _i32(w0), b * LANE),
        memory_space=pltpu.VMEM)


def _elem_dense(T, W, r0, w0, nk=None):
    """Element-indexed window into a *dense* (K2, S, Bp) stream at true
    row offset ``r0 + k*T`` (ascending) or ``r0 + (nk-1-k)*T``
    (descending grids)."""
    if nk is None:
        def idx(b, k, r0=r0, w0=w0, T=T):
            return (_i32(r0 + k * T), _i32(w0), b * LANE)
    else:
        def idx(b, k, r0=r0, w0=w0, T=T, nk=nk):
            return (_i32(r0 + (nk - 1 - k) * T), _i32(w0), b * LANE)
    return pl.BlockSpec((pl.Element(T), pl.Element(W), pl.Element(LANE)),
                        idx, memory_space=pltpu.VMEM)


def _any_spec():
    """Spec for a dense buffer that is an operand only for aliasing (the
    kernel never touches the ref)."""
    return pl.BlockSpec(memory_space=pltpu.ANY)


def _seg_asc(T, W):
    return _block_spec(T, W, lambda k: k)


def _seg_desc(T, W, nk):
    return _block_spec(T, W, lambda k, nk=nk: nk - 1 - k)


# ---------------------------------------------------------------------------
# forward (phased): (th, A) -> (vt, aux = (dx segments, dm segments))
# ---------------------------------------------------------------------------

def forward_bm_phased(th, ad, ln, lm, *, mode="nw", operator="softmax",
                      nm=None, dtypes=None):
    """Windowed-phase forward.  ``aux`` is ``(tuple(Dx_segs),
    tuple(Dm_segs))`` — per-phase ``(nr, W, Bp)`` segment arrays the
    reverse passes read back under the same plan (the plan is recomputed
    from static shapes, never stored)."""
    menu = _menu(dtypes)
    Kc, S, Bp = th.shape
    K2 = _unfold_dims(th)
    dtype = _cdt(th.dtype)
    ddt = menu.d_dtype or dtype
    plan = _train_plan(K2, S, Kc)
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][0]
    inv = _stream_inv(th.dtype, menu.stream_range)
    cz = jnp.zeros((S, Bp), dtype)

    vt = jnp.zeros((8, Bp), dtype)
    v1, v2 = cz, cz
    dxs, dms = [], []
    for (r0, nr, w0, w1) in plan:
        W = w1 - w0
        T = _fit_T(T_FWD, nr, W, [th.dtype, ad.dtype, ddt, ddt])
        nk = nr // T
        kern = functools.partial(_bm._fwd_phase_kernel, lo=lo,
                                 operator=operator, T=T, k0=r0 // T,
                                 w0=w0, w1=w1, inv=inv)
        seg = _seg_asc(T, W)
        inw = _elem_in(T, W, Kc, r0, w0)
        vt, dxseg, dmseg, v1, v2 = pl.pallas_call(
            kern,
            grid=(Bp // LANE, nk),
            in_specs=[
                _len_spec(), _len_spec(),
                _vt_spec(), _carry_spec(S), _carry_spec(S),
                inw, inw,
            ],
            out_specs=[_vt_spec(), seg, seg,
                       _carry_spec(S), _carry_spec(S)],
            out_shape=[
                jax.ShapeDtypeStruct((8, Bp), dtype),
                jax.ShapeDtypeStruct((nr, W, Bp), ddt),
                jax.ShapeDtypeStruct((nr, W, Bp), ddt),
                jax.ShapeDtypeStruct((S, Bp), dtype),
                jax.ShapeDtypeStruct((S, Bp), dtype),
            ],
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(lnp, lmp, vt, v1, v2, th, ad)
        dxs.append(dxseg)
        dms.append(dmseg)
    return vt[0, :B], (tuple(dxs), tuple(dms))


# ---------------------------------------------------------------------------
# backward (phased): windowed in-place writes into the dense E / EA streams
# ---------------------------------------------------------------------------

def _bwd_train_kernel(ln_ref, lm_ref, et_ref,
                      e1_in, e2_in, qx_in, qm_in, qy_in, qm2_in,
                      dx_ref, dm_ref, *rest,
                      lo, operator, T, k0, nk, w0, w1, want_gap, aliased):
    """One backward phase (descending rows).  Same recurrence as
    dp_bm._bwd_kernel on zero-extended window planes; with ``want_gap``
    the gap expectation ``EA[r] = E[r] * (Qx[r] + Qy[r])`` is fused.
    ``aliased`` marks the presence of the pass-through dense-buffer
    operand refs (input_output_aliases), which the kernel ignores."""
    n_e = 2 if want_gap else 1
    rest = rest[n_e:] if aliased else rest
    if want_gap:
        (e_ref, ea_ref, e1_ref, e2_ref,
         qx_ref, qm_ref, qy_ref, qm2_ref) = rest
    else:
        e_ref, e1_ref, e2_ref, qx_ref, qm_ref, qy_ref, qm2_ref = rest
        ea_ref = None
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        e1_ref[...] = e1_in[...]
        e2_ref[...] = e2_in[...]
        qx_ref[...] = qx_in[...]
        qm_ref[...] = qm_in[...]
        qy_ref[...] = qy_in[...]
        qm2_ref[...] = qm2_in[...]

    S = e1_ref.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    et = et_ref[...]
    e1v = e1_ref[...]
    e2v = e2_ref[...]
    dt = e1v.dtype
    q1 = (qx_ref[...], qm_ref[...], qy_ref[...])
    qm2 = qm2_ref[...]
    r0b = (k0 + nk - 1 - kk) * T
    for lt in reversed(range(T)):
        d = r0b + lt + 2
        dxf = _place(dx_ref[lt].astype(dt), w0, S - w1)
        dmf = _place(dm_ref[lt].astype(dt), w0, S - w1)
        qh = _q_row(operator, dxf, dmf)
        qx, qm, qy = q1
        enew = _shl(qx * e1v) + _shl(qm2 * e2v) + qy * e1v
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), enew.dtype)
        enew = jnp.where(valid, enew, zero)
        enew = enew + jnp.where(term, et, zero)
        e_ref[lt] = _eq(enew[w0:w1], e_ref.dtype)
        if want_gap:
            ea_ref[lt] = _eq((enew * (qh[0] + qh[2]))[w0:w1],
                             ea_ref.dtype)
        e2v = e1v
        e1v = enew
        qm2 = qm
        q1 = qh
    e1_ref[...] = e1v
    e2_ref[...] = e2v
    qx_ref[...], qm_ref[...], qy_ref[...] = q1
    qm2_ref[...] = qm2


def backward_bm_phased(Et, aux, ln, lm, *, mode="nw", operator="softmax",
                       want_gap=False, nm=None, dtypes=None):
    """Reverse pass over the forward's segments.  Returns the dense
    ``(K2, S, Bp)`` expectation stream(s) with only the phase windows
    written (safe — see module docstring); the same buffer serves
    unskew (crops the complement) and the adjoint-backward (reads the
    same windows)."""
    menu = _menu(dtypes)
    dxs, dms = aux
    Bp = dxs[0].shape[2]
    Np, Mp, S, K2 = _dims_from_nm(nm)
    dtype = _cdt(Et.dtype)
    # training VJP: Et is an arbitrary cotangent, so the int16 E knob
    # never applies here (same rule as the monolithic backward_bm)
    edt = dtype if _is_i16(menu.e_dtype) else (menu.e_dtype or dtype)
    plan = _train_plan(K2, S, Mp)
    if len(plan) != len(dxs):
        raise ValueError("segment count does not match the phase plan")
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    etp = _pad_vec(Et, Bp, dtype)
    lo = MODE_BOUNDS[mode][1]
    cz = jnp.zeros((S, Bp), dtype)
    n_e = 2 if want_gap else 1

    E = EA = None
    e1 = e2 = qx = qm = qy = qm2 = cz
    for p in reversed(range(len(plan))):
        r0, nr, w0, w1 = plan[p]
        W = w1 - w0
        if dxs[p].shape[:2] != (nr, W):
            raise ValueError(f"segment {p} shape {dxs[p].shape} does not "
                             f"match plan {(nr, W)}")
        T = _fit_T(T_BWD, nr, W,
                   [dxs[p].dtype, dms[p].dtype] + [edt] * n_e)
        nk = nr // T
        aliased = E is not None
        kern = functools.partial(_bwd_train_kernel, lo=lo,
                                 operator=operator, T=T, k0=r0 // T,
                                 nk=nk, w0=w0, w1=w1, want_gap=want_gap,
                                 aliased=aliased)
        seg = _seg_desc(T, W, nk)
        outw = _elem_dense(T, W, r0, w0, nk=nk)
        operands = [lnp, lmp, etp, e1, e2, qx, qm, qy, qm2,
                    dxs[p], dms[p]]
        in_specs = ([_len_spec(), _len_spec(), _len_spec()]
                    + [_carry_spec(S)] * 6 + [seg, seg])
        io_alias = {}
        if aliased:
            operands.append(E)
            in_specs.append(_any_spec())
            io_alias[11] = 0
            if want_gap:
                operands.append(EA)
                in_specs.append(_any_spec())
                io_alias[12] = 1
        outs = pl.pallas_call(
            kern,
            grid=(Bp // LANE, nk),
            in_specs=in_specs,
            out_specs=[outw] * n_e + [_carry_spec(S)] * 6,
            out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), edt)] * n_e
            + [jax.ShapeDtypeStruct((S, Bp), dtype)] * 6,
            input_output_aliases=io_alias,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(*operands)
        if want_gap:
            E, EA, e1, e2, qx, qm, qy, qm2 = outs
        else:
            E, e1, e2, qx, qm, qy, qm2 = outs
    return E, EA


# ---------------------------------------------------------------------------
# adjoint forward (phased): JVP of the forward along (Zt, Za)
# ---------------------------------------------------------------------------

def _afwd_train_kernel(ln_ref, lm_ref, vtd_in, vd1_in, vd2_in, *rest,
                       lo, operator, T, k0, w0, w1, inv, has_za):
    """One adjoint-forward phase: dp_bm._adj_fwd_kernel's recurrence on
    zero-extended window planes.  With ``has_za=False`` the Za stream is
    absent entirely (zero gap cotangent — the training decode path)."""
    if has_za:
        (zt_ref, za_ref, dx_ref, dm_ref,
         vtd_ref, dxd_ref, dmd_ref, vd1_ref, vd2_ref) = rest
    else:
        (zt_ref, dx_ref, dm_ref,
         vtd_ref, dxd_ref, dmd_ref, vd1_ref, vd2_ref) = rest
        za_ref = None
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        vtd_ref[...] = vtd_in[...]
        vd1_ref[...] = vd1_in[...]
        vd2_ref[...] = vd2_in[...]

    S = vd1_ref.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    vd1v = vd1_ref[...]
    vd2v = vd2_ref[...]
    dt = vd1v.dtype
    ddt = dxd_ref.dtype
    acc = jnp.zeros((1, LANE), vtd_ref.dtype)
    for t in range(T):
        d = (k0 + kk) * T + t + 2
        dxf = _place(dx_ref[t].astype(dt), w0, S - w1)
        dmf = _place(dm_ref[t].astype(dt), w0, S - w1)
        qx, qm, _ = _q_row(operator, dxf, dmf)
        dxd = _bm._shr(vd1v) - vd1v            # xargd - yargd (Za cancels)
        if has_za:
            zash = _place(_deq(za_ref[t].astype(dt), inv), w0, S - w1)
            dmd = _bm._shr(vd2v) - zash - vd1v  # margd - yargd
        else:
            zash = None
            dmd = _bm._shr(vd2v) - vd1v
        dxd_ref[t] = dxd[w0:w1].astype(ddt)
        dmd_ref[t] = dmd[w0:w1].astype(ddt)
        ztw = _place(_deq(zt_ref[t].astype(dt), inv), w0, S - w1)
        # q is a probability vector, so the tangent recurrence telescopes;
        # term order matches dp_bm._adj_fwd_kernel bit-for-bit
        if has_za:
            vdnew = ztw + zash + vd1v + qx * dxd + qm * dmd
        else:
            vdnew = ztw + vd1v + qx * dxd + qm * dmd
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vdnew.dtype)
        vdnew = jnp.where(valid, vdnew, zero)
        acc += jnp.sum(jnp.where(term, vdnew, zero), axis=0, keepdims=True)
        vd2v = vd1v
        vd1v = vdnew
    vtd_ref[...] += acc
    vd2_ref[...] = vd2v
    vd1_ref[...] = vd1v


def adjoint_forward_bm_phased(aux, zt, za, ln, lm, *, mode="nw",
                              operator="softmax", nm=None, dtypes=None):
    """Phased JVP of the forward.  ``za=None`` means a zero gap
    cotangent: the Za stream is dropped from the kernels entirely
    (advertised to the dispatcher via the backend's ``za_none`` key)."""
    menu = _menu(dtypes)
    dxs, dms = aux
    Kc, S, Bp = zt.shape
    K2 = sum(seg.shape[0] for seg in dxs)
    dtype = _cdt(zt.dtype)
    ddt = menu.d_dtype or dtype
    plan = _train_plan(K2, S, Kc)
    if len(plan) != len(dxs):
        raise ValueError("segment count does not match the phase plan")
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][2]
    inv = _stream_inv(zt.dtype, menu.stream_range)
    has_za = za is not None
    cz = jnp.zeros((S, Bp), dtype)

    vtd = jnp.zeros((8, Bp), dtype)
    vd1, vd2 = cz, cz
    dxds, dmds = [], []
    for p, (r0, nr, w0, w1) in enumerate(plan):
        W = w1 - w0
        streams = [zt.dtype, dxs[p].dtype, dms[p].dtype, ddt, ddt]
        if has_za:
            streams.append(za.dtype)
        T = _fit_T(T_AFWD, nr, W, streams)
        nk = nr // T
        kern = functools.partial(_afwd_train_kernel, lo=lo,
                                 operator=operator, T=T, k0=r0 // T,
                                 w0=w0, w1=w1, inv=inv, has_za=has_za)
        seg = _seg_asc(T, W)
        inw = _elem_in(T, W, Kc, r0, w0)
        operands = [lnp, lmp, vtd, vd1, vd2, zt]
        in_specs = [_len_spec(), _len_spec(),
                    _vt_spec(), _carry_spec(S), _carry_spec(S), inw]
        if has_za:
            operands.append(za)
            in_specs.append(inw)
        operands += [dxs[p], dms[p]]
        in_specs += [seg, seg]
        vtd, dxdseg, dmdseg, vd1, vd2 = pl.pallas_call(
            kern,
            grid=(Bp // LANE, nk),
            in_specs=in_specs,
            out_specs=[_vt_spec(), seg, seg,
                       _carry_spec(S), _carry_spec(S)],
            out_shape=[
                jax.ShapeDtypeStruct((8, Bp), dtype),
                jax.ShapeDtypeStruct((nr, W, Bp), ddt),
                jax.ShapeDtypeStruct((nr, W, Bp), ddt),
                jax.ShapeDtypeStruct((S, Bp), dtype),
                jax.ShapeDtypeStruct((S, Bp), dtype),
            ],
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(*operands)
        dxds.append(dxdseg)
        dmds.append(dmdseg)
    return vtd[0, :B], (tuple(dxds), tuple(dmds))


# ---------------------------------------------------------------------------
# adjoint backward (phased), with the gap adjoint fused
# ---------------------------------------------------------------------------

def _abwd_train_kernel(ln_ref, lm_ref,
                       ed1_in, ed2_in, e1_in, e2_in,
                       qx_in, qm_in, qy_in, qdx_in, qdm_in, qdy_in,
                       qm2_in, qdm2_in,
                       dx_ref, dm_ref, dxd_ref, dmd_ref, e_ref, *rest,
                       lo, operator, T, k0, nk, w0, w1, aliased):
    """One adjoint-backward phase (descending): dp_bm._adj_bwd_kernel's
    recurrence on zero-extended window planes, gap adjoint
    ``EdA[r] = Ed[r]*(Qx+Qy) + E[r]*(Qdx+Qdy)`` fused."""
    rest = rest[2:] if aliased else rest
    (ed_ref, eda_ref, ed1_ref, ed2_ref, e1_ref, e2_ref,
     qx_ref, qm_ref, qy_ref, qdx_ref, qdm_ref, qdy_ref,
     qm2_ref, qdm2_ref) = rest
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        ed1_ref[...] = ed1_in[...]
        ed2_ref[...] = ed2_in[...]
        e1_ref[...] = e1_in[...]
        e2_ref[...] = e2_in[...]
        qx_ref[...] = qx_in[...]
        qm_ref[...] = qm_in[...]
        qy_ref[...] = qy_in[...]
        qdx_ref[...] = qdx_in[...]
        qdm_ref[...] = qdm_in[...]
        qdy_ref[...] = qdy_in[...]
        qm2_ref[...] = qm2_in[...]
        qdm2_ref[...] = qdm2_in[...]

    S = e1_ref.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    ed1v = ed1_ref[...]
    ed2v = ed2_ref[...]
    e1v = e1_ref[...]
    e2v = e2_ref[...]
    dt = e1v.dtype
    q1 = (qx_ref[...], qm_ref[...], qy_ref[...])
    qd1 = (qdx_ref[...], qdm_ref[...], qdy_ref[...])
    qm2 = qm2_ref[...]
    qdm2 = qdm2_ref[...]
    r0b = (k0 + nk - 1 - kk) * T
    for lt in reversed(range(T)):
        d = r0b + lt + 2
        dxf = _place(dx_ref[lt].astype(dt), w0, S - w1)
        dmf = _place(dm_ref[lt].astype(dt), w0, S - w1)
        qsh = _q_row(operator, dxf, dmf)
        dxdf = _place(dxd_ref[lt].astype(dt), w0, S - w1)
        dmdf = _place(dmd_ref[lt].astype(dt), w0, S - w1)
        qdh = smooth.hessian3(operator, qsh,
                              (dxdf, dmdf, jnp.zeros_like(dxdf)))
        qx, qm, qy = q1
        qdx, qdm, qdy = qd1
        ednew = (_shl(qdx * e1v + qx * ed1v)
                 + _shl(qdm2 * e2v + qm2 * ed2v)
                 + qdy * e1v + qy * ed1v)
        valid, _ = _masks(iarr, d, ln, lm, lo)
        ednew = jnp.where(valid, ednew, jnp.zeros((), ednew.dtype))
        ed_ref[lt] = ednew[w0:w1].astype(ed_ref.dtype)
        ehere = _place(e_ref[lt].astype(dt), w0, S - w1)
        eda_ref[lt] = ((ednew * (qsh[0] + qsh[2])
                        + ehere * (qdh[0] + qdh[2]))[w0:w1]
                       ).astype(eda_ref.dtype)
        ed2v = ed1v
        ed1v = ednew
        e2v = e1v
        e1v = ehere
        qm2 = qm
        qdm2 = qdm
        q1 = qsh
        qd1 = qdh
    ed1_ref[...] = ed1v
    ed2_ref[...] = ed2v
    e1_ref[...] = e1v
    e2_ref[...] = e2v
    qx_ref[...], qm_ref[...], qy_ref[...] = q1
    qdx_ref[...], qdm_ref[...], qdy_ref[...] = qd1
    qm2_ref[...] = qm2
    qdm2_ref[...] = qdm2


def adjoint_backward_bm_phased(Ediag, aux, adj_aux, ln, lm, *, mode="nw",
                               operator="softmax", nm=None, dtypes=None):
    """Phased adjoint-backward.  ``Ediag`` is the windowed dense stream
    :func:`backward_bm_phased` produced; each phase reads back exactly
    the window it was written with (Element in-spec), so the unwritten
    complement is never consumed."""
    menu = _menu(dtypes)
    dxs, dms = aux
    dxds, dmds = adj_aux
    Bp = dxs[0].shape[2]
    Np, Mp, S, K2 = _dims_from_nm(nm)
    dtype = _cdt(Ediag.dtype)
    # adjoint expectations (Ed/EdA) are unbounded: int16 E never applies
    edt = dtype if _is_i16(menu.e_dtype) else (menu.e_dtype or dtype)
    plan = _train_plan(K2, S, Mp)
    if len(plan) != len(dxs):
        raise ValueError("segment count does not match the phase plan")
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][3]
    cz = jnp.zeros((S, Bp), dtype)

    Ed = EdA = None
    ed1 = ed2 = e1 = e2 = cz
    qx = qm = qy = qdx = qdm = qdy = qm2 = qdm2 = cz
    for p in reversed(range(len(plan))):
        r0, nr, w0, w1 = plan[p]
        W = w1 - w0
        T = _fit_T(T_ABWD, nr, W,
                   [dxs[p].dtype, dms[p].dtype, dxds[p].dtype,
                    dmds[p].dtype, Ediag.dtype, edt, edt])
        nk = nr // T
        aliased = Ed is not None
        kern = functools.partial(_abwd_train_kernel, lo=lo,
                                 operator=operator, T=T, k0=r0 // T,
                                 nk=nk, w0=w0, w1=w1, aliased=aliased)
        seg = _seg_desc(T, W, nk)
        ein = _elem_dense(T, W, r0, w0, nk=nk)
        outw = _elem_dense(T, W, r0, w0, nk=nk)
        operands = [lnp, lmp,
                    ed1, ed2, e1, e2,
                    qx, qm, qy, qdx, qdm, qdy, qm2, qdm2,
                    dxs[p], dms[p], dxds[p], dmds[p], Ediag]
        in_specs = ([_len_spec(), _len_spec()]
                    + [_carry_spec(S)] * 12
                    + [seg, seg, seg, seg, ein])
        io_alias = {}
        if aliased:
            operands += [Ed, EdA]
            in_specs += [_any_spec(), _any_spec()]
            io_alias = {19: 0, 20: 1}
        outs = pl.pallas_call(
            kern,
            grid=(Bp // LANE, nk),
            in_specs=in_specs,
            out_specs=[outw, outw] + [_carry_spec(S)] * 12,
            out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), edt)] * 2
            + [jax.ShapeDtypeStruct((S, Bp), dtype)] * 12,
            input_output_aliases=io_alias,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(*operands)
        (Ed, EdA, ed1, ed2, e1, e2,
         qx, qm, qy, qdx, qdm, qdy, qm2, qdm2) = outs
    return Ed, EdA
