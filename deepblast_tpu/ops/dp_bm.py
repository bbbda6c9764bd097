"""Batch-minor Pallas TPU wavefront kernels with difference-stream
recomputation.

Round-2 redesign of :mod:`deepblast_tpu.ops.dp_pallas` combining the two
ranked perf items of docs/PERF_NOTES.md, in their final form:

1. **Batch-minor streams** ``(K2, S, Bp)`` — DP slot on sublanes
   (``S = Np + 8``, ~1.5% padding vs 25% lane padding in round 1), batch on
   lanes; relayouts in :mod:`deepblast_tpu.ops.skew_bm`; slot shifts are
   static one-sublane shifts.

2. **Difference-stream Q recomputation** (the DP analogue of
   flash-attention's softmax recomputation, exploiting that every smooth
   max operator here is *additively equivariant*): instead of the three
   soft-argmax streams (or the raw value stream), the forward stores the
   two transition-argument differences

       Dx[r] = xarg - yarg = shr(V[r-1]) - V[r-1]          (A cancels)
       Dm[r] = marg - yarg = shr(V[r-2]) - A[r] - V[r-1]

   so every reverse pass recomputes ``Q[r] = softargmax(Dx[r], Dm[r], 0)``
   row-aligned, with no delayed-stream contract and no cross-block Q
   carries.  The differences are O(1)-range (neighbouring DP values), so
   bf16 storage loses ~1e-3 of E instead of the ~2e-2 a bf16 *value*
   stream costs — and the forward value recurrence reduces to
   ``V[r] = theta + A + V[r-1] + max3(Dx, Dm, 0)``.

   The adjoint passes use the same algebra on the tangent side: since the
   soft-argmax is a probability vector (``qx+qm+qy = 1``) the tangent
   recurrence reduces to ``yargd + qx*Dxd + qm*Dmd`` with

       Dxd[r] = shr(Vd[r-1]) - Vd[r-1]                     (Za cancels)
       Dmd[r] = shr(Vd[r-2]) - Za[r] - Vd[r-1]

   and the operator Hessian-product is shift-invariant (J @ 1 = 0 for all
   three operators), so ``Qd[r] = hessian3(Q[r], (Dxd[r], Dmd[r], 0))``.

Residuals through the dispatcher (deepblast_tpu.ops.dp v2 interface):
``aux = (Dx, Dm)``, ``adj_aux = (Dxd, Dmd)``.

All kernels here are DMA-bound (probed: a pure stream copy costs the same
as the full forward), so stream storage dtypes are the first-order perf
lever: ``STREAM_DTYPE`` (skewed inputs), ``D_DTYPE`` (difference
residuals), ``E_DTYPE`` (expectation outputs) opt into bf16 storage while
every in-kernel recurrence stays fp32.

Boundary semantics (masking, seeding, terminal selection) are identical to
:mod:`deepblast_tpu.ops.dp_scan`, the oracle these kernels are
parity-tested against.  Reference being replaced: the paired CUDA kernels
deepblast/nw_cuda.py:46-165 (one serial thread per pair; stores the full
Q tensor, deepblast/nw_cuda.py:171-200).
"""

from __future__ import annotations

import functools
import os as _os
import typing as _typing

import numpy as _np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.ops import smooth
from deepblast_tpu.ops.dp_scan import MODE_BOUNDS
from deepblast_tpu.ops.skew_bm import skew_bm, skew_bm_pair, unskew_bm

__all__ = [
    "DTypeMenu",
    "forward_bm",
    "backward_bm",
    "adjoint_forward_bm",
    "adjoint_backward_bm",
    "register",
]

LANE = 128

# Preferred per-kernel diagonal unroll factors; each wrapper shrinks its T
# until the double-buffered stream blocks fit the VMEM budget.
T_FWD = 8
T_BWD = 8
T_AFWD = 8
T_ABWD = 4
T_EA = 8

VMEM_BUDGET = int(_os.environ.get("DEEPBLAST_VMEM_BUDGET", 14 * 2**20))

# Storage dtypes (None = compute dtype).  bf16 halves stream DMA traffic;
# compute stays fp32 in-kernel.  Opt-in (bench/inference); tests and
# training pin fp32.
#
# These module globals are the process-wide *defaults*; callers that need
# isolation (two models with different menus in one process) pass an
# explicit :class:`DTypeMenu` per call instead — every public kernel
# wrapper takes ``dtypes=``, and the dispatcher (ops.dp) threads it into
# its custom_vjp cache key via the backend registry's ``with_dtypes``
# factory, so kernels traced under one menu can never serve another.
STREAM_DTYPE = None   # skewed potential/tangent streams th_s/A_s/Zt_s/Za_s
D_DTYPE = None        # difference residual streams Dx/Dm/Dxd/Dmd
E_DTYPE = None        # expectation streams E / Ed / EA / EdA

# Fused dual-skew relayout gate, snapshot at import (like
# skew_bm.STRATEGY): reading the env var lazily at trace time made
# mid-process toggles silently ineffective behind dp._build's lru_cache
# and jit (ADVICE r3).  Probes/tests that flip it mid-process must set
# this module attribute AND clear dp._build's cache.
SKEW_PAIR = _os.environ.get("DEEPBLAST_SKEW_PAIR", "0") == "1"

# int16 *fixed-point* storage (decode-path dtype menu, round 2.5): where
# bf16's 8-bit mantissa broke the traceback-agreement gate (inputs ~83%,
# E ~63% — near-tie walk comparisons) and fp16 does not compile on this
# toolchain, int16 fixed point offers 16-60x finer resolution at the same
# byte width.  Inputs quantize as round(x * 32767/STREAM_RANGE) with
# saturation (values beyond +-STREAM_RANGE clip — potentials are O(1)-
# scale model outputs; the range is a knob).  Expectation streams (E in
# [0, 1]) quantize at scale 32767: resolution 3e-5, ~100x finer than
# bf16 near 1.  Compute stays fp32 in-kernel; only stores/loads convert.
STREAM_RANGE = 16.0   # clip range when STREAM_DTYPE is int16
_E_SCALE = 32767.0    # fixed-point scale when E_DTYPE is int16


def _is_i16(dt):
    return dt is not None and jnp.dtype(dt) == jnp.int16


class DTypeMenu(_typing.NamedTuple):
    """Per-call storage-dtype menu for the batch-minor kernels.

    Hashable (dtype *names*, not dtype objects) so it can key the
    dispatcher's custom_vjp ``lru_cache`` — two models with different
    menus in one process get distinct traced kernels.  ``None`` fields
    mean "compute dtype" (fp32).  Build via :meth:`make`, which accepts
    anything ``jnp.dtype`` does."""

    stream: "str | None" = None   # skewed input streams th_s/A_s/Zt_s/Za_s
    d: "str | None" = None        # difference residual streams Dx/Dm/Dxd/Dmd
    e: "str | None" = None        # expectation streams E / Ed / EA / EdA
    stream_range: float = 16.0    # int16 saturation range for inputs

    @classmethod
    def make(cls, stream=None, d=None, e=None, stream_range=None):
        def name(x):
            return None if x is None else jnp.dtype(x).name
        return cls(name(stream), name(d), name(e),
                   float(STREAM_RANGE if stream_range is None
                         else stream_range))

    @property
    def stream_dtype(self):
        return None if self.stream is None else jnp.dtype(self.stream)

    @property
    def d_dtype(self):
        return None if self.d is None else jnp.dtype(self.d)

    @property
    def e_dtype(self):
        return None if self.e is None else jnp.dtype(self.e)


def _menu(dtypes):
    """Resolve a per-call menu; ``None`` falls back to the module-global
    defaults (kept for probe scripts and back-compat)."""
    if dtypes is None:
        return DTypeMenu.make(STREAM_DTYPE, D_DTYPE, E_DTYPE, STREAM_RANGE)
    if not isinstance(dtypes, DTypeMenu):
        raise TypeError(f"dtypes must be a DTypeMenu, got {type(dtypes)!r}")
    return dtypes


def _stream_inv(dt, stream_range):
    """Static dequantization factor for int16 fixed-point input streams
    (None = stream is a plain float dtype)."""
    return stream_range / 32767.0 if _is_i16(dt) else None


def _deq(v, inv):
    return v * inv if inv else v


def _eq(v, odt):
    """Store-side cast, quantizing expectation planes when the stream
    dtype is int16 fixed point."""
    if _is_i16(odt):
        return jnp.floor(
            jnp.clip(v * _E_SCALE, -32767.0, 32767.0) + 0.5).astype(odt)
    return v.astype(odt)


def _interpret():
    return jax.default_backend() != "tpu"


def _cdt(*dtypes):
    """In-kernel compute dtype: fp32 unless inputs are wider."""
    return jnp.promote_types(jnp.result_type(*dtypes), jnp.float32)


# Sublane-shift lowering (both probed correct on-chip; perf-selectable via
# DEEPBLAST_SHIFT=roll for measurement, see scripts/profile_bm.py)
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


def _q_row(operator, dx, dm):
    """Soft-argmax of one row from its difference streams (shift
    invariance of the operator: Q = softargmax(xarg, marg, yarg) =
    softargmax(Dx, Dm, 0))."""
    _, qs = smooth.max3(operator, dx, dm, jnp.zeros_like(dx))
    return qs


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


def _fit_T(T0, K2, S, dtypes):
    """Largest T <= T0 dividing K2 whose double-buffered stream blocks fit
    the VMEM budget (``dtypes``: one entry per stream operand/output).

    ``K2`` is 8-aligned by construction (:func:`_unfold_dims`) and every
    preferred T is a power of two <= 8, so divisibility always resolves by
    halving; kernels with different stream counts (forward_score_bm vs
    forward_bm) may legitimately pick different T at large shapes — a
    per-kernel unroll factor, not a layout contract (ADVICE r4).  The
    T=1 endpoint is a *slow* but correct degradation; fail loudly on the
    one genuinely bad input instead of looping forever."""
    if K2 <= 0 or K2 % 8 != 0:
        raise ValueError(f"stream row count K2={K2} is not 8-aligned — "
                         "inputs did not come from skew_input")
    per_row = sum(S * LANE * jnp.dtype(d).itemsize for d in dtypes)
    T = T0
    while T > 1 and (K2 % T != 0 or 2 * T * per_row > VMEM_BUDGET):
        T //= 2
    return max(T, 1)


VMEM_LIMIT = int(_os.environ.get("DEEPBLAST_VMEM_LIMIT", 64 * 2**20))


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=VMEM_LIMIT)


def skew_input(x, dtypes=None):
    """Relayout a natural ``(B, N, M)`` potential into the *compact*
    batch-minor diagonal stream ``(Mp, S, Bp)`` — rows folded mod ``Mp``
    (see skew_bm: diagonals ``d`` and ``d + Mp`` have disjoint slot
    windows, so the fold is collision-free and halves the skew's HBM
    write at square shapes).  Stored in the menu's stream dtype when set
    (int16 selects fixed-point quantization at scale
    ``32767/stream_range``; consumers dequantize on load)."""
    menu = _menu(dtypes)
    sdt = menu.stream_dtype
    scale = 32767.0 / menu.stream_range if _is_i16(sdt) else None
    return skew_bm(x, out_dtype=sdt, compact=True, quant_scale=scale)


def skew_input_pair(x, y, dtypes=None):
    """Fused :func:`skew_input` for the (theta, A) pair — one pallas_call
    with two in/out refs instead of two serialized calls.  Opt-in
    (``DEEPBLAST_SKEW_PAIR=1``): on chip the fused form wins standalone
    at the mins (1.19 vs 1.49 ms fp32) but shows no end-to-end decode win
    and never reached the fast timing window across 6 interleaved rounds
    (docs/PERF_NOTES.md round 3, probe_skew_pair), so two single calls
    stay the default."""
    if not SKEW_PAIR:
        return skew_input(x, dtypes=dtypes), skew_input(y, dtypes=dtypes)
    menu = _menu(dtypes)
    sdt = menu.stream_dtype
    scale = 32767.0 / menu.stream_range if _is_i16(sdt) else None
    return skew_bm_pair(x, y, out_dtype=sdt, compact=True,
                        quant_scale=scale)


def skew_cotangent_pair(x, y, dtypes=None):
    """Fused :func:`skew_cotangent` for the (Zt, Za) cotangent pair
    (float storage only — same int16 exclusion as the single form).
    Opt-in like :func:`skew_input_pair`."""
    if not SKEW_PAIR:
        return (skew_cotangent(x, dtypes=dtypes),
                skew_cotangent(y, dtypes=dtypes))
    sdt = _menu(dtypes).stream_dtype
    odt = None if _is_i16(sdt) else sdt
    return skew_bm_pair(x, y, out_dtype=odt, compact=True)


def skew_cotangent(x, dtypes=None):
    """Relayout for the VJP's *cotangent* streams (Zt/Za).  Cotangents
    are unbounded — any upstream loss scaling multiplies them — so the
    saturating int16 fixed-point knob must not apply (it would clip
    spikes and round small gradients to exactly zero).  Float storage
    dtypes (bf16) are scale-invariant and stay allowed."""
    sdt = _menu(dtypes).stream_dtype
    odt = None if _is_i16(sdt) else sdt
    return skew_bm(x, out_dtype=odt, compact=True)


def _unfold_dims(th):
    """Recover ``(K2, KBc)`` grid facts from a compact input stream
    ``(Kc, S, Bp)`` produced by :func:`skew_input` (``Kc = Mp``,
    ``S = Np + 8``): the DP grid still walks all ``K2`` true diagonal
    rows; input block rows wrap mod ``KBc = Kc // T``."""
    Kc, S, _ = th.shape
    Np = S - 8
    K2 = -(-(Np + Kc - 1) // 8) * 8
    return K2


def unskew_output(s, N, M, B):
    """Inverse relayout; always emits full-precision natural output
    (int16 fixed-point expectation streams are dequantized)."""
    if _is_i16(s.dtype):
        out = unskew_bm(s, N, M, B, out_dtype=jnp.float32)
        return out * jnp.float32(1.0 / _E_SCALE)
    return unskew_bm(s, N, M, B, out_dtype=_cdt(s.dtype))


# ---------------------------------------------------------------------------
# forward: (th, A) -> (vt, (Dx, Dm))
# ---------------------------------------------------------------------------

def _fwd_kernel(ln_ref, lm_ref, th_ref, ad_ref,
                vt_ref, dx_ref, dm_ref, v1, v2, *, lo, operator, T,
                inv=None):
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
    dt = v1v.dtype
    ddt = dx_ref.dtype
    acc = jnp.zeros((1, LANE), vt_ref.dtype)
    for t in range(T):
        d = k * T + t + 2
        ash = _deq(ad_ref[t].astype(dt), inv)
        dx = _shr(v1v) - v1v                  # xarg - yarg (A cancels)
        dm = _shr(v2v) - ash - v1v            # marg - yarg
        dx_ref[t] = dx.astype(ddt)
        dm_ref[t] = dm.astype(ddt)
        rel, _ = smooth.max3(operator, dx, dm, jnp.zeros_like(dx))
        vnew = _deq(th_ref[t].astype(dt), inv) + ash + v1v + rel
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vnew.dtype)
        vnew = jnp.where(valid, vnew, zero)
        acc += jnp.sum(jnp.where(term, vnew, zero), axis=0, keepdims=True)
        v2v = v1v
        v1v = vnew
    vt_ref[...] += acc
    v2[...] = v2v
    v1[...] = v1v


def forward_bm(th, ad, ln, lm, *, mode="nw", operator="softmax", nm=None,
               dtypes=None):
    """``th``/``ad`` are *compact* batch-minor streams from
    :func:`skew_input` (rows folded mod ``Kc``); the outputs walk the
    full padded ``K2`` rows (DP write order forbids folding outputs).
    Returns ``(vt, aux)`` with ``aux = (Dx, Dm)`` — the per-row transition
    argument differences every reverse pass recomputes Q from."""
    menu = _menu(dtypes)
    Kc, S, Bp = th.shape
    K2 = _unfold_dims(th)
    dtype = _cdt(th.dtype)
    ddt = menu.d_dtype or dtype
    T = _fit_T(T_FWD, K2, S, [th.dtype, ad.dtype, ddt, ddt])
    KBc = Kc // T
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][0]

    kern = functools.partial(_fwd_kernel, lo=lo, operator=operator, T=T,
                             inv=_stream_inv(th.dtype, menu.stream_range))
    blk = functools.partial(_block_spec, T, S)
    vt, dxs, dms = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[
            _len_spec(), _len_spec(),
            blk(lambda k: k % KBc), blk(lambda k: k % KBc),
        ],
        out_specs=[_vt_spec(), blk(lambda k: k), blk(lambda k: k)],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((K2, S, Bp), ddt),
            jax.ShapeDtypeStruct((K2, S, Bp), ddt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, LANE), dtype),
            pltpu.VMEM((S, LANE), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, th, ad)
    return vt[0, :B], (dxs, dms)


def _fwd_score_kernel(ln_ref, lm_ref, th_ref, ad_ref,
                      vt_ref, v1, v2, *, lo, operator, T, inv=None):
    """Score-only forward: identical recurrence to :func:`_fwd_kernel`
    but no Dx/Dm stores — the kernel's only output is the (8, Bp)
    terminal-score accumulator, so HBM traffic collapses to the input
    stream reads (~1/3 of the residual-writing forward's bytes at the
    bench shapes)."""
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
    dt = v1v.dtype
    acc = jnp.zeros((1, LANE), vt_ref.dtype)
    for t in range(T):
        d = k * T + t + 2
        ash = _deq(ad_ref[t].astype(dt), inv)
        dx = _shr(v1v) - v1v
        dm = _shr(v2v) - ash - v1v
        rel, _ = smooth.max3(operator, dx, dm, jnp.zeros_like(dx))
        vnew = _deq(th_ref[t].astype(dt), inv) + ash + v1v + rel
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vnew.dtype)
        vnew = jnp.where(valid, vnew, zero)
        acc += jnp.sum(jnp.where(term, vnew, zero), axis=0, keepdims=True)
        v2v = v1v
        v1v = vnew
    vt_ref[...] += acc
    v2[...] = v2v
    v1[...] = v1v


def forward_score_bm(th, ad, ln, lm, *, mode="nw", operator="softmax",
                     nm=None, dtypes=None):
    """Terminal score ``vt`` ONLY — the serving/search hot path.

    :func:`forward_bm` must write the two (K2, S, Bp) difference streams
    for its reverse consumers; a pure scoring call (``jit`` without
    ``grad``: deepblast-search, score_pairs) has no reverse consumer, but
    XLA cannot dead-code the stores out of the same pallas_call.  This
    variant drops them at the kernel level; the custom_vjp primal in
    ops.dp dispatches here while every differentiated path keeps the
    full forward (reference analogue: the score path runs the forward
    kernel alone, deepblast/alignment.py:127-137)."""
    menu = _menu(dtypes)
    Kc, S, Bp = th.shape
    K2 = _unfold_dims(th)
    dtype = _cdt(th.dtype)
    T = _fit_T(T_FWD, K2, S, [th.dtype, ad.dtype])
    KBc = Kc // T
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][0]

    kern = functools.partial(_fwd_score_kernel, lo=lo, operator=operator,
                             T=T,
                             inv=_stream_inv(th.dtype, menu.stream_range))
    blk = functools.partial(_block_spec, T, S)
    vt = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[
            _len_spec(), _len_spec(),
            blk(lambda k: k % KBc), blk(lambda k: k % KBc),
        ],
        out_specs=_vt_spec(),
        out_shape=jax.ShapeDtypeStruct((8, Bp), dtype),
        scratch_shapes=[
            pltpu.VMEM((S, LANE), dtype),
            pltpu.VMEM((S, LANE), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, th, ad)
    return vt[0, :B]


# ---------------------------------------------------------------------------
# backward (expected alignment), recomputing Q from (Dx, Dm)
# ---------------------------------------------------------------------------

def _bwd_kernel(ln_ref, lm_ref, et_ref, dx_ref, dm_ref,
                e_ref, *rest, lo, operator, T, KB, want_gap):
    """T diagonals (descending) per step.  Row ``r`` needs ``Q[r+1]`` and
    ``Q[r+2]``'s middle component: rows above the block top are carried as
    the previous (higher) block's row-0 difference planes + its lowest
    fresh ``qm``.  With ``want_gap`` the gap expectation
    ``EA[r] = E[r] * (Qx[r] + Qy[r])`` is fused in (Q[r] recomputed from
    the in-block planes — compute is free under the stream DMA)."""
    if want_gap:
        ea_ref, e1, e2, cqx, cqm, cqy, cqm2 = rest
    else:
        e1, e2, cqx, cqm, cqy, cqm2 = rest
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        for ref in (e1, e2, cqx, cqm, cqy, cqm2):
            ref[...] = jnp.zeros_like(ref)

    S = e1.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    et = et_ref[...]
    e1v = e1[...]
    e2v = e2[...]
    dt = e1v.dtype
    # Q of each row is evaluated ONCE, from its aligned in-block planes,
    # and carried one iteration (row r's recurrence consumes Q[r+1] and
    # Q[r+2]'s middle component) — the boundary rows above the block top
    # carry as the already-computed q planes, and the zero init is
    # harmless because those q's multiply E rows that are themselves 0.
    q1 = (cqx[...], cqm[...], cqy[...])
    qm2 = cqm2[...]
    r0 = (KB - 1 - kk) * T
    for lt in reversed(range(T)):
        d = r0 + lt + 2
        qh = _q_row(operator, dx_ref[lt].astype(dt),
                    dm_ref[lt].astype(dt))
        qx, qm, qy = q1
        enew = _shl(qx * e1v) + _shl(qm2 * e2v) + qy * e1v
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), enew.dtype)
        enew = jnp.where(valid, enew, zero)
        enew = enew + jnp.where(term, et, zero)
        e_ref[lt] = _eq(enew, e_ref.dtype)
        if want_gap:
            ea_ref[lt] = _eq(enew * (qh[0] + qh[2]), ea_ref.dtype)
        e2v = e1v
        e1v = enew
        qm2 = qm
        q1 = qh
    e1[...] = e1v
    e2[...] = e2v
    cqx[...], cqm[...], cqy[...] = q1
    cqm2[...] = qm2


def backward_bm(Et, aux, ln, lm, *, mode="nw", operator="softmax",
                want_gap=False, nm=None, dtypes=None):
    menu = _menu(dtypes)
    dxs, dms = aux
    K2, S, Bp = dxs.shape
    dtype = _cdt(Et.dtype)
    # int16 fixed-point E assumes E in [0, 1] — true only for the decode
    # seed Et=1.  This kernel also serves the training VJP, where Et is
    # an arbitrary cotangent of Vt (E = Et * marginal scales with it), so
    # the int16 knob is decode-only: it applies in decode_stream_bm, and
    # this path falls back to float storage.
    edt = dtype if _is_i16(menu.e_dtype) else (menu.e_dtype or dtype)
    T = _fit_T(T_BWD, K2, S,
               [dxs.dtype, dms.dtype, edt] + ([edt] if want_gap else []))
    B = Et.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    etp = _pad_vec(Et, Bp, dtype)
    lo = MODE_BOUNDS[mode][1]
    KB = K2 // T

    kern = functools.partial(_bwd_kernel, lo=lo, operator=operator,
                             T=T, KB=KB, want_gap=want_gap)
    blk = functools.partial(_block_spec, T, S)
    rev = lambda k: KB - 1 - k  # noqa: E731
    n_out = 2 if want_gap else 1
    out = pl.pallas_call(
        kern,
        grid=(Bp // LANE, KB),
        in_specs=[
            _len_spec(), _len_spec(), _len_spec(),
            blk(rev), blk(rev),
        ],
        out_specs=[blk(rev)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), edt)] * n_out,
        scratch_shapes=[pltpu.VMEM((S, LANE), dtype)] * 6,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, etp, dxs, dms)
    if want_gap:
        return out[0], out[1]
    return out[0], None


# ---------------------------------------------------------------------------
# adjoint forward (JVP of forward): (aux, Zt, Za) -> (vtd, (Dxd, Dmd))
# ---------------------------------------------------------------------------

def _adj_fwd_kernel(ln_ref, lm_ref, zt_ref, za_ref, dx_ref, dm_ref,
                    vtd_ref, dxd_ref, dmd_ref, vd1, vd2,
                    *, lo, operator, T, inv=None):
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
    dt = vd1v.dtype
    ddt = dxd_ref.dtype
    acc = jnp.zeros((1, LANE), vtd_ref.dtype)
    for t in range(T):
        d = k * T + t + 2
        qx, qm, _ = _q_row(operator, dx_ref[t].astype(dt),
                           dm_ref[t].astype(dt))
        zash = _deq(za_ref[t].astype(dt), inv)
        dxd = _shr(vd1v) - vd1v               # xargd - yargd (Za cancels)
        dmd = _shr(vd2v) - zash - vd1v        # margd - yargd
        dxd_ref[t] = dxd.astype(ddt)
        dmd_ref[t] = dmd.astype(ddt)
        # q is a probability vector, so the tangent recurrence telescopes:
        # qx*xargd + qm*margd + qy*yargd = yargd + qx*Dxd + qm*Dmd
        vdnew = (_deq(zt_ref[t].astype(dt), inv) + zash + vd1v
                 + qx * dxd + qm * dmd)
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vdnew.dtype)
        vdnew = jnp.where(valid, vdnew, zero)
        acc += jnp.sum(jnp.where(term, vdnew, zero), axis=0, keepdims=True)
        vd2v = vd1v
        vd1v = vdnew
    vtd_ref[...] += acc
    vd2[...] = vd2v
    vd1[...] = vd1v


def adjoint_forward_bm(aux, zt, za, ln, lm, *, mode="nw",
                       operator="softmax", nm=None, dtypes=None):
    menu = _menu(dtypes)
    dxs, dms = aux
    K2, S, Bp = dxs.shape
    Kc = zt.shape[0]          # tangent streams are compact (skew_input)
    dtype = _cdt(zt.dtype)
    ddt = menu.d_dtype or dtype
    T = _fit_T(T_AFWD, K2, S,
               [zt.dtype, za.dtype, dxs.dtype, dms.dtype, ddt, ddt])
    KBc = Kc // T
    B = ln.shape[0]
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][2]

    kern = functools.partial(_adj_fwd_kernel, lo=lo, operator=operator, T=T,
                             inv=_stream_inv(zt.dtype, menu.stream_range))
    blk = functools.partial(_block_spec, T, S)
    vtd, dxds, dmds = pl.pallas_call(
        kern,
        grid=(Bp // LANE, K2 // T),
        in_specs=[
            _len_spec(), _len_spec(),
            blk(lambda k: k % KBc), blk(lambda k: k % KBc),
            blk(lambda k: k), blk(lambda k: k),
        ],
        out_specs=[_vt_spec(), blk(lambda k: k), blk(lambda k: k)],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((K2, S, Bp), ddt),
            jax.ShapeDtypeStruct((K2, S, Bp), ddt),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, LANE), dtype),
            pltpu.VMEM((S, LANE), dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, zt, za, dxs, dms)
    return vtd[0, :B], (dxds, dmds)


# ---------------------------------------------------------------------------
# adjoint backward, recomputing Q from (Dx, Dm) and Qd from (Dxd, Dmd)
# ---------------------------------------------------------------------------

def _adj_bwd_kernel(ln_ref, lm_ref,
                    dx_ref, dm_ref, dxd_ref, dmd_ref, e_ref,
                    ed_ref, eda_ref, ed1, ed2, e1, e2,
                    cqx, cqm, cqy, cqdx, cqdm, cqdy, cqm2, cqdm2,
                    *, lo, operator, T, KB):
    """Descending adjoint recurrence with the gap adjoint fused in:
    ``EdA[r] = Ed[r]*(Qx[r]+Qy[r]) + E[r]*(Qdx[r]+Qdy[r])``.  Q[r]/Qd[r]
    are evaluated ONCE per row from its aligned in-block planes (for the
    fused EdA write) and carried one iteration for the recurrence, which
    consumes Q[r+1] and the middle components of Q[r+2]/Qd[r+2] — one
    max3 + one hessian3 per row total, same as the unfused kernel, while
    saving the standalone 6-stream gap-adjoint kernel."""
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        for ref in (ed1, ed2, e1, e2,
                    cqx, cqm, cqy, cqdx, cqdm, cqdy, cqm2, cqdm2):
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
    q1 = (cqx[...], cqm[...], cqy[...])
    qd1 = (cqdx[...], cqdm[...], cqdy[...])
    qm2 = cqm2[...]
    qdm2 = cqdm2[...]
    r0 = (KB - 1 - kk) * T
    for lt in reversed(range(T)):
        d = r0 + lt + 2
        qsh = _q_row(operator, dx_ref[lt].astype(dt),
                     dm_ref[lt].astype(dt))
        dxdh = dxd_ref[lt].astype(dt)
        qdh = smooth.hessian3(
            operator, qsh, (dxdh, dmd_ref[lt].astype(dt),
                            jnp.zeros_like(dxdh)))
        qx, qm, qy = q1
        qdx, qdm, qdy = qd1
        ednew = (_shl(qdx * e1v + qx * ed1v)
                 + _shl(qdm2 * e2v + qm2 * ed2v)
                 + qdy * e1v + qy * ed1v)
        valid, _ = _masks(iarr, d, ln, lm, lo)
        ednew = jnp.where(valid, ednew, jnp.zeros((), ednew.dtype))
        ed_ref[lt] = ednew.astype(ed_ref.dtype)
        ehere = e_ref[lt].astype(dt)
        eda_ref[lt] = (ednew * (qsh[0] + qsh[2])
                       + ehere * (qdh[0] + qdh[2])).astype(eda_ref.dtype)
        ed2v = ed1v
        ed1v = ednew
        e2v = e1v
        e1v = ehere
        qm2 = qm
        qdm2 = qdm
        q1 = qsh
        qd1 = qdh
    ed1[...] = ed1v
    ed2[...] = ed2v
    e1[...] = e1v
    e2[...] = e2v
    cqx[...], cqm[...], cqy[...] = q1
    cqdx[...], cqdm[...], cqdy[...] = qd1
    cqm2[...] = qm2
    cqdm2[...] = qdm2


def adjoint_backward_bm(Ediag, aux, adj_aux, ln, lm, *, mode="nw",
                        operator="softmax", nm=None, dtypes=None):
    menu = _menu(dtypes)
    dxs, dms = aux
    dxds, dmds = adj_aux
    K2, S, Bp = dxs.shape
    dtype = _cdt(Ediag.dtype)  # (int16 promotes to fp32 compute)
    # adjoint expectations (Ed/EdA) are unbounded, so the int16 fixed-
    # point E knob does not apply here: fp32 fallback (backward_bm's E
    # residual is likewise always float, so Ediag needs no dequant)
    edt = dtype if _is_i16(menu.e_dtype) else (menu.e_dtype or dtype)
    T = _fit_T(T_ABWD, K2, S,
               [dxs.dtype, dms.dtype, dxds.dtype, dmds.dtype,
                Ediag.dtype, edt, edt])
    lnp = _pad_vec(ln, Bp, jnp.int32)
    lmp = _pad_vec(lm, Bp, jnp.int32)
    lo = MODE_BOUNDS[mode][3]
    KB = K2 // T

    kern = functools.partial(_adj_bwd_kernel, lo=lo, operator=operator,
                             T=T, KB=KB)
    blk = functools.partial(_block_spec, T, S)
    rev = lambda k: KB - 1 - k  # noqa: E731
    Eddiag, EdA = pl.pallas_call(
        kern,
        grid=(Bp // LANE, KB),
        in_specs=[_len_spec(), _len_spec(),
                  blk(rev), blk(rev), blk(rev), blk(rev), blk(rev)],
        out_specs=[blk(rev), blk(rev)],
        out_shape=[jax.ShapeDtypeStruct((K2, S, Bp), edt)] * 2,
        scratch_shapes=[pltpu.VMEM((S, LANE), dtype)] * 12,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(lnp, lmp, dxs, dms, dxds, dmds, Ediag)
    return Eddiag, EdA


# ---------------------------------------------------------------------------
# Phase-split stream-decode kernels (triangle windowing)
#
# The padded diagonal rectangle (K2, S) holds ~2x the real N*M cells at
# square shapes: early diagonals have no high slots and late diagonals no
# low slots.  A rectangular-grid kernel cannot skip the invalid half (block
# shapes are static), but splitting the diagonal walk into P contiguous
# *phases*, each its own pallas_call with a static slot window [w0, w1)
# covering every valid slot of its rows, drops ~36% of the D/E stream
# bytes at P=8 (window widths 144..520 vs the flat 520).  Each phase
# emits its streams as a STANDALONE segment array (nk*T, w1-w0, Bp) — no
# aliasing or reassembly copies — and carries (V / E / Q boundary planes)
# flow between phases as small (S, Bp) arrays.  The traceback walks the
# segmented E on host (dp.traceback_stream).  Decode-path only: the
# training path keeps the monolithic kernels (its unskew consumers need
# one dense stream).
# ---------------------------------------------------------------------------

DECODE_PHASES = int(_os.environ.get("DEEPBLAST_DECODE_PHASES", 8))


def _phase_plan(K2, S, T, Kc, P=None):
    """Static plan [(k0, nk, w0, w1), ...] splitting the K2//T diagonal
    blocks into up to P phases with per-phase valid-slot windows.

    Layout contract (dp.py stream_cell: 0-based cell (i, j) lives at
    row r = i+j, slot s = i+1, so j = r-s+1): row r's valid slots are
    ``s in [max(1, r+2-lm), min(ln, r+1)]``.  With lengths bounded by the
    padded dims (lm <= Mp = Kc, ln <= Np = S-8), phase rows [r0, r1)
    need the slot window ``[max(1, r0+2-Mp), min(Np, r1-1+1)]`` — the
    low bound is widest at the phase's first row, the high bound at its
    last.  Windows round outward to 16-slot alignment."""
    P = P or DECODE_PHASES
    Np, Mp = S - 8, Kc
    KB = K2 // T
    P = max(1, min(P, KB))
    bounds = [KB * p // P for p in range(P + 1)]
    plan = []
    for p in range(P):
        k0, k1 = bounds[p], bounds[p + 1]
        if k1 <= k0:
            continue
        r0, r1 = k0 * T, k1 * T
        lo = max(0, r0 + 2 - Mp)
        hi = min(Np, r1) + 1
        w0 = (lo // 16) * 16
        w1 = min(-(-hi // 16) * 16, S)
        w1 = max(w1, min(w0 + 16, S))
        plan.append((k0, k1 - k0, w0, w1))
    return plan


def _place(v, lo_pad, hi_pad):
    """Zero-extend a window plane (W, LANE) back to full S sublanes."""
    parts = []
    if lo_pad:
        parts.append(jnp.zeros((lo_pad, v.shape[1]), v.dtype))
    parts.append(v)
    if hi_pad:
        parts.append(jnp.zeros((hi_pad, v.shape[1]), v.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _carry_spec(S):
    return pl.BlockSpec((S, LANE), lambda b, k: (_i32(0), b),
                        memory_space=pltpu.VMEM)


def _fwd_phase_kernel(ln_ref, lm_ref, vt_in, v1_in, v2_in, th_ref, ad_ref,
                      vt_ref, dx_ref, dm_ref, v1_ref, v2_ref,
                      *, lo, operator, T, k0, w0, w1, inv=None):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        vt_ref[...] = vt_in[...]
        v1_ref[...] = v1_in[...]
        v2_ref[...] = v2_in[...]

    S = v1_ref.shape[0]
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    ln = ln_ref[...]
    lm = lm_ref[...]
    v1v = v1_ref[...]
    v2v = v2_ref[...]
    dt = v1v.dtype
    ddt = dx_ref.dtype
    acc = jnp.zeros((1, LANE), vt_ref.dtype)
    for t in range(T):
        d = (k0 + kk) * T + t + 2
        # inputs arrive as (T, W, LANE) Element-indexed windows of the
        # compact stream — zero-extend to full S (the zeros only touch
        # slots the valid mask kills anyway)
        ash = _place(_deq(ad_ref[t].astype(dt), inv), w0, S - w1)
        thw = _place(_deq(th_ref[t].astype(dt), inv), w0, S - w1)
        dx = _shr(v1v) - v1v
        dm = _shr(v2v) - ash - v1v
        dx_ref[t] = dx[w0:w1].astype(ddt)
        dm_ref[t] = dm[w0:w1].astype(ddt)
        rel, _ = smooth.max3(operator, dx, dm, jnp.zeros_like(dx))
        vnew = thw + ash + v1v + rel
        valid, term = _masks(iarr, d, ln, lm, lo)
        zero = jnp.zeros((), vnew.dtype)
        vnew = jnp.where(valid, vnew, zero)
        acc += jnp.sum(jnp.where(term, vnew, zero), axis=0, keepdims=True)
        v2v = v1v
        v1v = vnew
    vt_ref[...] += acc
    v2_ref[...] = v2v
    v1_ref[...] = v1v


def _bwd_phase_kernel(ln_ref, lm_ref, et_ref,
                      e1_in, e2_in, qx_in, qm_in, qy_in, qm2_in,
                      dx_ref, dm_ref,
                      e_ref, e1_ref, e2_ref, qx_ref, qm_ref, qy_ref, qm2_ref,
                      *, lo, operator, T, k0, nk, w0, w1):
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
    r0 = (k0 + nk - 1 - kk) * T
    for lt in reversed(range(T)):
        d = r0 + lt + 2
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
        e2v = e1v
        e1v = enew
        qm2 = qm
        q1 = qh
    e1_ref[...] = e1v
    e2_ref[...] = e2v
    qx_ref[...], qm_ref[...], qy_ref[...] = q1
    qm2_ref[...] = qm2


def decode_stream_bm(theta, A, ln, lm, Et, *, mode="nw", operator="softmax",
                     dtypes=None):
    """Phase-split stream decode: skew -> phased forward -> phased
    backward, returning the expected alignment as windowed segments
    ``{"seg": (per-phase arrays), "row0": (P,), "w0": (P,)}`` for
    :func:`deepblast_tpu.ops.dp.traceback_stream`.  Inference-only.

    With ``E_DTYPE=int16`` the segments store fixed point at scale
    32767, assuming the decode seed ``Et in [0, 1]`` (the default seed
    is 1; values beyond saturate).  This is the only path where the
    int16 E knob applies — the training VJP's E residual is always
    float because its ``Et`` is an arbitrary cotangent."""
    menu = _menu(dtypes)
    th, ad = skew_input_pair(theta, A, dtypes=menu)
    Kc, S, Bp = th.shape
    K2 = _unfold_dims(th)
    dtype = _cdt(th.dtype)
    ddt = menu.d_dtype or dtype
    edt = menu.e_dtype or dtype
    T = min(_fit_T(T_FWD, K2, S, [th.dtype, ad.dtype, ddt, ddt]),
            _fit_T(T_BWD, K2, S, [ddt, ddt, edt, dtype, dtype, dtype]))
    KBc = Kc // T
    plan = _phase_plan(K2, S, T, Kc)
    B = ln.shape[0]
    lnp = _pad_vec(jnp.asarray(ln, jnp.int32), Bp, jnp.int32)
    lmp = _pad_vec(jnp.asarray(lm, jnp.int32), Bp, jnp.int32)
    etp = _pad_vec(Et, Bp, dtype)
    lo_f = MODE_BOUNDS[mode][0]
    lo_b = MODE_BOUNDS[mode][1]
    cz = jnp.zeros((S, Bp), dtype)

    # forward, phases ascending
    vt = jnp.zeros((8, Bp), dtype)
    v1, v2 = cz, cz
    dxs, dms = [], []
    for (k0, nk, w0, w1) in plan:
        W = w1 - w0
        kern = functools.partial(_fwd_phase_kernel, lo=lo_f,
                                 operator=operator, T=T, k0=k0,
                                 w0=w0, w1=w1,
                                 inv=_stream_inv(th.dtype,
                                                 menu.stream_range))
        seg = functools.partial(_block_spec, T, W)
        # Element-indexed input windows: each phase only reads its static
        # valid-slot window [w0, w1) of the compact input rows (~36% fewer
        # input bytes at square shapes).  Only the W-dim offset w0 is a
        # per-call constant; the row offset ((k0+k)%KBc)*T and the lane
        # offset b*LANE vary with the grid step (k-varying Element offsets
        # — confirmed compile+exact on chip, scripts/probe_dynamic_element.py
        # round 3; kept in onchip_validate.sh as a toolchain-bump canary).
        # jax>=0.9 requires every dim of an element_window block to be
        # Element — index maps then return *element* offsets for all dims.
        inw = pl.BlockSpec(
            (pl.Element(T), pl.Element(W), pl.Element(LANE)),
            lambda b, k, k0=k0, w0=w0: (
                _i32(((k0 + k) % KBc) * T), _i32(w0), b * LANE),
            memory_space=pltpu.VMEM)
        vt, dxseg, dmseg, v1, v2 = pl.pallas_call(
            kern,
            grid=(Bp // LANE, nk),
            in_specs=[
                _len_spec(), _len_spec(),
                _vt_spec(), _carry_spec(S), _carry_spec(S),
                inw, inw,
            ],
            out_specs=[_vt_spec(), seg(lambda k: k), seg(lambda k: k),
                       _carry_spec(S), _carry_spec(S)],
            out_shape=[
                jax.ShapeDtypeStruct((8, Bp), dtype),
                jax.ShapeDtypeStruct((nk * T, W, Bp), ddt),
                jax.ShapeDtypeStruct((nk * T, W, Bp), ddt),
                jax.ShapeDtypeStruct((S, Bp), dtype),
                jax.ShapeDtypeStruct((S, Bp), dtype),
            ],
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(lnp, lmp, vt, v1, v2, th, ad)
        dxs.append(dxseg)
        dms.append(dmseg)

    # backward, phases descending
    e1 = e2 = qx = qm = qy = qm2 = cz
    esegs = [None] * len(plan)
    for p in reversed(range(len(plan))):
        k0, nk, w0, w1 = plan[p]
        W = w1 - w0
        kern = functools.partial(_bwd_phase_kernel, lo=lo_b,
                                 operator=operator, T=T, k0=k0, nk=nk,
                                 w0=w0, w1=w1)
        seg = functools.partial(_block_spec, T, W)
        rev = lambda k, nk=nk: nk - 1 - k  # noqa: E731
        eseg, e1, e2, qx, qm, qy, qm2 = pl.pallas_call(
            kern,
            grid=(Bp // LANE, nk),
            in_specs=[
                _len_spec(), _len_spec(), _len_spec(),
                _carry_spec(S), _carry_spec(S), _carry_spec(S),
                _carry_spec(S), _carry_spec(S), _carry_spec(S),
                seg(rev), seg(rev),
            ],
            out_specs=[seg(rev)] + [_carry_spec(S)] * 6,
            out_shape=[jax.ShapeDtypeStruct((nk * T, W, Bp), edt)]
            + [jax.ShapeDtypeStruct((S, Bp), dtype)] * 6,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(lnp, lmp, etp, e1, e2, qx, qm, qy, qm2, dxs[p], dms[p])
        esegs[p] = eseg

    return {
        "seg": tuple(esegs),
        "row0": jnp.asarray([k0 * T for (k0, _, _, _) in plan], jnp.int32),
        "w0": jnp.asarray([w0 for (_, _, w0, _) in plan], jnp.int32),
    }


def _stream_accessor(s, N, M):
    """Host-side cell accessor for both the dense batch-minor E stream and
    the phase-segmented decode output."""
    import numpy as np

    def _host(x):
        x = np.asarray(x)
        if x.dtype == np.int16:   # fixed-point E (see _E_SCALE)
            return x.astype(np.float32) * np.float32(1.0 / _E_SCALE)
        return x

    if isinstance(s, dict):
        segs = [_host(x) for x in s["seg"]]
        row0 = np.asarray(s["row0"])
        w0 = np.asarray(s["w0"])

        def get(b, i, j):
            r = i + j
            p = int(np.searchsorted(row0, r, side="right")) - 1
            return float(segs[p][r - row0[p], i + 1 - w0[p], b])
        return get
    sd = _host(s)
    return lambda b, i, j: float(sd[i + j, i + 1, b])


def _train_fns():
    """The four training-pass kernels: phase-split (round 5 default) or
    monolithic, selected by ``DEEPBLAST_TRAIN_PHASES`` (0 = monolithic).
    ``za_none`` advertises that adjoint_forward accepts ``za=None`` (zero
    gap cotangent — the dispatcher then skips the Za skew + stream
    entirely on the training decode path)."""
    from deepblast_tpu.ops import dp_bm_train as _t
    if _t.TRAIN_PHASES > 0:
        return {
            "forward": _t.forward_bm_phased,
            "backward": _t.backward_bm_phased,
            "adjoint_forward": _t.adjoint_forward_bm_phased,
            "adjoint_backward": _t.adjoint_backward_bm_phased,
            "za_none": True,
        }
    return {
        "forward": forward_bm,
        "backward": backward_bm,
        "adjoint_forward": adjoint_forward_bm,
        "adjoint_backward": adjoint_backward_bm,
        "za_none": False,
    }


def _with_dtypes(menu):
    """Backend-registry factory: rebind every dtype-sensitive function to
    a per-call :class:`DTypeMenu` (see ops.dp._resolve_backend — only the
    keys present in the registered dict are actually overridden, so env
    gates / runtime pops of ``decode_stream`` stay effective)."""
    menu = _menu(menu)
    bind = functools.partial(functools.partial, dtypes=menu)
    fns = _train_fns()
    return {
        "skew": bind(skew_input),
        "skew_pair": bind(skew_input_pair),
        "skew_ct": bind(skew_cotangent),
        "skew_ct_pair": bind(skew_cotangent_pair),
        "forward": bind(fns["forward"]),
        "forward_score": bind(forward_score_bm),
        "backward": bind(fns["backward"]),
        "adjoint_forward": bind(fns["adjoint_forward"]),
        "adjoint_backward": bind(fns["adjoint_backward"]),
        "decode_stream": bind(decode_stream_bm),
        # keep the za=None capability flag in lockstep with the freshly
        # resolved train fns: a runtime TRAIN_PHASES flip (probes) would
        # otherwise pair the import-time za_none=True with the monolithic
        # adjoint_forward, which requires a real Za stream
        "za_none": fns.get("za_none", False),
    }


def register(make_default=None):
    """Register the batch-minor pallas backend with the DP dispatcher."""
    from deepblast_tpu.ops import dp
    if make_default is None:
        # jax.default_backend() *raises* when the configured platform
        # cannot initialize (e.g. the axon tunnel is down); the package
        # must still import for host-only work (parsers, traceback, ...)
        try:
            make_default = jax.default_backend() == "tpu"
        except RuntimeError:
            make_default = False
    fns = _train_fns()
    dp.register_backend("pallas_bm", {
        "skew": skew_input,
        "skew_pair": skew_input_pair,
        "skew_ct": skew_cotangent,
        "skew_ct_pair": skew_cotangent_pair,
        "unskew": unskew_output,
        "forward": fns["forward"],
        "forward_score": forward_score_bm,
        "backward": fns["backward"],
        "adjoint_forward": fns["adjoint_forward"],
        "adjoint_backward": fns["adjoint_backward"],
        "za_none": fns["za_none"],
        # host accessor into the batch-minor E stream (skew_bm contract
        # stream[d, s, b] = E[b, s-1, d+1-s]): cell (i, j) -> [i+j, i+1, b]
        "stream_cell": lambda s, b, i, j: s[i + j, i + 1, b],
        # affine view for the native C walk: flat offset of cell (i, j) is
        # (i+j)*S*Bp + (i+1)*Bp + b = i*(S*Bp+Bp) + j*S*Bp + (Bp+b)
        "stream_affine": lambda s, b: (
            _np.ascontiguousarray(s).reshape(-1)[s.shape[2] + b:],
            (s.shape[1] + 1) * s.shape[2], s.shape[1] * s.shape[2]),
        # phase-split decode (triangle windowing) + segmented accessor;
        # DEEPBLAST_DECODE_STREAM=0 falls back to the monolithic kernels
        **({"decode_stream": decode_stream_bm}
           if _os.environ.get("DEEPBLAST_DECODE_STREAM", "1") != "0" else {}),
        "stream_accessor": _stream_accessor,
        "with_dtypes": _with_dtypes,
    }, make_default=make_default)
