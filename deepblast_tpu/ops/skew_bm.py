"""Batch-minor (lane = batch) diagonal relayout kernels.

Round-2 layout redesign (docs/PERF_NOTES.md "Next (ranked; round 2)" #1).
The round-1 streams ``(K, Bp, L)`` put the DP slot on lanes, forcing
``N+1 -> L`` lane padding (25% at N=512) and per-lane shears in the
relayouts.  Here streams are ``(K2, S, Bp)`` — slot on *sublanes*
(``S = Np + 8``, 1.5% padding), batch on lanes — so

* the relayout shear becomes at most one cyclic ``pltpu.roll`` per slot
  (amount ``s-1``, traced), instead of ``log2(N)`` masked roll passes over
  the whole stream;
* the DP kernels' slot shifts become cheap static sublane shifts;
* stream traffic drops ~20% at the bench config.

Layout contract (slot shift 1, matching :mod:`deepblast_tpu.ops.skew`
transposed):

    stream[d, s, b] = x[b, s-1, d+1-s]   for 1 <= s <= N, 0 <= d+1-s < M

i.e. DP cell ``(i, j)`` (1-based) lives on diagonal row ``d = i+j-2`` at
sublane ``s = i``, lane ``b``.  Slot 0 (the ``i = 0`` DP boundary) and all
padding slots/rows may hold finite garbage: every consumer masks by the
valid region (same argument as dp_pallas.MASK_Q).

Kernel structure (skew): grid ``(Bp/128, S/8)`` with the slot axis inner
and sequential.  Each step reads the aligned x row-chunk ``[8g, 8g+8)``
for 128 pairs, transposes each row-plane ``(128, M) -> (M, 128)``, pads to
``(K2, 128)`` and rolls it down by its slot's diagonal offset ``s - 1``.
Slot ``8g`` needs x row ``8g-1`` — the last row of the *previous* chunk —
which is carried across steps in a VMEM scratch plane (zeros at ``g = 0``,
which correctly zeroes slot 0).

Kernel structure (unskew): the inverse walk, slot chunks descending.  Out
rows ``r0..r0+7`` need slots ``r0+1..r0+8``: seven planes from the aligned
chunk plus slot ``r0+8`` carried from the previously-processed (higher)
chunk.  The highest real slot ``Np`` is passed as a pre-sliced side strip
so the grid has exactly ``Np/8`` steps and every output block is written
once (no block revisits).  The output is written through a free
``(Bp, Np*Mp)`` 2-D view whose ``(128, 8*Mp)`` blocks take plain
lane-offset stores.

Replaces skew_pallas/unskew_pallas (round 1) for the batch-minor backend.
Reference being re-engineered: the data staging around
deepblast/nw_cuda.py:46-79 (which needs no relayout only because each CUDA
thread walks serially — the price is one thread per pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["skew_bm", "skew_bm_pair", "unskew_bm", "bm_dims"]

LANE = 128
CH = 8  # slot chunk = sublane quantum; BlockSpec middle dims require 8

# Assembly strategy for the (K2, 8, 128) stream blocks, chosen by on-chip
# measurement (scripts/profile_bm.py; override: DEEPBLAST_SKEW_STRATEGY):
#   "store"  — per-slot 2D roll + middle-index store o_ref[:, t, :]
#   "stack"  — per-slot 2D roll, jnp.stack(axis=1), whole-block store
#   "auto"   — store for fp32, stack for 16-bit outputs: a (K2, 1, 128)
#              bf16 store covers half a (16, 128) tile, so per-plane
#              stores degrade to read-modify-write (measured 2.52 ms vs
#              1.03 ms at the bench shape)
import os as _os  # noqa: E402

STRATEGY = _os.environ.get("DEEPBLAST_SKEW_STRATEGY", "auto")


def _strategy(odt):
    if STRATEGY != "auto":
        return STRATEGY
    return "stack" if jnp.dtype(odt).itemsize < 4 else "store"

# The "~16 MB VMEM" ceiling probed in round 1 was the compiler's *scoped*
# vmem soft limit, not physical VMEM (v5e has 128 MiB/core): raise it so
# fp32 roll buffers + bf16 stream blocks fit comfortably.
VMEM_LIMIT = int(_os.environ.get("DEEPBLAST_VMEM_LIMIT", 64 * 2**20))


def _params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=VMEM_LIMIT)


def _ru(x, m):
    return -(-x // m) * m


def bm_dims(N, M):
    """Padded dims shared by both relayouts and the DP kernels:
    (Np, Mp, S, K2)."""
    Np = _ru(N, CH)
    Mp = _ru(M, 16)  # unskew out block lane dim 8*Mp must be 128-divisible
    S = Np + CH      # slots 0..Np, rounded up
    K2 = _ru(Np + Mp - 1, 8)
    return Np, Mp, S, K2


def _interpret():
    return jax.default_backend() != "tpu"


def _roll(x, shift, axis):
    if _interpret():
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift, axis)


# ---------------------------------------------------------------------------
# skew: (B, N, M) -> (K2, S, Bp)
# ---------------------------------------------------------------------------

def _emit_stream(xb, o_ref, carry, *, base, KH, M, dtype, scale):
    """Shear one ``(128, CH, M)`` input block into its ``(KH, CH, 128)``
    stream block (shared by the single- and pair-skew kernels).

    Rolls run in the input dtype — traced pltpu.roll on bf16 crashes
    this toolchain's compiler (probed) — and the store casts to o_ref."""
    odt = o_ref.dtype
    prev = carry[...]                                 # (M, 128)
    z = jnp.zeros((KH - M, LANE), dtype) if KH > M else None

    def rolled_plane(t, plane):
        buf = plane if z is None else jnp.concatenate([plane, z], axis=0)
        r = _roll(buf, (base + t) % KH, 0)                # (KH, 128)
        if scale is not None:
            # int16 fixed-point quantization: clip + round-half-up.  The
            # roll runs fp32 (16-bit rolls crash this toolchain — probed)
            # and the quantize/cast happens at the store, like the bf16
            # path.  floor(x+0.5) rather than rint: plain floor is the
            # conservatively-supported rounding primitive in Mosaic.
            r = jnp.floor(jnp.clip(r * scale, -32767.0, 32767.0) + 0.5)
        return r.astype(odt)

    planes = [prev] + [jnp.swapaxes(xb[:, t, :], 0, 1) for t in range(CH - 1)]
    carry[...] = jnp.swapaxes(xb[:, CH - 1, :], 0, 1)
    if _strategy(odt) == "stack":
        o_ref[...] = jnp.stack(
            [rolled_plane(t, p) for t, p in enumerate(planes)], axis=1)
    else:
        for t, p in enumerate(planes):
            o_ref[:, t, :] = rolled_plane(t, p)


def _skew_kernel(x_ref, o_ref, carry, *, KH, M, dtype, scale=None):
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    base = (g * CH + KH - 1) % KH                     # (CH*g - 1) mod KH
    _emit_stream(x_ref[...], o_ref, carry,
                 base=base, KH=KH, M=M, dtype=dtype, scale=scale)


def _skew_pair_kernel(x_ref, y_ref, ox_ref, oy_ref, cx, cy, *,
                      KH, M, dtype, scale=None):
    """Fused dual skew: both potentials (theta, A) sheared in ONE kernel.

    Motivation (docs/PERF_NOTES.md round 3, probe_fwd_i16): two
    back-to-back single-skew pallas_calls measure *worse* than the sum
    of their standalone times (2.33 vs 0.76 ms for the int16 stores) —
    XLA schedules them serially with no DMA overlap between the second
    call's input fetch and the first's compute.  One kernel with two
    in/out refs keeps the same bytes but lets the pipeline overlap the
    two streams and halves the grid/dispatch overhead.

    Measured on chip (probe_skew_pair, round 3): bit-exact vs singles
    under every menu; standalone fused wins at the mins (fp32 1.19 vs
    1.49 ms) but shows NO end-to-end decode win (and the fused decode
    never reached the fast timing window in 6 interleaved rounds), so
    the fused form is opt-in (``DEEPBLAST_SKEW_PAIR=1``)."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        cx[...] = jnp.zeros_like(cx)
        cy[...] = jnp.zeros_like(cy)

    base = (g * CH + KH - 1) % KH
    _emit_stream(x_ref[...], ox_ref, cx,
                 base=base, KH=KH, M=M, dtype=dtype, scale=scale)
    _emit_stream(y_ref[...], oy_ref, cy,
                 base=base, KH=KH, M=M, dtype=dtype, scale=scale)


def skew_bm(x, Bp=None, out_dtype=None, compact=False, quant_scale=None):
    """Batch-minor diagonal relayout ``(B, N, M) -> (K2, S, Bp)``.

    ``out_dtype`` selects the stream storage dtype (bf16 halves the HBM
    write + every downstream DP-kernel read).  The shear rolls run in the
    *input* dtype — traced pltpu.roll on bf16 crashes this toolchain's
    compiler (probed) — and the store casts.  With ``quant_scale`` (a
    static float, used with ``out_dtype=int16``) the store quantizes to
    fixed point: ``round(clip(x*scale, ±32767))`` — consumers multiply
    loads by ``1/scale`` (see dp_bm.STREAM_RANGE).

    ``compact=True`` folds the stream rows mod ``Mp`` into ``(Mp, S, Bp)``
    — halving the write at square shapes.  Diagonals ``d`` and ``d + Mp``
    have *disjoint* slot windows (``s <= d+1`` vs ``s >= d+2`` whenever
    ``Mp >= M``), so the fold is collision-free; consumers index row
    ``d mod Mp`` and, as ever, must mask to the valid region (the foreign
    diagonal's cells are the "finite garbage" of the layout contract).
    The fold is cyclic-roll-native: rolling the M data rows by ``s-1``
    mod ``Mp`` IS the mod-``Mp`` fold of the mod-``K2`` roll.
    """
    B, N, M = x.shape
    Np, Mp, S, K2 = bm_dims(N, M)
    KH = Mp if compact else K2
    odt = out_dtype or x.dtype
    if Bp is None:
        Bp = _ru(B, LANE)
    if (B, N) != (Bp, Np):
        x = jnp.pad(x, ((0, Bp - B), (0, Np - N), (0, 0)))
    kern = functools.partial(_skew_kernel, KH=KH, M=M, dtype=x.dtype,
                             scale=quant_scale)
    nx = Np // CH
    return pl.pallas_call(
        kern,
        grid=(Bp // LANE, S // CH),
        in_specs=[pl.BlockSpec(
            (LANE, CH, M),
            lambda gb, g: (gb, jnp.minimum(g, nx - 1), 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (KH, CH, LANE), lambda gb, g: (0, g, gb),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KH, S, Bp), odt),
        scratch_shapes=[pltpu.VMEM((M, LANE), x.dtype)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(x)


def skew_bm_pair(x, y, Bp=None, out_dtype=None, compact=False,
                 quant_scale=None):
    """Fused dual relayout: ``skew_bm(x), skew_bm(y)`` in one pallas_call
    (same layout/dtype contract for both operands; see
    :func:`_skew_pair_kernel` for why fusing beats two calls)."""
    if x.shape != y.shape:
        raise ValueError(f"pair shapes differ: {x.shape} vs {y.shape}")
    if x.dtype != y.dtype:
        # the kernel rolls y in x.dtype and the output dtype defaults to
        # x.dtype — a silent cast would diverge from two skew_bm calls
        raise ValueError(f"pair dtypes differ: {x.dtype} vs {y.dtype}")
    B, N, M = x.shape
    Np, Mp, S, K2 = bm_dims(N, M)
    KH = Mp if compact else K2
    odt = out_dtype or x.dtype
    if Bp is None:
        Bp = _ru(B, LANE)
    if (B, N) != (Bp, Np):
        pad = ((0, Bp - B), (0, Np - N), (0, 0))
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
    kern = functools.partial(_skew_pair_kernel, KH=KH, M=M, dtype=x.dtype,
                             scale=quant_scale)
    nx = Np // CH
    in_spec = pl.BlockSpec(
        (LANE, CH, M),
        lambda gb, g: (gb, jnp.minimum(g, nx - 1), 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (KH, CH, LANE), lambda gb, g: (0, g, gb),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(Bp // LANE, S // CH),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((KH, S, Bp), odt)] * 2,
        scratch_shapes=[pltpu.VMEM((M, LANE), x.dtype)] * 2,
        compiler_params=_params(),
        interpret=_interpret(),
    )(x, y)


# ---------------------------------------------------------------------------
# unskew: (K2, S, Bp) -> (B, N, M)
# ---------------------------------------------------------------------------

def _unskew_kernel(s_ref, side_ref, o_ref, carry, *, K2, Np, Mp, ng):
    g = pl.program_id(1)
    c = ng - 1 - g                                    # descending slot chunk
    odt = o_ref.dtype
    cdt = carry.dtype

    @pl.when(g == 0)
    def _():
        # P-form plane of the top slot Np (static roll amount); cast
        # before the roll — rolls on bf16 crash this compiler (probed)
        amt = (K2 - (Np - 1)) % K2
        carry[...] = _roll(side_ref[...].astype(cdt), amt, 0)[:Mp]

    sb = s_ref[...].astype(cdt)                       # (K2, CH, 128)
    carried = carry[...]                              # (Mp, 128), slot CH*c+CH
    base = (K2 + 1 - CH * c) % K2                     # K2 - (CH*c - 1)

    def plane(t):
        amt = (base + (K2 - t)) % K2                  # K2 - (CH*c + t - 1)
        return _roll(sb[:, t, :], amt, 0)[:Mp]        # (Mp, 128)

    # out rows r = CH*c + u <- slot CH*c+u+1: u<CH-1 from this chunk,
    # u = CH-1 from the carry
    for u in range(CH - 1):
        o_ref[:, u * Mp:(u + 1) * Mp] = \
            jnp.swapaxes(plane(u + 1), 0, 1).astype(odt)
    o_ref[:, (CH - 1) * Mp:CH * Mp] = \
        jnp.swapaxes(carried, 0, 1).astype(odt)
    carry[...] = plane(0)


def unskew_bm(s, N, M, B, out_dtype=None):
    """Inverse batch-minor relayout: ``out[b, r, c] = s[r+c, r+1, b]``,
    returning the first ``B`` pairs (cast to ``out_dtype`` in-kernel)."""
    K2, S, Bp = s.shape
    Np, Mp, S2, K2b = bm_dims(N, M)
    if (S, K2) != (S2, K2b):
        raise ValueError(f"stream dims {s.shape} do not match bm_dims"
                         f"({N}, {M}) = {(K2b, S2)}")
    odt = out_dtype or s.dtype
    ng = Np // CH
    side = s[:, Np, :]                                # (K2, Bp)
    kern = functools.partial(_unskew_kernel, K2=K2, Np=Np, Mp=Mp, ng=ng)
    out = pl.pallas_call(
        kern,
        grid=(Bp // LANE, ng),
        in_specs=[
            pl.BlockSpec((K2, CH, LANE),
                         lambda gb, g: (0, ng - 1 - g, gb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, LANE), lambda gb, g: (0, gb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (LANE, CH * Mp), lambda gb, g: (gb, ng - 1 - g),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Np * Mp), odt),
        scratch_shapes=[pltpu.VMEM(
            (Mp, LANE), jnp.promote_types(s.dtype, jnp.float32))],
        compiler_params=_params(),
        interpret=_interpret(),
    )(s, side)
    out = out.reshape(Bp, Np, Mp)
    if (Bp, Np, Mp) != (B, N, M):
        out = out[:B, :N, :M]
    return out
