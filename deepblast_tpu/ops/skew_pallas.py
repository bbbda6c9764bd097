"""Pallas TPU kernels for the anti-diagonal (skew) relayouts.

The wavefront DP kernels (:mod:`deepblast_tpu.ops.dp_pallas`) stream
diagonal-major buffers ``(K, Bp, L)``.  The XLA pad/reshape/transpose skew
(:mod:`deepblast_tpu.ops.skew`) is correct everywhere but slow on TPU: the
transposes move the minor dimension and run at ~80 GB/s, costing more than
the DP kernels themselves (see docs/PERF_NOTES.md finding 2).

These kernels perform the same permutation as a *shear*: per-batch, the
``(N, M)`` plane is transposed once in VMEM and then each lane ``s`` is
circularly rolled along sublanes by a lane-dependent amount.  The
per-lane roll decomposes into ``ceil(log2)`` static cyclic
``pltpu.roll`` + select steps (there is no negative/strided-descending
roll on this Mosaic toolchain, but cyclic rolls by ``K - 2^t`` express
the inverse shear with positive static amounts).

Layout contract (matches ``_pad_skew(skew(x), Bp, L, 1)``):

    out[d, b, s] = x[b, s-1, d-s+1]   for 1 <= s <= N, 0 <= d-s+1 < M

i.e. slot ``s`` on diagonal row ``d`` holds DP cell ``(i, j) = (s, d+2-s)``
in 1-based DP coordinates.  The inverse (``unskew_pallas``) reads slot
``r+1`` of diagonal row ``r+c``:

    E[b, r, c] = s[r+c, b, r+1]

Cyclic-wrap safety: every consumed index satisfies ``p + s - 1 <= K - 1``
(``max (M-1) + (N+1) - 1 = N + M - 1 = K``... with ``s <= N`` the bound is
``K - 1``), so rolls modulo ``K`` never alias valid cells; lanes above the
decomposed bit-width receive partially-sheared garbage but are never read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["skew_pallas", "unskew_pallas"]

LANE = 128


def _interpret():
    return jax.default_backend() != "tpu"


def _roll(x, shift, axis):
    if _interpret():
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift, axis)


def _shear_down(x, nbits):
    """out[p, s] = x[(p - s) % K, s] for lanes s < 2**nbits."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for t in range(nbits):
        amt = 1 << t
        x = jnp.where((lane & amt) != 0, _roll(x, amt, 0), x)
    return x


def _shear_up_m1(x, nbits):
    """out[p, s] = x[(p + s - 1) % K, s] for lanes 1 <= s <= 2**nbits.

    The ``-1`` slot offset is folded into the decomposition by keying the
    bit masks on ``s - 1`` (lane 0 gets all bits via the -1 wraparound and
    produces garbage, but slot 0 is never consumed), saving the tenth pass
    and the follow-up roll of the plain ``p + s`` shear."""
    K = x.shape[0]
    lanem1 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) - 1
    for t in range(nbits):
        amt = 1 << t
        x = jnp.where((lanem1 & amt) != 0, _roll(x, K - amt, 0), x)
    return x


# ---------------------------------------------------------------------------
# skew: (B, N, M) -> (K, Bp, L)
# ---------------------------------------------------------------------------

def _skew_kernel(x_ref, out_ref, *, N, M, L, Kr, B):
    b = pl.program_id(0)
    x = x_ref[0]                                    # (N, M)
    t = jnp.swapaxes(x, 0, 1)                       # (M, N): t[j, i]
    buf = jnp.pad(t, ((0, Kr - M), (0, L - N)))     # (Kr, L)
    w = _shear_down(buf, max(1, (N - 1).bit_length()))
    w = _roll(w, 1, 1)                              # slot s = i + 1
    out_ref[...] = jnp.where(b < B, w, jnp.zeros((), w.dtype))


def skew_pallas(x, Bp, L=None, rows=None):
    """Diagonal-major relayout ``(B, N, M) -> (rows, Bp, L)`` with slot
    shift 1 (``rows >= K = N + M - 1``; extra rows are zero).

    Replaces ``_pad_skew(skew(x), Bp, L, 1)`` (both the XLA skew and the pad)
    with one shear kernel.  ``Bp >= B``; padded pairs are written as zeros.
    """
    B, N, M = x.shape
    K = N + M - 1
    Kr = K if rows is None else rows
    if L is None:
        L = -(-(N + 1) // LANE) * LANE
    kern = functools.partial(_skew_kernel, N=N, M=M, L=L, Kr=Kr, B=B)
    out = pl.pallas_call(
        kern,
        grid=(Bp,),
        in_specs=[pl.BlockSpec((1, N, M), lambda b: (jnp.minimum(b, B - 1), 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Kr, L), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kr, Bp * L), x.dtype),
        interpret=_interpret(),
    )(x)
    return out.reshape(Kr, Bp, L)


# ---------------------------------------------------------------------------
# unskew: (K, Bp, L) [diag buffers] -> (B, N, M)
# ---------------------------------------------------------------------------

def _unskew_kernel(s_ref, out_ref, *, N, M, L, K):
    u = s_ref[...]                                  # (K, L)
    w = _shear_up_m1(u, max(1, (N - 1).bit_length()))   # w[p,s] = u[p+s-1]
    t = jnp.swapaxes(w, 0, 1)                       # (L, K): t[s,p]
    t = _roll(t, L - 1, 0)                          # t[q,p] = t0[q+1,p]
    out_ref[0] = t[:N, :M]


def unskew_pallas(s, N, M, B, mul=None):
    """Inverse skew for slot-shift-1 diagonal buffers: ``out[b, r, c] =
    s[r+c, b, r+1]``, returning only the first ``B`` pairs.

    ``mul``: optional tuple of same-shape diagonal buffers;
    ``s * sum(mul)`` is applied before the relayout (XLA elementwise — an
    in-kernel fusion at fp32 would exceed the ~16 MB VMEM budget).
    """
    K, Bp, L = s.shape
    if mul:
        q = mul[0][:K].astype(s.dtype)  # mul may carry unroll-pad rows
        for m in mul[1:]:
            q = q + m[:K].astype(s.dtype)
        s = s * q
    kern = functools.partial(_unskew_kernel, N=N, M=M, L=L, K=K)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((K, L), lambda b: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, M), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, M), s.dtype),
        interpret=_interpret(),
    )(s.reshape(K, Bp * L))
    return out
