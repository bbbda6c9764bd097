"""Anti-diagonal ("skewed") layout transforms for wavefront DP.

The alignment recursion has a dependency structure where every cell ``(i, j)``
depends on ``(i-1, j)``, ``(i, j-1)`` and ``(i-1, j-1)`` — so all cells on an
anti-diagonal ``k = i + j`` are independent and can be computed as one vector
operation.  On TPU we therefore re-lay the ``(B, N, M)`` potential matrices
into *diagonal-major* form ``(K, B, N)`` with ``K = N + M - 1`` where row
``d`` holds anti-diagonal ``d``:

    skewed[d, b, i] = x[b, i, d - i]        (0 <= d - i < M)

Out-of-range entries are zero.  A `lax.scan` (or a Pallas grid) then walks the
leading diagonal axis, and every step is a dense ``(B, N)`` VPU operation
with unit-stride lane access — the TPU analogue of the reference CUDA
kernel's per-thread serial loop (reference: deepblast/nw_cuda.py:46-79), but
with ``B x N``-way parallelism per step instead of ``B``-way.

This is the "wavefront" layout promised in SURVEY.md §5.7 / §7 stage 3.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["skew", "unskew", "num_diagonals"]


def num_diagonals(N: int, M: int) -> int:
    return N + M - 1


def skew(x):
    """``(B, N, M) -> (K, B, N)`` diagonal-major layout, ``K = N + M - 1``.

    ``skew(x)[d, b, i] == x[b, i, d - i]`` where valid, else 0.
    """
    B, N, M = x.shape
    K = N + M - 1
    d = jnp.arange(K)[None, :]                  # (1, K)
    i = jnp.arange(N)[:, None]                  # (N, 1)
    j = d - i                                   # (N, K)
    valid = (j >= 0) & (j < M)
    jc = jnp.clip(j, 0, M - 1)
    # gather: out[b, i, d] = x[b, i, jc[i, d]]
    out = jnp.take_along_axis(x, jc[None].repeat(B, axis=0), axis=2)
    out = jnp.where(valid[None], out, jnp.zeros((), x.dtype))
    return jnp.transpose(out, (2, 0, 1))        # (K, B, N)


def unskew(s, N: int, M: int, offset: int = 0):
    """Inverse of :func:`skew` for buffers indexed by DP row ``i``.

    ``s`` has shape ``(K, B, L)`` holding diagonals of a DP quantity where
    position ``i`` on diagonal row ``d`` corresponds to matrix cell
    ``(i - offset, d - i + offset)`` of the output... concretely this inverts
    the layouts used by the DP passes:

    * ``offset=0``  : ``s[d, b, i] = out[b, i, d - i]``  (theta-like, L >= N)
    * ``offset=1``  : ``s[d, b, i] = out[b, i - 1, d - i + 1]`` — used for the
      V/E-style buffers of length ``N + 1`` whose index ``i`` is the DP row
      (1-based), stored on diagonal ``k = i + j`` at slot ``i`` with
      ``d = k - 2``.

    Returns ``(B, N, M)``.
    """
    K, B, L = s.shape
    st = jnp.transpose(s, (1, 0, 2))            # (B, K, L)
    r = jnp.arange(N)[:, None]                  # (N, 1)
    c = jnp.arange(M)[None, :]                  # (1, M)
    d = r + c                                   # (N, M) diagonal row
    slot = r + offset                           # (N, 1) position on diagonal
    flat = d * L + jnp.broadcast_to(slot, (N, M))
    stf = st.reshape(B, K * L)
    out = jnp.take_along_axis(
        stf, flat.reshape(1, N * M).repeat(B, axis=0), axis=1)
    return out.reshape(B, N, M)
