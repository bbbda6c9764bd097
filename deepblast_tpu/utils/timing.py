"""Device timing utilities.

Tunneled TPU backends have a large per-call host<->device round trip and an
unreliable ``block_until_ready`` fence, so single-dispatch timing is
useless.  :func:`time_op` chains ``R`` data-dependent repetitions of the
operation inside one jitted program, forces completion with a scalar host
transfer, and reports the per-repetition time.

Operands must be passed as ``args`` (not closed over): closure arrays
become XLA constants and the compiler will happily spend minutes
constant-folding hundreds of MB through layout ops.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["time_op"]


def time_op(op, *args, reps=8, iters=5, warmup=1, probe=True,
            copy_argnums=None):
    """Median per-repetition seconds for ``op(*args, _eps=...)``.

    ``op`` is re-executed ``reps`` times inside a single jit with a scalar
    data-dependency (`_eps`) threaded between repetitions so XLA cannot
    collapse them.

    The ``reps`` repetitions are *independent*: each runs on its own
    device copy of the operands (distinct XLA parameters, so CSE cannot
    collapse them) and they execute back-to-back in one program — the
    steady-state throughput a pipelined serving/training loop sees.
    Chaining schemes measured worse than the truth here: ``x + _eps``
    re-materialised the first operand every rep, and an
    ``optimization_barrier`` on the carried operands forced a full copy
    per scan step (~3.5 ms at the bench shapes; round-2 finding — the
    probe scripts' chain decomposition pinned it).

    With ``probe=True`` (default) only a 128-element probe of each output
    leaf is consumed; safe for pallas/custom-call outputs (the kernel
    always runs in full).  Pass ``probe=False`` when timing pure-XLA
    elementwise ops that dead-code elimination could otherwise shrink to
    the probed elements.

    Device memory holds ``reps`` copies of the operands — size reps
    accordingly for large operands (8 x 0.5 GB is fine on a 16 GB chip).
    ``copy_argnums`` restricts the per-rep copies to those positional
    args; the rest are shared across reps (safe whenever at least one
    copied operand feeds every rep — distinct inputs already defeat CSE.
    Use for timing large-parameter models: copy the tokens, share the
    weights).
    """

    def readback(out):
        leaves = jax.tree_util.tree_leaves(out)
        if probe:
            return sum(jnp.sum(l.reshape(-1)[:128]).astype(jnp.float32)
                       for l in leaves)
        return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    # distinct device buffers per rep (jnp.array(copy=True) => separate
    # XLA parameters, identical values)
    def _copy(a):
        return jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), a)

    def _copy_set():
        if copy_argnums is None:
            return _copy(args)
        return tuple(_copy(a) if i in copy_argnums else a
                     for i, a in enumerate(args))

    argsets = [args] + [_copy_set() for _ in range(reps - 1)]

    @jax.jit
    def repeated(argsets):
        tot = jnp.float32(0.0)
        for a in argsets:
            tot = tot + readback(op(*a, _eps=jnp.float32(0.0)))
        return tot

    @jax.jit
    def null(argsets):
        # same operand set, no kernels: measures dispatch + host RTT +
        # probe overhead, subtracted from the full measurement below
        tot = jnp.float32(0.0)
        for a in argsets:
            tot = tot + sum(
                jnp.sum(l.reshape(-1)[:1]).astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(a))
        return tot

    def measure(fn):
        for _ in range(warmup):
            float(fn(argsets))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(argsets))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t_null = measure(null)
    t_full = measure(repeated)
    # When the null program measures as slow as the full one (tiny ops
    # through the tunnel: dispatch/RTT noise exceeds the op itself), the
    # subtraction is meaningless — floor at 2% of the raw time rather
    # than a nanosecond, so sub-resolution measurements read as "about
    # dispatch-scale", never as absurd throughputs (a len-128 decode
    # once printed 2.5e-10 s under the old 1e-9 floor).  The floor is
    # deliberately small: an op truly costing ~5% of the RTT-dominated
    # program must still report its genuine subtraction, not the floor.
    return max(t_full - t_null, 0.02 * t_full) / reps
