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


def time_op(op, *args, reps=8, iters=5, warmup=1, probe=True):
    """Median per-repetition seconds for ``op(*args, _eps=...)``.

    ``op`` is re-executed ``reps`` times inside a single jit with a scalar
    data-dependency (`_eps`) threaded between repetitions so XLA cannot
    collapse them.

    With ``probe=True`` (default) the dependency reads only a 128-element
    probe of each output leaf instead of summing it in full — a full sum
    re-reads every output from HBM each repetition, which inflated
    bandwidth-bound kernels by ~35% (round-2 finding).  Probe reads are
    safe for pallas/custom-call outputs (the kernel always runs in full);
    pass ``probe=False`` when timing pure-XLA elementwise ops that dead-code
    elimination could otherwise shrink to the probed elements.
    """

    @jax.jit
    def repeated(*args):
        def body(c, _):
            out = op(*args, _eps=c * 1e-30)
            leaves = jax.tree_util.tree_leaves(out)
            if probe:
                s = sum(jnp.sum(l.reshape(-1)[:128]).astype(jnp.float32)
                        for l in leaves)
            else:
                s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    for _ in range(warmup):
        float(repeated(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(repeated(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / reps
