#!/usr/bin/env python3
"""Long-sequence decode demonstration (VERDICT round-1 item 9): len-4096
soft-NW expected alignment on one chip — 2x the reference CUDA kernel's
hard cap (reference: deepblast/nw_cuda.py:11 caps max_len at 2048 via a
fixed grid; longer pairs simply cannot run).

Layout note: at len 4096 the batch-minor backend's 128-lane batch padding
is wasteful for the small batches that fit HBM, so this regime uses the
``pallas_long`` backend (the slot-on-lanes DP kernels behind XLA
relayouts, fp32) — the backends cover complementary (B, L) regimes.

Prints one JSON line {"len", "batch", "ms_per_batch", "alignments_per_s"}.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python scripts/bench_len4096.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.utils.timing import time_op

B, N, M = 8, 4096, 4096
# pallas_long = the wavefront DP kernels behind XLA relayouts (the shear
# kernels' full-(K2, L) VMEM window cannot scale past ~len-2800)
backend = "pallas_long" if jax.default_backend() == "tpu" else "scan"
if backend == "scan":
    B, N, M = 2, 256, 256  # CPU smoke config

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)


def decode(theta, A, _eps=0.0):
    return dp_ops.expected_alignment(theta, A, (ln, lm), mode="nw",
                                     backend=backend)


E = decode(theta, A)
assert np.isfinite(np.asarray(E)).all()
dt = time_op(decode, theta, A, reps=2, iters=3)
print(json.dumps({
    "len": N, "batch": B,
    "ms_per_batch": round(dt * 1e3, 1),
    "alignments_per_s": round(B / dt, 2),
    "backend": backend,
}))
