#!/usr/bin/env python3
"""Phase-count sweep for the phase-split stream decode.

DECODE_PHASES trades window tightness against per-phase overhead: the
windowable bytes scale like (1/2 + 1/(2P)) of the padded rectangle
(plus boundary-carry round-trips, ~1 MB/phase at the bench shapes, and
per-kernel dispatch overhead).  P=8 was chosen analytically; this probe
measures P in {4, 8, 12, 16} at the bench config with the current best
dtype menu to pick the empirical knee.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_phase_sweep.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops import dp_bm
from deepblast_tpu.utils.timing import time_op

B, N, M = 256, 512, 512

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

# the bench dtype menu (bf16 D; int16 in/E if the i16 probe passed —
# set via env to avoid hardcoding an ungated config)
import os
dp_bm.D_DTYPE = jnp.bfloat16
if os.environ.get("DEEPBLAST_BENCH_I16"):
    dp_bm.STREAM_DTYPE = jnp.int16
    dp_bm.E_DTYPE = jnp.int16

results = {}
for P in (4, 8, 12, 16):
    dp_bm.DECODE_PHASES = P
    try:
        dt = time_op(
            lambda t, a, _eps=0.0: dp_ops.expected_alignment_stream(
                t, a, (ln, lm), mode="nw", backend="pallas_bm"),
            theta, A, reps=8, iters=3)
        results[P] = {"decode_ms": round(dt * 1e3, 2),
                      "aligns_per_s": round(B / dt)}
    except Exception as e:
        results[P] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
    print(P, results[P], flush=True)

dp_bm.DECODE_PHASES = 8
print(json.dumps(results))
