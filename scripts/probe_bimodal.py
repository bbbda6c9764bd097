#!/usr/bin/env python3
"""Characterise the bimodal decode timing (round 3).

probe_phase_sweep and probe_phase_repeat observed the SAME compiled
decode program running in two distinct modes: ~3.2-3.6 ms ("fast", at
the D-bf16 menu's ~3.7 ms DMA floor) and ~4.9-5.2 ms ("slow"), with
each time_op call (median of 3 iterations) landing wholly in one mode —
the mode persists over seconds and is independent of phase count and of
measurement order.  Candidate causes: (a) chip time-sharing /
interference through the axon tunnel, (b) DVFS/thermal state, (c) HBM
allocator layout (time_op allocates reps x 0.54 GB of operand copies;
fragmentation could change DMA channel striping).

This probe times the same program 12 times in a row, at reps 8/4/16
(different allocation footprints), recording every iteration's raw
time, then reports the distribution.  If (c), reps should shift the
modes; if (a)/(b), mode flips should be time-correlated and
reps-independent.  The min is the chip's demonstrated capability.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_bimodal.py
"""

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops.dp_bm import DTypeMenu
from deepblast_tpu.utils.timing import time_op

B, N, M = 256, 512, 512
MENU = DTypeMenu.make(d="bfloat16", e="int16")

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)


def op(t, a, _eps=0.0):
    return dp_ops.expected_alignment_stream(
        t, a, (ln, lm), mode="nw", backend="pallas_bm", dtypes=MENU)


samples = []
for i in range(12):
    reps = [8, 4, 16][i % 3]
    t0 = time.time()
    dt = time_op(op, theta, A, reps=reps, iters=3)
    samples.append({"i": i, "reps": reps, "ms": round(dt * 1e3, 2),
                    "t": round(time.time() - t0, 1)})
    print(samples[-1], flush=True)

ms = [s["ms"] for s in samples]
print(json.dumps({
    "samples": samples,
    "min_ms": min(ms), "median_ms": sorted(ms)[len(ms) // 2],
    "max_ms": max(ms),
    "min_aligns_per_s": round(B / (min(ms) / 1e3)),
}))
