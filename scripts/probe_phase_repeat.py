#!/usr/bin/env python3
"""Repeatability check for the phase-sweep outlier.

probe_phase_sweep measured P=8 at 3.59 ms (71k aligns/s) in a process
where probe_dbf16_ei16 and probe_i16_streams both measured the same
program at 5.0 ms — a 28% discrepancy, well past the documented
10-15% cross-process wobble, and suspiciously equal to the ~3.7 ms DMA
floor of the D-bf16 menu.  This probe interleaves repeated P=8
measurements with P=6/10 in one process (and measures the new bench
menu D-bf16+E-i16 at each P) to decide whether 3.59 is real, an
artifact of measurement order, or long-tail wobble.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_phase_repeat.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops.dp_bm import DTypeMenu
from deepblast_tpu.utils.timing import time_op

B, N, M = 256, 512, 512
MENU = DTypeMenu.make(d="bfloat16", e="int16")

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

results = {}
for tag, P in [("8a", 8), ("6", 6), ("8b", 8), ("10", 10), ("8c", 8)]:
    dp_bm.DECODE_PHASES = P
    try:
        dt = time_op(
            lambda t, a, _eps=0.0: dp_ops.expected_alignment_stream(
                t, a, (ln, lm), mode="nw", backend="pallas_bm",
                dtypes=MENU),
            theta, A, reps=8, iters=3)
        results[tag] = {"P": P, "decode_ms": round(dt * 1e3, 2),
                        "aligns_per_s": round(B / dt)}
    except Exception as e:  # noqa: BLE001
        results[tag] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
    print(tag, results[tag], flush=True)

dp_bm.DECODE_PHASES = 8
print(json.dumps(results))
