#!/usr/bin/env python3
"""Phase-count knee at NON-bench shapes (VERDICT r2 weak item 6 tail).

The 512^2 B=256 sweep fixed DECODE_PHASES=8; rectangular and long
shapes were a guess.  This probe measures P in {4, 8, 16} at
1024^2 B=64 (the long-length case) with the bench dtype menu,
interleaved min-of-4 per arm (the decode timing is bimodal — see
PERF_NOTES; single shots cannot rank).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_phase_sweep_shapes.py
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

B, N, M = 64, 1024, 1024
MENU = DTypeMenu.make(d="bfloat16", e="int16")

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

PS = (4, 8, 16)


def decode_with_p(P):
    def f(t, a, _eps=0.0):
        dp_bm.DECODE_PHASES = P  # read at trace time; each arm traces once
        return dp_ops.expected_alignment_stream(
            t, a, (ln, lm), mode="nw", backend="pallas_bm", dtypes=MENU)
    return f


def main():
    arms = {P: decode_with_p(P) for P in PS}
    times = {P: [] for P in PS}
    try:
        for rnd in range(4):
            for P, f in arms.items():
                dt = time_op(f, theta, A, reps=4, iters=3)
                times[P].append(round(dt * 1e3, 2))
                print(rnd, P, times[P][-1], flush=True)
    finally:
        dp_bm.DECODE_PHASES = 8
    out = {P: {"ms": ts, "min_ms": min(ts),
               "min_aligns_per_s": round(B / (min(ts) / 1e3))}
           for P, ts in times.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
