#!/usr/bin/env python3
"""Mode-controlled A/B of the two decode dtype-menu candidates.

probe_i16_cost showed the int16 *components* all win (skew store 0.38
vs 1.04 ms fp32; windowed dequant loads 0.17 vs 0.21 ms), projecting
the full i16 menu ~1.3 ms ahead — yet probe_i16_streams' single-shot
end-to-end ranking had it 0.5 ms BEHIND D-bf16.  With the decode timing
now known to be bimodal (±30% mode flips persisting over seconds —
probe_phase_repeat), single measurements cannot rank menus 0.5 ms
apart.  This probe interleaves the two menus 6x in one process and
compares the per-menu MIN (the demonstrated capability, robust to mode
flips landing on either arm).

A: D=bf16 + E=i16 (current bench default)
B: in=i16 + D=bf16 + E=i16 (full menu; agreement 0.9996 on chip)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_menu_ab.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops.dp_bm import DTypeMenu
from deepblast_tpu.utils.timing import time_op

B, N, M = 256, 512, 512
MENUS = {
    "A_dbf16_ei16": DTypeMenu.make(d="bfloat16", e="int16"),
    "B_full_i16": DTypeMenu.make(stream="int16", d="bfloat16", e="int16"),
}

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

times = {k: [] for k in MENUS}
for rnd in range(6):
    for name, menu in MENUS.items():
        dt = time_op(
            lambda t, a, _eps=0.0, m=menu: dp_ops.expected_alignment_stream(
                t, a, (ln, lm), mode="nw", backend="pallas_bm", dtypes=m),
            theta, A, reps=8, iters=3)
        times[name].append(round(dt * 1e3, 2))
        print(rnd, name, times[name][-1], flush=True)

out = {}
for name, ts in times.items():
    out[name] = {"ms": ts, "min_ms": min(ts),
                 "min_aligns_per_s": round(B / (min(ts) / 1e3))}
print(json.dumps(out))
