#!/usr/bin/env python3
"""The missing cell of the round-3 int16 dtype table: D=bf16 + E=int16.

probe_i16_streams.py measured E_i16 alone at -0.46 ms vs fp32 (the E
write is the only stream that knob touches, and the saving matched the
byte accounting), but never combined it with the measured-best D=bf16
menu — the full i16 menu result (5.47 ms) is confounded by the
perf-neutral in_i16 input path.  If the savings compose, D_bf16+E_i16
should land ~4.6 ms (~56k aligns/s) and become the new bench menu.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_dbf16_ei16.py
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
CHECK_PAIRS = 16

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

CONFIGS = {
    "D_bf16": DTypeMenu.make(d=jnp.bfloat16),
    "D_bf16_E_i16": DTypeMenu.make(d=jnp.bfloat16, e=jnp.int16),
    "E_i16": DTypeMenu.make(e=jnp.int16),
}

E32 = np.asarray(dp_ops.expected_alignment(
    theta, A, (ln, lm), mode="nw", backend="pallas_bm"))
tb32 = [dp_ops.traceback(E32[b]) for b in range(CHECK_PAIRS)]

results = {}
for name, menu in CONFIGS.items():
    try:
        E = np.asarray(dp_ops.expected_alignment(
            theta, A, (ln, lm), mode="nw", backend="pallas_bm",
            dtypes=menu))
        err = float(np.max(np.abs(E.astype(np.float32) - E32)))
        Es = dp_ops.expected_alignment_stream(
            theta, A, (ln, lm), mode="nw", backend="pallas_bm",
            dtypes=menu)
        sagree = []
        for b in range(CHECK_PAIRS):
            tb = dp_ops.traceback_stream(Es, N, M, b, backend="pallas_bm")
            n = max(len(tb), len(tb32[b]))
            sagree.append(sum(x == y for x, y in zip(tb, tb32[b])) / n)
        dt = time_op(
            lambda t, a, _eps=0.0, _m=menu: dp_ops.expected_alignment_stream(
                t, a, (ln, lm), mode="nw", backend="pallas_bm", dtypes=_m),
            theta, A, reps=8, iters=3)
        results[name] = {
            "max_E_err": round(err, 5),
            "stream_agreement": round(float(np.mean(sagree)), 4),
            "decode_ms": round(dt * 1e3, 2),
            "aligns_per_s": round(B / dt),
        }
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
    print(name, results[name], flush=True)

print(json.dumps(results))
