#!/usr/bin/env python3
"""int16 fixed-point stream-storage study for the batch-minor DP kernels.

The dtype menu so far: bf16 inputs/E fail the traceback-agreement gate
(8 mantissa bits lose near-tie comparisons), fp16 does not compile on
this toolchain (probe_f16_streams.py), bf16 D residuals pass.  int16
*fixed point* is the remaining 16-bit option: inputs quantize at scale
32767/STREAM_RANGE (error ~2.4e-4 at the default range 16 — 16-60x
finer than bf16 at O(1) magnitudes), expectations at scale 32767
(resolution 3e-5).  If the Mosaic toolchain compiles fp32<->int16
converts + 16-bit stores (bf16 does; fp16 does not), this halves the
input-stream bytes (skew writes + forward reads, ~25% of decode
traffic) and the E bytes the bench still pays in fp32.

Interpreter-mode parity is already test-covered (tests/test_i16_streams
.py); this probe answers (a) does it compile on chip, (b) does it pass
the agreement gates at the bench shapes, (c) what does it buy.

Per config: max |E - E_fp32|, greedy-traceback agreement over 16 pairs,
and the stream-decode time.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_i16_streams.py
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
CHECK_PAIRS = 16

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

i16 = jnp.int16
bf16 = jnp.bfloat16

CONFIGS = {
    # (STREAM_DTYPE, D_DTYPE, E_DTYPE)
    "fp32": (None, None, None),
    "D_bf16": (None, bf16, None),          # current bench config
    "in_i16": (i16, None, None),
    "in_i16_D_bf16": (i16, bf16, None),
    "E_i16": (None, None, i16),
    "menu_i16": (i16, bf16, i16),          # candidate full menu
}

results = {}


def decode_natural():
    return np.asarray(dp_ops.expected_alignment(
        theta, A, (ln, lm), mode="nw", backend="pallas_bm"))


def set_cfg(cfg):
    dp_bm.STREAM_DTYPE, dp_bm.D_DTYPE, dp_bm.E_DTYPE = cfg


set_cfg(CONFIGS["fp32"])
E32 = decode_natural()
tb32 = [dp_ops.traceback(E32[b]) for b in range(CHECK_PAIRS)]

for name, cfg in CONFIGS.items():
    set_cfg(cfg)
    try:
        E = decode_natural()
        err = float(np.max(np.abs(E.astype(np.float32) - E32)))
        agree = []
        for b in range(CHECK_PAIRS):
            tb = dp_ops.traceback(E[b])
            n = max(len(tb), len(tb32[b]))
            agree.append(sum(x == y for x, y in zip(tb, tb32[b])) / n)
        # stream-decode traceback must also agree (segments store the
        # quantized E; the walk runs on the cast/dequantized segments)
        Es = dp_ops.expected_alignment_stream(
            theta, A, (ln, lm), mode="nw", backend="pallas_bm")
        sagree = []
        for b in range(CHECK_PAIRS):
            tb = dp_ops.traceback_stream(Es, N, M, b, backend="pallas_bm")
            n = max(len(tb), len(tb32[b]))
            sagree.append(sum(x == y for x, y in zip(tb, tb32[b])) / n)
        dt = time_op(
            lambda t, a, _eps=0.0: dp_ops.expected_alignment_stream(
                t, a, (ln, lm), mode="nw", backend="pallas_bm"),
            theta, A, reps=8, iters=3)
        results[name] = {
            "max_E_err": round(err, 5),
            "agreement": round(float(np.mean(agree)), 4),
            "stream_agreement": round(float(np.mean(sagree)), 4),
            "decode_ms": round(dt * 1e3, 2),
            "aligns_per_s": round(B / dt),
        }
    except Exception as e:
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
    print(name, results[name], flush=True)

set_cfg(CONFIGS["fp32"])
print(json.dumps(results))
