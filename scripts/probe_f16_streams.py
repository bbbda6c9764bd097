#!/usr/bin/env python3
"""fp16 (float16) stream-storage study for the batch-minor DP kernels.

The round-2 dtype study rejected bf16 for the *input* streams (greedy-path
agreement 0.83) and for the stored *E* (0.61) — 8 mantissa bits are not
enough for near-tie comparisons.  fp16 carries 11 mantissa bits (8x finer
at equal exponent) and the quantities here are all O(1)-range
(softplus/log-sigmoid potentials, probabilities), well inside fp16's
exponent window — so fp16 storage may pass the same honesty gate that
bf16 failed, halving the input-stream and E bytes the bench config still
pays in fp32.

Per config: max |E - E_fp32|, greedy-traceback agreement over 16 pairs,
and the stream-decode time.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_f16_streams.py
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

f16 = jnp.float16
bf16 = jnp.bfloat16

CONFIGS = {
    # (STREAM_DTYPE, D_DTYPE, E_DTYPE)
    "fp32": (None, None, None),
    "D_bf16": (None, bf16, None),          # current bench config
    "D_f16": (None, f16, None),
    "in_f16_D_bf16": (f16, bf16, None),
    "E_f16": (None, None, f16),
    "all_f16": (f16, f16, f16),
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
        dt = time_op(
            lambda t, a, _eps=0.0: dp_ops.expected_alignment_stream(
                t, a, (ln, lm), mode="nw", backend="pallas_bm"),
            theta, A, reps=8, iters=3)
        results[name] = {
            "max_E_err": round(err, 5),
            "agreement": round(float(np.mean(agree)), 4),
            "decode_ms": round(dt * 1e3, 2),
            "aligns_per_s": round(B / dt),
        }
    except Exception as e:
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
    print(name, results[name], flush=True)

set_cfg(CONFIGS["fp32"])
print(json.dumps(results))
