#!/usr/bin/env python3
"""Score-only forward kernel (forward_score_bm) vs the residual-writing
forward (forward_bm) on chip — the deepblast-search / score_pairs hot
path (round 4).

The full forward writes two (K2, S, Bp) difference streams for reverse
consumers; an undifferentiated scoring call has none, but XLA cannot DCE
stores out of a pallas_call.  forward_score_bm drops them at the kernel
level: expected ~3x less HBM traffic on the DP part of a database scan.

Arms (interleaved min-of-6, exactness asserted first):
  score_full   skew_pair + forward_bm (vt consumed, streams discarded)
  score_only   skew_pair + forward_score_bm
  api          dp.alignment_score (dispatches to score_only since r4)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/probe_score_fwd.py
"""

import json

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deepblast_tpu.ops import dp as dp_ops  # noqa: E402
from deepblast_tpu.ops import dp_bm  # noqa: E402
from deepblast_tpu.utils.timing import time_op  # noqa: E402

B, N, M = 256, 512, 512

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)


def score_full(t, a, _eps=0.0):
    td, ad = dp_bm.skew_input_pair(t, a)
    vt, _ = dp_bm.forward_bm(td, ad, ln, lm, mode="nw")
    return vt


def score_only(t, a, _eps=0.0):
    td, ad = dp_bm.skew_input_pair(t, a)
    return dp_bm.forward_score_bm(td, ad, ln, lm, mode="nw")


def api(t, a, _eps=0.0):
    return dp_ops.alignment_score(t, a, (ln, lm), backend="pallas_bm")


def main():
    v_full = np.asarray(jax.jit(score_full)(theta, A))
    v_only = np.asarray(jax.jit(score_only)(theta, A))
    v_api = np.asarray(jax.jit(api)(theta, A))
    np.testing.assert_allclose(v_only, v_full, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(v_api, v_full, rtol=1e-6, atol=1e-5)
    print("# exactness: score_only == score_full == api", flush=True)

    arms = {"score_full": score_full, "score_only": score_only, "api": api}
    times = {k: [] for k in arms}
    for rnd in range(6):
        for k, f in arms.items():
            dt = time_op(f, theta, A, reps=8, iters=3)
            times[k].append(round(dt * 1e3, 3))
            print(rnd, k, times[k][-1], flush=True)
    out = {k: {"ms": v, "min_ms": min(v),
               "min_pairs_per_s": round(B / (min(v) / 1e3))}
           for k, v in times.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
