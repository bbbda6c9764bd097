"""On-chip A/B: phase-split vs monolithic training kernels (round 5).

Times the full second-order training DP path — grad of sum(E^2) through
expected_alignment (fwd + bwd + adjoint-fwd + adjoint-bwd + unskews, the
reference hot path, SURVEY 3.1) — at the bench config B=256, 512^2, for
{monolithic, phased} x {fp32, d-bf16}, interleaved min-of-N to defeat the
tunnel's bimodal timing windows (PERF_NOTES r3).

Also sweeps the phase count (TRAIN_PHASES in {4, 8, 12}) for the phased
arm at fp32.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_train_phased.py
"""

import json
import os
import sys
import time

os.environ.setdefault("DEEPBLAST_TRAIN_PHASES", "8")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import deepblast_tpu  # noqa: F401  (registers backends)
from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops import dp_bm, dp_bm_train
from deepblast_tpu.utils.timing import time_op

B, N, M = 256, 512, 512
REPS = int(os.environ.get("PROBE_REPS", "4"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "4"))


def set_phases(p):
    dp_bm_train.TRAIN_PHASES = p
    dp_ops._build.cache_clear()
    dp_bm.register(make_default=True)


def make_op(phases, menu):
    def op(theta, A, _eps=0.0):
        def loss(t, a):
            E = dp_ops.expected_alignment(
                t, a, (ln, lm), mode="nw", backend="pallas_bm",
                dtypes=menu)
            return jnp.sum(E * E)
        return jax.grad(loss, argnums=(0, 1))(theta, A)
    return op


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
    global ln, lm
    ln = jnp.full((B,), N, jnp.int32)
    lm = jnp.full((B,), M, jnp.int32)

    bf16 = dp_bm.DTypeMenu.make(d="bfloat16")
    arms = [
        ("mono_fp32", 0, None),
        ("phased8_fp32", 8, None),
        ("mono_dbf16", 0, bf16),
        ("phased8_dbf16", 8, bf16),
        ("phased4_fp32", 4, None),
        ("phased12_fp32", 12, None),
    ]
    if os.environ.get("PROBE_ARMS"):
        keep = set(os.environ["PROBE_ARMS"].split(","))
        arms = [a for a in arms if a[0] in keep]

    results = {name: [] for name, _, _ in arms}
    # correctness cross-check once, cheap shapes, before timing
    for r in range(ROUNDS):
        for name, phases, menu in arms:
            set_phases(phases)
            op = make_op(phases, menu)
            t0 = time.time()
            dt = time_op(op, theta, A, reps=REPS, iters=3)
            results[name].append(dt)
            print(f"round {r} {name}: {dt*1e3:.2f} ms "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
    out = {}
    for name, _, _ in arms:
        dts = results[name]
        out[name] = {
            "ms_min": round(min(dts) * 1e3, 2),
            "ms_all": [round(d * 1e3, 2) for d in dts],
            "aligns_per_s": round(B / min(dts), 1),
        }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
