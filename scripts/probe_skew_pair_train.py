#!/usr/bin/env python3
"""A/B the fused dual skew on the TRAINING path (4-pass second-order DP).

probe_skew_pair showed the fused kernel wins standalone but not in the
phase-split decode.  The training path is different: monolithic kernels,
and TWO paired-skew preludes per step (theta/A in the forward, Zt/Za in
the VJP) — 4 relayouts whose pairing overhead the fused form removes.
Interleaved min-of-4 at the train-depth bench config (B=256, 512^2,
value_and_grad of a weighted-E loss, d-bf16 menu).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_skew_pair_train.py
"""

import json
import os

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
MENU = DTypeMenu.make(d="bfloat16")

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
W = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)


def grad_step(pair):
    def f(t, a, _eps=0.0):
        dp_bm.SKEW_PAIR = pair  # import-time snapshot; see dp_bm.SKEW_PAIR
        dp_ops._build.cache_clear()  # attr is read at trace time

        def loss(t, a):
            E, EA = dp_ops.expected_alignment(
                t, a, (ln, lm), mode="nw", backend="pallas_bm",
                return_gap=True, dtypes=MENU)
            return jnp.sum(E * W) + jnp.sum(EA * W)
        return jax.value_and_grad(loss, argnums=(0, 1))(t, a)
    return f


def main():
    arms = {"train_singles": grad_step(False),
            "train_fused": grad_step(True)}
    # parity first
    (l0, g0) = arms["train_singles"](theta, A)
    (l1, g1) = arms["train_fused"](theta, A)
    assert np.allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    assert np.allclose(np.asarray(g0[0]), np.asarray(g1[0]), atol=1e-5)
    print("# parity: fused == singles (loss + grads)", flush=True)

    times = {k: [] for k in arms}
    for rnd in range(4):
        for name, f in arms.items():
            dt = time_op(f, theta, A, reps=4, iters=3)
            times[name].append(round(dt * 1e3, 2))
            print(rnd, name, times[name][-1], flush=True)
    out = {name: {"ms": ts, "min_ms": min(ts),
                  "min_aligns_per_s": round(B / (min(ts) / 1e3))}
           for name, ts in times.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
