#!/usr/bin/env python3
"""Harness variance check: the same decode graph timed repeatedly, plus
the skew1-vs-skew2 anomaly re-measured, in one process.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/probe_variance.py
"""

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp_bm
from deepblast_tpu.utils.timing import time_op

dp_bm.D_DTYPE = jnp.bfloat16

B, N, M = 256, 512, 512
rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)
Et = jnp.ones((B,), jnp.float32)


def p_bwd(th, a, _eps=0.0):
    ths, As = dp_bm.skew_input(th), dp_bm.skew_input(a)
    vt, aux = dp_bm.forward_bm(ths, As, ln, lm)
    E_s, _ = dp_bm.backward_bm(Et, aux, ln, lm)
    return vt, E_s


def p_skew1(th, _eps=0.0):
    return dp_bm.skew_input(th)


def p_skew2(th, a, _eps=0.0):
    return dp_bm.skew_input(th), dp_bm.skew_input(a)


for i in range(4):
    dt = time_op(p_bwd, theta, A, reps=8, iters=3)
    print(f"decode[{i}]: {dt*1e3:.2f} ms", flush=True)
for i in range(3):
    d1 = time_op(p_skew1, theta, reps=8, iters=3)
    d2 = time_op(p_skew2, theta, A, reps=8, iters=3)
    print(f"skew1[{i}]: {d1*1e3:.2f} ms   skew2[{i}]: {d2*1e3:.2f} ms",
          flush=True)
