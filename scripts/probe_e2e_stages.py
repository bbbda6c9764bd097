#!/usr/bin/env python3
"""In-context stage costs of the headline decode: time nested prefixes of
the composed graph (skew -> skew -> fwd -> bwd [-> unskew]) as single jitted
programs.  Standalone stage timings sum to more than the e2e measurement,
so the differences here are the *real* marginal costs.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/probe_e2e_stages.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops.skew_bm import unskew_bm
from deepblast_tpu.utils.timing import time_op

dp_bm.D_DTYPE = jnp.bfloat16   # the headline config

B, N, M = 256, 512, 512
rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)
Et = jnp.ones((B,), jnp.float32)

results = {}


def run(name, fn, *args, reps=8):
    dt = time_op(fn, *args, reps=reps, iters=3)
    results[name] = round(dt * 1e3, 2)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


def p_skew1(th, _eps=0.0):
    return dp_bm.skew_input(th)


def p_skew2(th, a, _eps=0.0):
    return dp_bm.skew_input(th), dp_bm.skew_input(a)


def p_fwd(th, a, _eps=0.0):
    ths, As = dp_bm.skew_input(th), dp_bm.skew_input(a)
    vt, (dx, dm) = dp_bm.forward_bm(ths, As, ln, lm)
    return vt, dx, dm


def p_bwd(th, a, _eps=0.0):
    ths, As = dp_bm.skew_input(th), dp_bm.skew_input(a)
    vt, aux = dp_bm.forward_bm(ths, As, ln, lm)
    E_s, _ = dp_bm.backward_bm(Et, aux, ln, lm)
    return vt, E_s


def p_unskew(th, a, _eps=0.0):
    ths, As = dp_bm.skew_input(th), dp_bm.skew_input(a)
    vt, aux = dp_bm.forward_bm(ths, As, ln, lm)
    E_s, _ = dp_bm.backward_bm(Et, aux, ln, lm)
    return vt, unskew_bm(E_s, N, M, B, out_dtype=jnp.float32)


run("skew1", p_skew1, theta)
run("skew2", p_skew2, theta, A)
run("skew2+fwd", p_fwd, theta, A)
run("skew2+fwd+bwd", p_bwd, theta, A)
run("skew2+fwd+bwd+unskew", p_unskew, theta, A)

print(json.dumps(results))
