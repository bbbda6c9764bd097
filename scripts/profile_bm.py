#!/usr/bin/env python3
"""Standalone per-stage timings for the batch-minor DP backend at the
bench config (B=256, 512x512, fp32).  Stages overlap differently in the
real decode graph; these numbers guide tuning (see docs/PERF_NOTES.md).

Env overrides: T_FWD, T_BWD, T_AFWD, T_ABWD, T_EA, STAGES=...,
BF16=1 (bf16 stream/difference/expectation storage, the bench config)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python scripts/profile_bm.py
"""

import json
import os

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops.skew_bm import skew_bm, unskew_bm
from deepblast_tpu.utils.timing import time_op

for name in ("T_FWD", "T_BWD", "T_AFWD", "T_ABWD", "T_EA"):
    if os.environ.get(name):
        setattr(dp_bm, name, int(os.environ[name]))
if os.environ.get("BF16"):
    dp_bm.D_DTYPE = jnp.bfloat16
    dp_bm.STREAM_DTYPE = jnp.bfloat16
    dp_bm.E_DTYPE = jnp.bfloat16

B, N, M = 256, 512, 512
rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)
Et = jnp.ones((B,), jnp.float32)

th_s = dp_bm.skew_input(theta)
A_s = dp_bm.skew_input(A)
vt, aux = jax.jit(dp_bm.forward_bm, static_argnames=())(th_s, A_s, ln, lm)
E_s, _ = dp_bm.backward_bm(Et, aux, ln, lm)
vtd, adj_aux = dp_bm.adjoint_forward_bm(aux, th_s, A_s, ln, lm)

stages = os.environ.get(
    "STAGES", "skew,fwd,bwd,unskew,afwd,abwd,decode,grad").split(",")
results = {}


def run(name, fn, *args, reps=8):
    if name not in stages:
        return
    dt = time_op(fn, *args, reps=reps, iters=3)
    results[name] = round(dt * 1e3, 2)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


run("skew", lambda x, _eps=0.0: dp_bm.skew_input(x), theta)
run("fwd", lambda a, b, _eps=0.0:
    dp_bm.forward_bm(a, b, ln, lm), th_s, A_s)
run("bwd", lambda dx, dm, _eps=0.0:
    dp_bm.backward_bm(Et, (dx, dm), ln, lm)[0], *aux)
run("unskew", lambda s, _eps=0.0:
    unskew_bm(s, N, M, B, out_dtype=jnp.float32), E_s)
# 4-6 stream operand sets: fewer rep copies so 8 x operands fit HBM
run("afwd", lambda dx, dm, zt, za, _eps=0.0:
    dp_bm.adjoint_forward_bm((dx, dm), zt, za, ln, lm),
    *aux, th_s, A_s, reps=3)
run("abwd", lambda e, dx, dm, dxd, dmd, _eps=0.0:
    dp_bm.adjoint_backward_bm(e, (dx, dm), (dxd, dmd), ln, lm),
    E_s, *aux, *adj_aux, reps=3)

# end-to-end graphs through the dispatcher (the honest units: decode =
# 2 skews + fwd + bwd + unskew; grad = decode + 2 skews + afwd + abwd +
# 2 unskews — the training hot path)
from deepblast_tpu.ops import dp as dp_ops  # noqa: E402

dp_bm.register(make_default=True)


def _decode(th, a, _eps=0.0):
    return dp_ops.expected_alignment(th, a, (ln, lm), mode="nw")


def _grad(th, a, _eps=0.0):
    def loss(t, g):
        E = dp_ops.expected_alignment(t, g, (ln, lm), mode="nw")
        return jnp.sum(E * E)
    return jax.grad(loss, argnums=(0, 1))(th, a)


run("decode", _decode, theta, A)
run("grad", _grad, theta, A)

cfg = {k: getattr(dp_bm, k) for k in
       ("T_FWD", "T_BWD", "T_AFWD", "T_ABWD", "T_EA")}
cfg["BF16"] = bool(os.environ.get("BF16"))
print(json.dumps({"config": cfg, "ms": results}))
