#!/usr/bin/env python3
"""Probe the remaining decode headroom at the headline config
(D_DTYPE=bf16, fp32 inputs/outputs):

  skew_store / skew_stack — fp32 skew strategy choice under the honest
      harness (round-1 chose "store" under the broken one)
  fwd / bwd / unskew      — per-stage at the exact headline dtype mix
  copy_fwd / copy_rev     — ascending vs descending block index maps on a
      pure stream copy (does reverse-order DMA defeat prefetch?)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/probe_decode_headroom.py
"""

import functools
import json
import os

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops import skew_bm as skew_mod
from deepblast_tpu.utils.timing import time_op

dp_bm.D_DTYPE = jnp.bfloat16   # the headline config

B, N, M = 256, 512, 512
rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)
Et = jnp.ones((B,), jnp.float32)

th_s = dp_bm.skew_input(theta)
A_s = dp_bm.skew_input(A)
vt, aux = dp_bm.forward_bm(th_s, A_s, ln, lm)
E_s, _ = dp_bm.backward_bm(Et, aux, ln, lm)

results = {}


def run(name, fn, *args, reps=8):
    dt = time_op(fn, *args, reps=reps, iters=3)
    results[name] = round(dt * 1e3, 2)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


for strat in ("store", "stack"):
    skew_mod.STRATEGY = strat
    run(f"skew_{strat}", lambda x, _eps=0.0: dp_bm.skew_input(x), theta)
skew_mod.STRATEGY = "auto"

run("fwd", lambda a, b, _eps=0.0: dp_bm.forward_bm(a, b, ln, lm),
    th_s, A_s)
run("bwd", lambda dx, dm, _eps=0.0:
    dp_bm.backward_bm(Et, (dx, dm), ln, lm)[0], *aux)
run("unskew", lambda s, _eps=0.0:
    skew_mod.unskew_bm(s, N, M, B, out_dtype=jnp.float32), E_s)

# ascending vs descending block order on a pure copy
K2, S, BP, LANE = 1024, 520, 256, 128
x = jnp.asarray(rng.standard_normal((K2, S, BP)), jnp.float32)
T = 8
KB = K2 // T


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def run_copy(name, rowfn):
    blk = pl.BlockSpec((T, S, LANE), lambda b, k: (rowfn(k), 0, b),
                       memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        copy_kernel, grid=(BP // LANE, KB), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.float32),
    )
    run(name, lambda a, _eps=0.0: f(a), x)


run_copy("copy_fwd", lambda k: k)
run_copy("copy_rev", lambda k: KB - 1 - k)

print(json.dumps(results))
