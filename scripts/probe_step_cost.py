#!/usr/bin/env python3
"""Disambiguate what bounds the bm DP kernels: per-grid-step overhead vs
VPU transcendentals vs HBM traffic.

Times, at the bench stream shape (K2=1024, S=520, Bp=256, fp32):
  copy_T{4,8}    — 1-stream pass-through kernel (pure DMA + step overhead)
  copy2_T8       — 2-in/1-out pass-through (fwd's DMA pattern)
  exp3_T8        — copy + 3 exp + 1 log per row (fwd's transcendental diet)
  shift2_T8      — copy + 2 sublane shifts + masks (fwd's layout diet)

Interpretation: if copy_T4 ≈ 2x copy_T8, the per-step overhead dominates
(raise T / cut steps).  If exp3 - copy ≈ fwd - (other terms), the VPU
transcendentals dominate (cut exps / fuse).  Floor = 2 streams @ ~819 GB/s
(v5e) ≈ 1.3 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python scripts/probe_step_cost.py
"""

import functools
import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.utils.timing import time_op

K2, S, BP, LANE = 1024, 520, 256, 128

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((K2, S, BP)), jnp.float32)
y = jnp.asarray(rng.standard_normal((K2, S, BP)), jnp.float32)

results = {}


def blk(T, rowfn=lambda k: k):
    return pl.BlockSpec((T, S, LANE), lambda b, k: (rowfn(k), 0, b),
                        memory_space=pltpu.VMEM)


def run_case(name, kern, n_in, T):
    f = pl.pallas_call(
        functools.partial(kern, T=T),
        grid=(BP // LANE, K2 // T),
        in_specs=[blk(T)] * n_in,
        out_specs=blk(T),
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    args = (x, y)[:n_in]
    dt = time_op(lambda *a, _eps=0.0: f(a[0] + _eps, *a[1:]), *args,
                 reps=8, iters=3)
    results[name] = round(dt * 1e3, 2)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


def copy_kernel(x_ref, o_ref, *, T):
    o_ref[...] = x_ref[...]


def copy2_kernel(x_ref, y_ref, o_ref, *, T):
    o_ref[...] = x_ref[...] + y_ref[...]


def exp3_kernel(x_ref, o_ref, *, T):
    for t in range(T):
        v = x_ref[t]
        m = jnp.maximum(jnp.maximum(v, v * 0.5), v * 0.25)
        e = jnp.exp(v - m) + jnp.exp(v * 0.5 - m) + jnp.exp(v * 0.25 - m)
        o_ref[t] = m + jnp.log(e)


def shift2_kernel(x_ref, o_ref, *, T):
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    z = jnp.zeros((1, LANE), jnp.float32)
    for t in range(T):
        v = x_ref[t]
        sh = jnp.concatenate([z, v[:-1, :]], axis=0)
        valid = (iarr >= 1) & (iarr <= 512)
        o_ref[t] = jnp.where(valid, v + sh, 0.0)


run_case("copy_T4", copy_kernel, 1, 4)
run_case("copy_T8", copy_kernel, 1, 8)
run_case("copy2_T8", copy2_kernel, 2, 8)
run_case("exp3_T8", exp3_kernel, 1, 8)
run_case("shift2_T8", shift2_kernel, 1, 8)

print(json.dumps(results))
