#!/usr/bin/env python3
"""Probe DMA efficiency of candidate stream layouts (follow-up to
probe_step_cost.py, which found pure copies run at ~141 GB/s effective —
1/6 of v5e HBM spec — with (T, S, 128)-of-(K2, S, 256) strided blocks).

Cases (all move the same 2 x 545 MB):
  copy3d_T8    — baseline: (8,520,128) blocks of (1024,520,256) [strided]
  copy4d_T8    — (1,8,520,128) blocks of (2,1024,520,128) [contiguous]
  copyfull_T4  — (4,520,256) blocks of (1024,520,256) [contiguous, 1 grid]
  exp4d_T8     — copy4d + 3 exp + 1 log per row (VPU visibility at full BW)
  shift4d_T8   — copy4d + fwd's shifts/masks/selects diet

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python scripts/probe_dma_layout.py
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
G = BP // LANE

rng = np.random.default_rng(0)
x3 = jnp.asarray(rng.standard_normal((K2, S, BP)), jnp.float32)
x4 = jnp.asarray(rng.standard_normal((G, K2, S, LANE)), jnp.float32)

results = {}


def report(name, dt):
    gbs = 2 * x3.nbytes / dt / 1e9
    results[name] = {"ms": round(dt * 1e3, 2), "GB/s": round(gbs)}
    print(f"{name}: {dt*1e3:.2f} ms  ({gbs:.0f} GB/s eff)", flush=True)


def copy3d(x_ref, o_ref, *, T):
    o_ref[...] = x_ref[...]


def run3d(name, T, lane):
    f = pl.pallas_call(
        functools.partial(copy3d, T=T),
        grid=(BP // lane, K2 // T) if lane < BP else (K2 // T,),
        in_specs=[pl.BlockSpec(
            (T, S, lane),
            (lambda b, k: (k, 0, b)) if lane < BP else (lambda k: (k, 0, 0)),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (T, S, lane),
            (lambda b, k: (k, 0, b)) if lane < BP else (lambda k: (k, 0, 0)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * (2 if lane < BP else 1)),
    )
    report(name, time_op(lambda a, _eps=0.0: f(a + _eps), x3, reps=8, iters=3))


def blk4():
    return pl.BlockSpec((1, 8, S, LANE), lambda b, k: (b, k, 0, 0),
                        memory_space=pltpu.VMEM)


def run4d(name, kern):
    f = pl.pallas_call(
        kern,
        grid=(G, K2 // 8),
        in_specs=[blk4()],
        out_specs=blk4(),
        out_shape=jax.ShapeDtypeStruct((G, K2, S, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    report(name, time_op(lambda a, _eps=0.0: f(a + _eps), x4, reps=8, iters=3))


def copy4d(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def exp4d(x_ref, o_ref):
    for t in range(8):
        v = x_ref[0, t]
        m = jnp.maximum(jnp.maximum(v, v * 0.5), v * 0.25)
        e = jnp.exp(v - m) + jnp.exp(v * 0.5 - m) + jnp.exp(v * 0.25 - m)
        o_ref[0, t] = m + jnp.log(e)


def shift4d(x_ref, o_ref):
    iarr = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    z = jnp.zeros((1, LANE), jnp.float32)
    for t in range(8):
        v = x_ref[0, t]
        sh = jnp.concatenate([z, v[:-1, :]], axis=0)
        valid = (iarr >= 1) & (iarr <= 512)
        o_ref[0, t] = jnp.where(valid, v + sh, 0.0)


run3d("copy3d_T8", 8, LANE)
run4d("copy4d_T8", copy4d)
run3d("copyfull_T4", 4, BP)
run4d("exp4d_T8", exp4d)
run4d("shift4d_T8", shift4d)

print(json.dumps(results))
