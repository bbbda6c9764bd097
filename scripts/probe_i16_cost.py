#!/usr/bin/env python3
"""Where does the int16 input path lose its byte saving?

probe_i16_streams (round 3) found int16 fixed-point streams compile and
are exact, but `in_i16` saves *nothing* end-to-end (6.00 vs 6.05 ms)
against a projected ~0.9 ms, and adding it to D_bf16 costs +0.5 ms.
Suspects, isolated here at the bench shapes (B=256, 512²):

  skew_q   — skew_input with int16 out (quantize+cast at the shear
             store) vs fp32 out vs bf16 out: does the quantize math or
             the 16-bit store break the whole-block "stack" store path?
  loadwin  — Element-windowed (T, W, LANE) stream *reads* of int16 vs
             fp32 vs bf16 data (copy kernel): do 2-byte windowed loads
             at 16-aligned sublane offsets degrade?
  loadfull — same without windows (full-S Blocked reads), dtype sweep.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/probe_i16_cost.py
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

from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops.dp_bm import DTypeMenu
from deepblast_tpu.utils.timing import time_op

LANE = 128
INTERPRET = jax.default_backend() != "tpu"

B, N, M = (8, 64, 64) if INTERPRET else (256, 512, 512)
rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)

results = {}


def _params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=64 * 2**20)


# -- 1. skew store cost by output dtype -------------------------------------

for name, menu in [
    ("skew_fp32", None),
    ("skew_bf16", DTypeMenu.make(stream="bfloat16")),
    ("skew_i16", DTypeMenu.make(stream="int16")),
]:
    try:
        dt = time_op(
            lambda x, _eps=0.0, m=menu: dp_bm.skew_input(x, dtypes=m),
            theta, reps=8, iters=3)
        results[name] = round(dt * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
    print(name, results[name], flush=True)


# -- 2. windowed + full stream reads by dtype --------------------------------

def _copy_kernel(x_ref, o_ref, *, deq):
    v = x_ref[...]
    if deq:
        v = v.astype(jnp.float32) * jnp.float32(16.0 / 32767.0)
    o_ref[...] = v.astype(o_ref.dtype)


def windowed_read(x, T, W, w0, nk, deq=False):
    Kc, S, Bp = x.shape
    return pl.pallas_call(
        functools.partial(_copy_kernel, deq=deq),
        grid=(Bp // LANE, nk),
        in_specs=[pl.BlockSpec(
            (pl.Element(T), pl.Element(W), pl.Element(LANE)),
            lambda b, k: (k * T, w0, b * LANE),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, W, LANE), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nk * T, W, Bp), jnp.float32 if deq else x.dtype),
        compiler_params=_params(),
        interpret=INTERPRET,
    )(x)


def full_read(x, T, nk, deq=False):
    Kc, S, Bp = x.shape
    return pl.pallas_call(
        functools.partial(_copy_kernel, deq=deq),
        grid=(Bp // LANE, nk),
        in_specs=[pl.BlockSpec((T, S, LANE), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, S, LANE), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nk * T, S, Bp), jnp.float32 if deq else x.dtype),
        compiler_params=_params(),
        interpret=INTERPRET,
    )(x)


if INTERPRET:
    Kc, S, Bp, T, W, w0 = 16, 40, 128, 4, 16, 8
else:
    Kc, S, Bp, T, W, w0 = 512, 520, 256, 8, 272, 112
nk = Kc // T

base = rng.standard_normal((Kc, S, Bp))
for name, x, deq in [
    ("fp32", jnp.asarray(base, jnp.float32), False),
    ("bf16", jnp.asarray(base, jnp.bfloat16), False),
    ("i16raw", jnp.asarray(
        np.clip(base * 2047, -32767, 32767).astype(np.int16)), False),
    ("i16deq", jnp.asarray(
        np.clip(base * 2047, -32767, 32767).astype(np.int16)), True),
]:
    try:
        dt_w = time_op(
            lambda v, _eps=0.0, d=deq: windowed_read(v, T, W, w0, nk, d),
            x, reps=8, iters=3)
        dt_f = time_op(
            lambda v, _eps=0.0, d=deq: full_read(v, T, nk, d),
            x, reps=8, iters=3)
        results[f"loadwin_{name}"] = round(dt_w * 1e3, 3)
        results[f"loadfull_{name}"] = round(dt_f * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        results[f"load_{name}"] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
    print(name, {k: v for k, v in results.items() if name in k}, flush=True)

print(json.dumps(results))
