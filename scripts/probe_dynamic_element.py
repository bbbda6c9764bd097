#!/usr/bin/env python3
"""Probe *grid-step-varying* `pl.Element` offsets on this Mosaic toolchain.

probe_element_window.py established that Element windows with per-call
CONSTANT offsets compile and are exact.  If the offset may depend on the
grid index k (still 8/16-aligned), the monolithic training kernels could
read/write exact triangular windows per diagonal block — and mod-Mp
folded *outputs* become collision-free static disjoint stores — without
any phase splitting (docs/PERF_NOTES.md "phase-split" entry, next-lever
discussion).

Checks (small compiled shapes on TPU; interpret on CPU):
  dyn_read   — in_spec Element offset w(k) = 16*k
  dyn_write  — out_spec Element offset w(k) = 16*k (disjoint rows)
  dyn_fold   — out rows folded k mod 2 with disjoint k-dependent windows
               (the training-fold pattern: two visits, disjoint slots)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/probe_dynamic_element.py
"""

import json

import os

import jax
if os.environ.get("DEEPBLAST_PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
INTERPRET = jax.default_backend() != "tpu"

results = {}


def _params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=64 * 2**20)


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def run(name, fn, check):
    try:
        out = np.asarray(fn())
        ok = bool(check(out))
        results[name] = ok
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL: {type(e).__name__}: {e}"[:200]


def main():
    rng = np.random.default_rng(0)
    T, W, Bp = 8, 32, 256
    nk = 8
    S = 16 * nk + W  # room for the sliding window
    x = jnp.asarray(rng.standard_normal((nk * T, S, Bp)), jnp.float32)
    xs = np.asarray(x)

    # 1) k-dependent Element read offset: w(k) = 16*k
    def dyn_read():
        return pl.pallas_call(
            _copy_kernel,
            grid=(Bp // LANE, nk),
            in_specs=[pl.BlockSpec(
                (pl.Element(T), pl.Element(W), pl.Element(LANE)),
                lambda b, k: (k * T, 16 * k, b * LANE),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, W, LANE), lambda b, k: (k, 0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nk * T, W, Bp), x.dtype),
            compiler_params=_params(),
            interpret=INTERPRET,
        )(x)

    def check_read(out):
        want = np.stack([xs[kb * T + t, 16 * kb:16 * kb + W, :]
                         for kb in range(nk) for t in range(T)])
        return np.array_equal(out, want)

    run("dyn_element_read", dyn_read, check_read)

    # 2) k-dependent Element write offset (disjoint row blocks)
    seg = jnp.asarray(rng.standard_normal((nk * T, W, Bp)), jnp.float32)
    segs = np.asarray(seg)

    def dyn_write():
        return pl.pallas_call(
            _copy_kernel,
            grid=(Bp // LANE, nk),
            in_specs=[pl.BlockSpec((T, W, LANE), lambda b, k: (k, 0, b),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (pl.Element(T), pl.Element(W), pl.Element(LANE)),
                lambda b, k: (k * T, 16 * k, b * LANE),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nk * T, S, Bp), x.dtype),
            compiler_params=_params(),
            interpret=INTERPRET,
        )(seg)

    def check_write(out):
        for kb in range(nk):
            got = out[kb * T:(kb + 1) * T, 16 * kb:16 * kb + W, :]
            if not np.array_equal(got, segs[kb * T:(kb + 1) * T]):
                return False
        return True

    run("dyn_element_write", dyn_write, check_write)

    # 3) folded rows (k mod 2) with disjoint k-dependent windows:
    #    visits k and k + nk/2 write the same row block at windows
    #    16*k vs 16*k + half — the training-fold pattern
    half = 16 * (nk // 2)

    def dyn_fold():
        return pl.pallas_call(
            _copy_kernel,
            grid=(Bp // LANE, nk),
            in_specs=[pl.BlockSpec((T, W, LANE), lambda b, k: (k, 0, b),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (pl.Element(T), pl.Element(W), pl.Element(LANE)),
                lambda b, k: ((k % (nk // 2)) * T,
                              16 * (k % (nk // 2)) +
                              (k // (nk // 2)) * half, b * LANE),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(((nk // 2) * T, S, Bp), x.dtype),
            compiler_params=_params(),
            interpret=INTERPRET,
        )(seg)

    def check_fold(out):
        for kb in range(nk):
            r = kb % (nk // 2)
            w0 = 16 * r + (kb // (nk // 2)) * half
            got = out[r * T:(r + 1) * T, w0:w0 + W, :]
            if not np.array_equal(got, segs[kb * T:(kb + 1) * T]):
                return False
        return True

    run("dyn_element_fold", dyn_fold, check_fold)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
