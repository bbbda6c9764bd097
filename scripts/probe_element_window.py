#!/usr/bin/env python3
"""Probe `pl.Element` windowed block indexing on this Mosaic toolchain.

The phase-split decode (dp_bm.decode_stream_bm) currently reads full-S
input rows while each phase only needs its static slot window [w0, w1) —
~0.8 ms of wasted read at the bench config.  `pl.Element(W)` block dims
take *element* start offsets from the index map, so a phase kernel could
read (T, W, LANE) input windows at the 16-aligned per-phase offset w0.

Checks (interpret mode on CPU, compiled on TPU):
  read   — in_spec all-Element (Element T, Element W, Element LANE) with a
           grid-step-varying row offset k*T, per-call-constant w0, and
           lane offset b*LANE — the exact form the phase-split decode's
           input windows use (dp_bm.py _fwd/_bwd phase in_specs)
  write  — out_spec Element windowed store into a full-S output
  timing — windowed vs full-row stream copy at the bench shape (TPU)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 python scripts/probe_element_window.py
"""

import functools
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


def windowed_read(x, T, W, w0, nk):
    """Copy nk*(T, W, LANE) windows at sublane offset w0 to a segment."""
    Kc, S, Bp = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(Bp // LANE, nk),
        in_specs=[pl.BlockSpec(
            (pl.Element(T), pl.Element(W), pl.Element(LANE)),
            lambda b, k: (k * T, w0, b * LANE),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, W, LANE), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nk * T, W, Bp), x.dtype),
        compiler_params=_params(),
        interpret=INTERPRET,
    )(x)


def windowed_write(x, T, W, w0, nk, S):
    """Scatter (T, W, LANE) blocks into a full-S output at offset w0."""
    _, _, Bp = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(Bp // LANE, nk),
        in_specs=[pl.BlockSpec((T, W, LANE), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (pl.Element(T), pl.Element(W), pl.Element(LANE)),
            lambda b, k: (k * T, w0, b * LANE),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nk * T, S, Bp), x.dtype),
        compiler_params=_params(),
        interpret=INTERPRET,
    )(x)


def full_read(x, T, nk):
    Kc, S, Bp = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(Bp // LANE, nk),
        in_specs=[pl.BlockSpec((T, S, LANE), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, S, LANE), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nk * T, S, Bp), x.dtype),
        compiler_params=_params(),
        interpret=INTERPRET,
    )(x)


def main():
    rng = np.random.default_rng(0)
    if INTERPRET:
        Kc, S, Bp, T, W, w0 = 16, 40, 128, 4, 16, 8
    else:
        Kc, S, Bp, T, W, w0 = 512, 520, 256, 8, 272, 112
    nk = Kc // T
    x = jnp.asarray(rng.standard_normal((Kc, S, Bp)), jnp.float32)

    # correctness: read
    try:
        seg = np.asarray(windowed_read(x, T, W, w0, nk))
        ref = np.asarray(x)[:nk * T, w0:w0 + W, :]
        ok = bool(np.array_equal(seg, ref))
        results["element_read"] = ok
    except Exception as e:  # noqa: BLE001
        results["element_read"] = f"FAIL: {type(e).__name__}: {e}"[:200]

    # correctness: write
    try:
        seg = jnp.asarray(rng.standard_normal((nk * T, W, Bp)), jnp.float32)
        out = np.asarray(windowed_write(seg, T, W, w0, nk, S))
        ok = bool(np.array_equal(out[:, w0:w0 + W, :], np.asarray(seg)))
        results["element_write"] = ok
    except Exception as e:  # noqa: BLE001
        results["element_write"] = f"FAIL: {type(e).__name__}: {e}"[:200]

    # non-16-aligned offset (is 8 enough? fp32 sublane quantum)
    try:
        seg = np.asarray(windowed_read(x, T, W, w0 + 8, nk))
        ref = np.asarray(x)[:nk * T, w0 + 8:w0 + 8 + W, :]
        results["element_read_align8"] = bool(np.array_equal(seg, ref))
    except Exception as e:  # noqa: BLE001
        results["element_read_align8"] = f"FAIL: {type(e).__name__}"[:200]

    if not INTERPRET:
        from deepblast_tpu.utils.timing import time_op
        dt_w = time_op(functools.partial(
            lambda x, _eps=0.0: windowed_read(x, T, W, w0, nk)), x,
            reps=8, iters=3)
        dt_f = time_op(functools.partial(
            lambda x, _eps=0.0: full_read(x, T, nk)), x,
            reps=8, iters=3)
        results["windowed_read_ms"] = round(dt_w * 1e3, 3)
        results["full_read_ms"] = round(dt_f * 1e3, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
