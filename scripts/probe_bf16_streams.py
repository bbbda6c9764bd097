#!/usr/bin/env python3
"""On-chip probes for bf16 stream storage in the batch-minor kernels.

The byte-cut plan (docs/PERF_NOTES.md round-2) stores every DP stream
(th_s, A_s, Vs, E_s) in bf16 — all kernels are DMA-bound, so halving
stream bytes is a ~1.75x decode lever.  Risk points on this Mosaic
toolchain, each probed at full bench scale:

  P1  bf16 (T, S, 128) blocks of a (K2, S, Bp) bf16 array (middle dim
      full) — the DP kernels' block shape.
  P2  bf16 (K2, 8, 128) blocks (middle dim 8 < bf16 tile sublane 16) —
      the skew/unskew kernels' block shape.
  P3  pltpu.roll along axis 0 of a bf16 (K2, 128) plane, traced amount —
      the relayout shear on packed bf16.
  P4  fp32 compute / bf16 store: in-kernel astype round-trips.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python scripts/probe_bf16_streams.py
"""

import functools
import traceback

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K2, S, BP, LANE = 1024, 520, 256, 128

rng = np.random.default_rng(0)
x32 = jnp.asarray(rng.standard_normal((K2, S, BP)), jnp.float32)
x16 = x32.astype(jnp.bfloat16)

results = {}


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                results[name] = "PASS"
                print(f"PASS {name}", flush=True)
            except Exception as e:
                results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
                print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                traceback.print_exc(limit=2)
        return run
    return deco


@probe("P1_bf16_TS128_blocks")
def p1():
    T = 8

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    blk = pl.BlockSpec((T, S, LANE), lambda b, k: (k, 0, b),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(BP // LANE, K2 // T), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.bfloat16),
    )(x16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x16))


@probe("P2_bf16_K2_8_128_blocks")
def p2():
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    blk = pl.BlockSpec((K2, 8, LANE), lambda b, g: (0, g, b),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(BP // LANE, S // 8), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.bfloat16),
    )(x16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x16))


@probe("P3_bf16_roll_traced")
def p3():
    def kern(x_ref, o_ref):
        g = pl.program_id(1)
        for t in range(8):
            o_ref[:, t, :] = pltpu.roll(x_ref[:, t, :], g * 8 + t, 0)

    blk = pl.BlockSpec((K2, 8, LANE), lambda b, g: (0, g, b),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(BP // LANE, S // 8), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.bfloat16),
    )(x16)
    ref = np.asarray(x16)
    exp = np.stack([np.roll(ref[:, s, :], s, axis=0) for s in range(S)], 1)
    np.testing.assert_array_equal(np.asarray(out), exp)


@probe("P4_f32_compute_bf16_store")
def p4():
    T = 8

    def kern(x_ref, o_ref):
        for t in range(T):
            v = x_ref[t].astype(jnp.float32)
            o_ref[t] = (v * 2.0 + 1.0).astype(jnp.bfloat16)

    blk = pl.BlockSpec((T, S, LANE), lambda b, k: (k, 0, b),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=(BP // LANE, K2 // T), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.bfloat16),
    )(x16)
    exp = (np.asarray(x16, np.float32) * 2 + 1).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(exp))


p1()
p2()
p3()
p4()


def time_copies():
    """bf16 vs fp32 copy at the stream shape: distinguishes byte-bound
    DMA (bf16 copy ~2x faster) from row-descriptor-bound DMA (no gain)."""
    import functools
    from deepblast_tpu.utils.timing import time_op

    def copy_kernel(x_ref, o_ref, *, T):
        o_ref[...] = x_ref[...]

    for name, arr in (("copy_f32", x32), ("copy_bf16", x16)):
        T = 8
        blk = pl.BlockSpec((T, S, LANE), lambda b, k: (k, 0, b),
                           memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            functools.partial(copy_kernel, T=T),
            grid=(BP // LANE, K2 // T), in_specs=[blk], out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((K2, S, BP), arr.dtype),
        )
        dt = time_op(
            lambda a, _eps=0.0: f(a + jnp.asarray(_eps, a.dtype)), arr,
            reps=8, iters=3)
        gbs = 2 * arr.nbytes / dt / 1e9
        results[name] = {"ms": round(dt * 1e3, 2), "GB/s": round(gbs)}
        print(f"{name}: {dt*1e3:.2f} ms  ({gbs:.0f} GB/s eff)", flush=True)


time_copies()
print(results)
