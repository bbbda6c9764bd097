#!/usr/bin/env python3
"""On-chip Mosaic probes for the batch-minor (lane = batch) kernel designs.

Each probe compiles + runs one tiny pallas_call exercising a lowering
pattern the planned batch-minor relayout / DP kernels need, at the real
bench shapes (K2=1024, S=520, Bp=256, M=512).  Prints PASS/FAIL per
pattern and a numeric check where applicable.  Safe to re-run; results are
appended to docs/PERF_NOTES.md by hand.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python scripts/probe_bm_patterns.py
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

K2, S, BP, M = 1024, 520, 256, 512

results = {}


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                results[name] = "PASS"
                print(f"PASS {name}", flush=True)
            except Exception as e:
                results[name] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
                print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}",
                      flush=True)
                traceback.print_exc(limit=2)
        return run
    return deco


@probe("P1_roll3d_axis0")
def p1():
    # roll a (K2, 8, 128) 3D block along the leading (untiled) axis,
    # static + traced amounts, with a middle-dim iota select
    def kern(x_ref, o_ref):
        g = pl.program_id(0)
        x = x_ref[...]
        x = pltpu.roll(x, 8, 0)                      # static
        t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where((t & 1) != 0, pltpu.roll(x, 1, 0), x)
        x = pltpu.roll(x, g + 1, 0)                  # traced
        o_ref[...] = x

    x = jnp.arange(K2 * 8 * 128, dtype=jnp.float32).reshape(K2, 8, 128)
    out = pl.pallas_call(
        kern, grid=(2,),
        in_specs=[pl.BlockSpec((K2, 8, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K2, 8, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K2, 8, 128), jnp.float32),
    )(x)
    ref = np.roll(np.asarray(x), 8, 0)
    t = np.arange(8)[None, :, None]
    ref = np.where((t & 1) != 0, np.roll(ref, 1, 0), ref)
    ref = np.roll(ref, 2, 0)  # last grid step g=1 wins
    np.testing.assert_array_equal(np.asarray(out), ref)


@probe("P2_blockspec_middle_chunk")
def p2():
    # (K2, S, BP) array read via (K2, 8, 128) blocks indexed on middle+last
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.ones((K2, S, BP), jnp.float32)
    out = pl.pallas_call(
        kern, grid=(S // 8, BP // 128),
        in_specs=[pl.BlockSpec((K2, 8, 128), lambda c, b: (0, c, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K2, 8, 128), lambda c, b: (0, c, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.float32),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), 2.0 * np.ones((K2, S, BP)))


@probe("P3_stack_axis1")
def p3():
    # build a (K2, 8, 128) block from 8 (K2, 128) planes via stack(axis=1)
    def kern(x_ref, o_ref):
        planes = [x_ref[...][:, t, :] * 1.0 for t in range(8)]
        o_ref[...] = jnp.stack(planes, axis=1)

    x = jnp.arange(K2 * 8 * 128, dtype=jnp.float32).reshape(K2, 8, 128)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((K2, 8, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K2, 8, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K2, 8, 128), jnp.float32),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@probe("P4_middle_index_store")
def p4():
    # o_ref[:, t, :] = plane for static t
    def kern(x_ref, o_ref):
        for t in range(8):
            o_ref[:, t, :] = x_ref[:, t, :] + float(t)

    x = jnp.zeros((K2, 8, 128), jnp.float32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((K2, 8, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K2, 8, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K2, 8, 128), jnp.float32),
    )(x)
    ref = np.broadcast_to(np.arange(8, dtype=np.float32)[None, :, None],
                          (K2, 8, 128))
    np.testing.assert_array_equal(np.asarray(out), ref)


@probe("P5_sublane_concat_shift")
def p5():
    # shift down one sublane on (S, 128) via concat
    def kern(x_ref, o_ref):
        v = x_ref[...]
        z = jnp.zeros((1, v.shape[1]), v.dtype)
        o_ref[...] = jnp.concatenate([z, v[:-1, :]], axis=0)

    x = jnp.arange(S * 128, dtype=jnp.float32).reshape(S, 128)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((S, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
    )(x)
    ref = np.vstack([np.zeros((1, 128), np.float32), np.asarray(x)[:-1]])
    np.testing.assert_array_equal(np.asarray(out), ref)


@probe("P6_sublane_roll_mask_shift")
def p6():
    # same shift via pltpu.roll + iota mask
    def kern(x_ref, o_ref):
        v = x_ref[...]
        r = pltpu.roll(v, 1, 0)
        i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        o_ref[...] = jnp.where(i == 0, jnp.zeros((), v.dtype), r)

    x = jnp.arange(S * 128, dtype=jnp.float32).reshape(S, 128)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((S, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
    )(x)
    ref = np.vstack([np.zeros((1, 128), np.float32), np.asarray(x)[:-1]])
    np.testing.assert_array_equal(np.asarray(out), ref)


@probe("P7_len_block_and_sublane_reduce")
def p7():
    # (1, 128) length blocks + sum over sublanes
    def kern(ln_ref, x_ref, o_ref):
        ln = ln_ref[...]                              # (1, 128)
        v = x_ref[...]                                # (S, 128)
        i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        masked = jnp.where(i <= ln.astype(jnp.int32), v,
                           jnp.zeros((), v.dtype))
        o_ref[...] = jnp.sum(masked, axis=0, keepdims=True)

    ln = jnp.full((1, 128), 3, jnp.int32)
    x = jnp.ones((S, 128), jnp.float32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((S, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(ln, x)
    np.testing.assert_array_equal(np.asarray(out), np.full((1, 128), 4.0))


@probe("P8_dp_block_first_index")
def p8():
    # (T, S, 128) blocks of a (K2, S, BP) array, [t] first-dim indexing
    T = 8

    def kern(x_ref, o_ref):
        for t in range(T):
            o_ref[t] = x_ref[t] + 1.0

    x = jnp.zeros((K2, S, BP), jnp.float32)
    out = pl.pallas_call(
        kern, grid=(BP // 128, K2 // T),
        in_specs=[pl.BlockSpec((T, S, 128), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, S, 128), lambda b, k: (k, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.ones((K2, S, BP)))


@probe("P9_transpose_concat_lanes")
def p9():
    # 8x transpose (M, 128)->(128, M) + lane-offset stores into (128, 8M)
    def kern(x_ref, o_ref):
        for t in range(8):
            p = x_ref[...][:, t, :]                  # (M, 128)
            o_ref[:, t * M:(t + 1) * M] = jnp.swapaxes(p, 0, 1)

    x = jnp.arange(M * 8 * 128, dtype=jnp.float32).reshape(M, 8, 128)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((M, 8, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 8 * M), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 8 * M), jnp.float32),
    )(x)
    xa = np.asarray(x)
    ref = np.concatenate([xa[:, t, :].T for t in range(8)], axis=1)
    np.testing.assert_array_equal(np.asarray(out), ref)


@probe("P10_scratch_carry_seq_grid")
def p10():
    # scratch plane carried across sequential inner grid steps
    def kern(x_ref, o_ref, carry):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        o_ref[...] = carry[...]
        carry[...] = x_ref[...]

    x = jnp.stack([jnp.full((8, 128), float(i + 1)) for i in range(4)])
    out = pl.pallas_call(
        kern, grid=(4,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x)
    ref = np.stack([np.full((8, 128), float(i)) for i in range(4)])
    np.testing.assert_array_equal(np.asarray(out), ref)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for fn in (p1, p2, p3, p4, p5, p6, p7, p8, p9, p10):
        fn()
    print("\nsummary:")
    for k, v in results.items():
        print(f"  {k}: {v}")
