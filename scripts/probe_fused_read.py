#!/usr/bin/env python3
"""Probe the fused natural-read forward design (VERDICT r2 item 10).

Today the decode pays skew(theta)+skew(A) (0.54R + 0.54W GB at the bench
config) and then re-reads the compact streams through phase windows
(0.70R).  A forward kernel that read *natural* ``(B, N, M)`` inputs
directly — one Element-windowed ref per 8-row slot block, transposed and
anti-diagonal-extracted in-kernel — would eliminate the skew round trip:
total input-side bytes ~1.78 -> ~0.6-0.8 GB, a ~1.0-1.7 ms structural
win on the 5.0 ms decode *if* the hardware cooperates.  The design dies
on any of three independent questions, probed cheap-to-expensive:

  1. ``minor_off16/8``  — does Mosaic compile grid-varying Element
     offsets at 16/8 granularity along the *minor* (lane) dim of the
     array?  (All shipped windows offset the lane dim by b*LANE only.)
  2. ``bw_win``         — effective bandwidth of 64 narrow windowed refs
     (LANE, 8, 24/32) vs full-row (LANE, 8, M) blocks: small-burst HBM
     efficiency + per-block DMA overhead at 8x the descriptor count.
  3. ``extract_exact``  — the in-kernel transpose + static anti-diagonal
     extraction reproduces skew_input exactly (and compiles in sane
     time: ~512 small transposes + 8K static slices per kernel body).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_fused_read.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepblast_tpu.ops.dp_bm import skew_input
from deepblast_tpu.ops.skew_bm import bm_dims
from deepblast_tpu.utils.timing import time_op

LANE = 128
INTERPRET = jax.default_backend() != "tpu"
results = {}


def _params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=64 * 2**20)


def run(name, fn):
    try:
        results[name] = fn()
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
    print(name, results[name], flush=True)


def _i32(v):
    return jnp.asarray(v, jnp.int32)


# --- 1. grid-varying Element offsets on the minor dim ---------------------

def minor_off(step):
    x = jnp.arange(64 * 512, dtype=jnp.float32).reshape(64, 512)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    n = (512 - 16) // step + 1
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec(
            (pl.Element(8), pl.Element(16)),
            lambda k: (_i32(0), k * step),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 16), lambda k: (0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 16 * n), jnp.float32),
        compiler_params=_params(),
        interpret=INTERPRET,
    )(x)
    want = np.stack([np.asarray(x)[:8, k * step:k * step + 16]
                     for k in range(n)], 1).reshape(8, 16 * n)
    return bool(np.array_equal(np.asarray(out), want))


# --- 2. bandwidth: narrow windowed refs vs full rows -----------------------

import os
if os.environ.get("DEEPBLAST_PROBE_SMALL"):
    B, N, M = 8, 64, 64      # CPU interpreter logic check
else:
    B, N, M = 256, 512, 512
Bp = -(-B // LANE) * LANE
T, SB = 16, 8
NREF = N // SB
WJ = 32                      # 23 needed; 32 keeps j0 8-aligned
NK = -(-(N + M) // T) + 1


def _x():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N, M)).astype(np.float32)
    if B < Bp:
        x = np.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
    return jnp.asarray(x)


def bw_fullrow():
    x = _x()

    def kern(x_ref, o_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += jnp.sum(x_ref[...], axis=1)

    def op(x, _eps=0.0):
        return pl.pallas_call(
            kern,
            grid=(Bp // LANE, N // 8),
            in_specs=[pl.BlockSpec((LANE, 8, M), lambda b, k: (b, k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((LANE, M), lambda b, k: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, M), jnp.float32),
            compiler_params=_params(),
            interpret=INTERPRET,
        )(x)

    dt = time_op(op, x, reps=8, iters=3)
    gb = B * N * M * 4 / 1e9
    return {"ms": round(dt * 1e3, 3), "GB": round(gb, 3),
            "GBps": round(gb / dt, 1)}


def _win_specs():
    specs = []
    for sb in range(NREF):
        def imap(b, k, sb=sb):
            j0 = (k * T - SB * sb - 7) // 8 * 8
            j0 = jnp.clip(_i32(j0), 0, M - WJ)
            return (b * LANE, _i32(sb * SB), j0)
        specs.append(pl.BlockSpec(
            (pl.Element(LANE), pl.Element(SB), pl.Element(WJ)),
            imap, memory_space=pltpu.VMEM))
    return specs


def bw_win():
    x = _x()

    def kern(*refs):
        o_ref = refs[-1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        acc = jnp.zeros((LANE, WJ), jnp.float32)
        for r in refs[:-1]:
            acc += jnp.sum(r[...], axis=1)
        o_ref[...] += acc

    def op(x, _eps=0.0):
        return pl.pallas_call(
            kern,
            grid=(Bp // LANE, NK),
            in_specs=_win_specs(),
            out_specs=pl.BlockSpec((LANE, WJ), lambda b, k: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, WJ), jnp.float32),
            compiler_params=_params(),
            interpret=INTERPRET,
        )(*([x] * NREF))

    dt = time_op(op, x, reps=8, iters=3)
    gb = Bp * NK * NREF * SB * WJ * 4 / 1e9   # bytes actually moved
    useful = B * N * M * 4 * 1.5 / 1e9        # 24/16 overlap at T=16
    return {"ms": round(dt * 1e3, 3), "GB_moved": round(gb, 3),
            "GBps_moved": round(gb / dt, 1),
            "GBps_vs_useful": round(useful / dt, 1)}


# --- 3. exact in-kernel anti-diagonal extraction ---------------------------

def extract_exact():
    """In-kernel relayout: per slot-block, transpose the (LANE, SB, WJ)
    window to SB (WJ, 128) planes, pre-roll plane r down by r (static
    amounts), and read diagonal t's slot row as the STATIC column t+8 —
    valid wherever the window offset did not clamp (interior; a real
    fused kernel only instantiates in-phase refs, whose offsets stay in
    range with a small column guard).  Edge cells are excluded from the
    comparison; the DMA pattern (and so the timing) is unaffected."""
    x = _x()
    Np, Mp, S, K2 = bm_dims(N, M)
    NKX = K2 // T

    def kern(*refs):
        o_ref = refs[-1]
        parts = []
        for sb in range(NREF):
            blk = refs[sb][...]                       # (LANE, SB, WJ)
            rows = [jnp.swapaxes(blk[:, r, :], 0, 1) for r in range(SB)]
            # roll plane r down by r: rolled[c] = rows[r][c - r], so the
            # anti-diagonal col (t - r + 8) becomes the static col t + 8
            parts.extend(pltpu.roll(rows[r], r, 0) if not INTERPRET
                         else jnp.roll(rows[r], r, 0)
                         for r in range(SB))
        arr = jnp.stack(parts, axis=0)                # (N, WJ, LANE)
        for t in range(T):
            plane = arr[:, t + 8, :]                  # (N, LANE) static
            plane = jnp.concatenate(
                [jnp.zeros((1, LANE), jnp.float32), plane,
                 jnp.zeros((S - N - 1, LANE), jnp.float32)], axis=0)
            o_ref[t] = plane

    def op(x):
        return pl.pallas_call(
            kern,
            grid=(Bp // LANE, NKX),
            in_specs=_win_specs(),
            out_specs=pl.BlockSpec((T, S, LANE),
                                   lambda b, k: (k, 0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K2, S, Bp), jnp.float32),
            compiler_params=_params(),
            interpret=INTERPRET,
        )(*([x] * NREF))

    out = np.asarray(op(x))
    ref = np.asarray(skew_input(x))                   # compact (Mp, S, Bp)
    # compare on cells whose window offset did not clamp:
    # j0 = 16k - 8sb - 8 in [0, M - WJ]
    errs = []
    for r in range(0, N + M - 1, 37):
        for s in range(1, N + 1, 29):
            j = r - s + 1
            j0 = (r // T) * T - ((s - 1) // SB) * SB - 8
            if 0 <= j < M and 0 <= j0 <= M - WJ:
                errs.append(np.max(np.abs(
                    out[r, s, :B] - ref[r % Mp, s, :B])))
    dt = time_op(lambda xx, _eps=0.0: op(xx), x, reps=4, iters=3)
    return {"max_err": float(np.max(errs)), "n_checked": len(errs),
            "ms": round(dt * 1e3, 3)}


run("minor_off16", lambda: minor_off(16))
run("minor_off8", lambda: minor_off(8))
run("bw_fullrow", bw_fullrow)
run("bw_win", bw_win)
run("extract_exact", extract_exact)
print(json.dumps(results))
