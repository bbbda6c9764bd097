#!/usr/bin/env python3
"""A/B the fused dual-skew kernel (skew_bm_pair) against two single
skew_bm calls, standalone and end-to-end.

probe_fwd_i16 localized the composed-int16 decode regression to the
*paired* skew stores: two back-to-back single-skew pallas_calls measure
2.33 ms (int16) / 1.73 ms (fp32) while the standalone int16 skew is
0.38 ms — XLA serializes the calls with no DMA overlap between the
second call's input fetch and the first's compute.  skew_bm_pair puts
both potentials in ONE kernel (two in/out refs, same bytes).  This
probe interleaves fused-vs-singles 6x in one process (the decode timing
is bimodal — single shots cannot rank <1.5 ms deltas) and checks
exactness.

Arms (per dtype menu fp32 / int16-fixed-point):
  singles — jit(two skew_bm calls)
  fused   — jit(one skew_bm_pair call)
plus the end-to-end phase-split decode with DEEPBLAST_SKEW_PAIR on/off
at the bench menu (D=bf16 + E=i16) and the full-i16 menu (where the
pairing regression lives).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_skew_pair.py
"""

import json
import os

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops.dp_bm import DTypeMenu
from deepblast_tpu.ops.skew_bm import skew_bm, skew_bm_pair
from deepblast_tpu.utils.timing import time_op

B, N, M = 256, 512, 512
SCALE = 32767.0 / 64.0

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

MENU_A = DTypeMenu.make(d="bfloat16", e="int16")
MENU_I16 = DTypeMenu.make(stream="int16", d="bfloat16", e="int16")


def singles(kw):
    def f(t, a, _eps=0.0):
        return skew_bm(t, compact=True, **kw), skew_bm(a, compact=True, **kw)
    return f


def fused(kw):
    def f(t, a, _eps=0.0):
        return skew_bm_pair(t, a, compact=True, **kw)
    return f


def decode(menu, pair):
    def f(t, a, _eps=0.0):
        dp_bm.SKEW_PAIR = pair  # import-time snapshot; see dp_bm.SKEW_PAIR
        return dp_ops.expected_alignment_stream(
            t, a, (ln, lm), mode="nw", backend="pallas_bm", dtypes=menu)
    return f


ARMS = {
    "skew_fp32_singles": singles({}),
    "skew_fp32_fused": fused({}),
    "skew_i16_singles": singles(
        {"out_dtype": jnp.int16, "quant_scale": SCALE}),
    "skew_i16_fused": fused(
        {"out_dtype": jnp.int16, "quant_scale": SCALE}),
    "decode_A_singles": decode(MENU_A, False),
    "decode_A_fused": decode(MENU_A, True),
    "decode_i16_singles": decode(MENU_I16, False),
    "decode_i16_fused": decode(MENU_I16, True),
}


def main():
    # exactness first (fused == singles, both menus)
    for kw in ({}, {"out_dtype": jnp.int16, "quant_scale": SCALE}):
        sx, sy = fused(kw)(theta, A)
        rx, ry = singles(kw)(theta, A)
        assert np.array_equal(np.asarray(sx), np.asarray(rx))
        assert np.array_equal(np.asarray(sy), np.asarray(ry))
    print("# exactness: fused == singles (fp32 + i16)", flush=True)

    times = {k: [] for k in ARMS}
    for rnd in range(6):
        for name, f in ARMS.items():
            dt = time_op(f, theta, A, reps=8, iters=3)
            times[name].append(round(dt * 1e3, 2))
            print(rnd, name, times[name][-1], flush=True)

    out = {name: {"ms": ts, "min_ms": min(ts)} for name, ts in times.items()}
    for k in ("decode_A_fused", "decode_i16_fused"):
        out[k]["min_aligns_per_s"] = round(B / (out[k]["min_ms"] / 1e3))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
