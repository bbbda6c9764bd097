#!/usr/bin/env python3
"""Why does the e2e decode (12.2 ms) beat its stage sum (28 ms)?

Times an n-fold composition of the same stream-copy kernel for
n = 1, 2, 4.  If measured(n) = n*W + F, the fixed per-measured-rep
overhead F (whatever it is — scan-step sync, readback latency, barrier
cost) inflates every standalone stage number by F, and the honest
per-kernel cost is the slope W.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python scripts/probe_chain.py
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
T = 8

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((K2, S, BP)), jnp.float32)


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


blk = pl.BlockSpec((T, S, LANE), lambda b, k: (k, 0, b),
                   memory_space=pltpu.VMEM)
copy = pl.pallas_call(
    copy_kernel, grid=(BP // LANE, K2 // T), in_specs=[blk], out_specs=blk,
    out_shape=jax.ShapeDtypeStruct((K2, S, BP), jnp.float32),
)

results = {}
for n in (1, 2, 4):
    def chain(a, _eps=0.0, _n=n):
        for _ in range(_n):
            a = copy(a)
        return a
    dt = time_op(chain, x, reps=8, iters=3)
    results[f"chain{n}"] = round(dt * 1e3, 2)
    print(f"chain{n}: {dt*1e3:.2f} ms", flush=True)

c1, c2, c4 = results["chain1"], results["chain2"], results["chain4"]
W = (c4 - c2) / 2
F = c1 - W
print(json.dumps({**results, "per_kernel_ms": round(W, 2),
                  "fixed_per_rep_ms": round(F, 2)}))
