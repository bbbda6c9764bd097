#!/usr/bin/env python3
"""Host-side traceback walk: native C vs Python, at the bench shape.

The device decode at the bench config is ~6 ms for B=256 len-512 pairs;
this measures the *host* postprocess that turns the decoded stream into
state strings (the part bench.py's device timing excludes but align()
users pay).  CPU-only — synthesizes a plausible E matrix directly.

Run: PYTHONPATH=/root/repo python scripts/bench_traceback.py
"""

import time

import numpy as np

import deepblast_tpu.native as native
from deepblast_tpu.ops import dp as dp_mod

B, N, M = 256, 512, 512
rng = np.random.default_rng(0)
# diagonal-ish ridge so walks look like real alignments
i = np.arange(N)[:, None]
j = np.arange(M)[None, :]
base = np.exp(-((i - j) ** 2) / 50.0).astype(np.float32)
E = base[None] + 0.01 * rng.standard_normal((B, N, M)).astype(np.float32)

assert native.get_lib() is not None, "native lib failed to build"

t0 = time.perf_counter()
fast = [dp_mod.traceback(E[b]) for b in range(B)]
t1 = time.perf_counter()

native._LIB, native._TRIED = None, True
t2 = time.perf_counter()
slow = [dp_mod.traceback(E[b]) for b in range(min(B, 16))]
t3 = time.perf_counter()

assert fast[:16] == slow
c_ms = (t1 - t0) * 1e3
py_ms = (t3 - t2) * 1e3 * (B / 16)
print(f"native C walk : {c_ms:8.1f} ms for B={B} (len {N})")
print(f"python walk   : {py_ms:8.1f} ms (extrapolated from 16 pairs)")
print(f"speedup       : {py_ms / c_ms:8.1f}x")
