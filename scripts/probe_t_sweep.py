#!/usr/bin/env python3
"""T-unroll x VMEM-budget sweep for the phase-split decode.

The decode's diagonal unroll is ``T = min(fit(T_FWD), fit(T_BWD))``
where ``fit`` shrinks T until double-buffered stream blocks fit
``VMEM_BUDGET`` (default 14 MB).  With the round-3 bench menu the bwd
phase carries 6 streams (~1.2 MB/row): T=8 needs ~19 MB, so the decode
silently runs T=4 — twice the grid steps round 1 measured as costly.
v5e has 128 MiB VMEM and the compiler limit is already raised to 64 MB;
the budget is just conservative.  Sweep (T_FWD/T_BWD, VMEM_BUDGET) and
time the decode under the bench menu, interleaving a baseline re-run to
control the multi-minute mode drift (see probe_bimodal).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_t_sweep.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops.dp_bm import DTypeMenu
from deepblast_tpu.utils.timing import time_op

B, N, M = 256, 512, 512
MENU = DTypeMenu.make(d="bfloat16", e="int16")

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

E_ref = None
results = {}


def run(name, T0, budget_mb):
    global E_ref
    dp_bm.T_FWD = dp_bm.T_BWD = T0
    dp_bm.VMEM_BUDGET = budget_mb * 2**20
    # the compiler's scoped-vmem limit must cover the bigger blocks
    dp_bm.VMEM_LIMIT = max(dp_bm.VMEM_LIMIT, min(120, 2 * budget_mb) * 2**20)
    try:
        out = dp_ops.expected_alignment_stream(
            theta, A, (ln, lm), mode="nw", backend="pallas_bm",
            dtypes=MENU)
        # exactness vs the baseline walk on a few pairs
        tbs = [dp_ops.traceback_stream(out, N, M, b, backend="pallas_bm")
               for b in range(4)]
        if E_ref is None:
            E_ref = tbs
        agree = np.mean([
            sum(x == y for x, y in zip(t, r)) / max(len(t), len(r))
            for t, r in zip(tbs, E_ref)])
        dt = time_op(
            lambda t, a, _eps=0.0: dp_ops.expected_alignment_stream(
                t, a, (ln, lm), mode="nw", backend="pallas_bm",
                dtypes=MENU),
            theta, A, reps=8, iters=3)
        results[name] = {"decode_ms": round(dt * 1e3, 2),
                         "aligns_per_s": round(B / dt),
                         "agreement": round(float(agree), 4)}
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
    print(name, results[name], flush=True)


# baseline first and re-run between candidates (mode-drift control)
run("base_T8_14MB_a", 8, 14)
run("T8_40MB", 8, 40)
run("base_T8_14MB_b", 8, 14)
run("T16_52MB", 16, 52)
run("base_T8_14MB_c", 8, 14)
run("T16_52MB_b", 16, 52)
run("base_T8_14MB_d", 8, 14)
dp_bm.T_FWD = dp_bm.T_BWD = 8
dp_bm.VMEM_BUDGET = 14 * 2**20
print(json.dumps(results))
