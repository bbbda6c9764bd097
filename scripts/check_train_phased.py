"""On-chip exactness gate for the phase-split training kernels: compare
grad-of-decode (theta and A gradients) and E between phased and
monolithic pallas_bm on the real chip, plus vs the CPU scan oracle
values computed in-process is not possible (single backend per process),
so the scan comparison stays in tests/; here phased-vs-monolithic on
identical Mosaic-compiled inputs is the gate.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_train_phased.py
"""
import os
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import deepblast_tpu
from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops import dp_bm, dp_bm_train

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
B, N, M = 32, 256, 200
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.asarray(rng.integers(N // 2, N + 1, B), jnp.int32)
lm = jnp.asarray(rng.integers(M // 2, M + 1, B), jnp.int32)
lens = (ln, lm)

def run(phases):
    dp_bm_train.TRAIN_PHASES = phases
    dp_ops._build.cache_clear()
    dp_bm.register(make_default=True)
    E = jax.jit(lambda t, a: dp_ops.expected_alignment(
        t, a, lens, backend="pallas_bm"))(theta, A)
    def loss(t, a):
        Ei = dp_ops.expected_alignment(t, a, lens, backend="pallas_bm")
        return jnp.sum(Ei * Ei)
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))(theta, A)
    sc = jax.jit(lambda t, a: dp_ops.alignment_score(
        t, a, lens, backend="pallas_bm"))(theta, A)
    return jax.tree_util.tree_map(np.asarray, (E, g, sc))

E1, g1, s1 = run(8)
E0, g0, s0 = run(0)
print("E max|diff|:", float(np.max(np.abs(E1 - E0))))
print("score max|diff|:", float(np.max(np.abs(s1 - s0))))
print("g_theta max|diff|:", float(np.max(np.abs(g1[0] - g0[0]))))
print("g_A max|diff|:", float(np.max(np.abs(g1[1] - g0[1]))))
print("g_theta scale:", float(np.max(np.abs(g0[0]))))
ok = (np.max(np.abs(E1 - E0)) < 1e-5 and np.max(np.abs(s1 - s0)) < 1e-3
      and np.max(np.abs(g1[0] - g0[0])) < 1e-4
      and np.max(np.abs(g1[1] - g0[1])) < 1e-4)
print("GATE", "PASS" if ok else "FAIL")
