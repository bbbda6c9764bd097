#!/usr/bin/env python3
"""On-chip validation of the benchmark configuration (VERDICT round-1
weak item 1): at the exact bench shapes (B=256, 512x512) and the exact
bench dtype menu (bf16 difference residuals + int16 fixed-point E
segments — bench.py's default since round 3), bound the
expected-alignment error against the fp32 path and check greedy-traceback
agreement on both the natural and the phase-split stream walk.

Prints one JSON line: {"max_E_err", "traceback_agreement", "pairs"}.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python scripts/bench_check.py
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops import dp_bm

B, N, M = 256, 512, 512
CHECK_PAIRS = 16

rng = np.random.default_rng(0)
theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
ln = jnp.full((B,), N, jnp.int32)
lm = jnp.full((B,), M, jnp.int32)

backend = "pallas_bm" if jax.default_backend() == "tpu" else "scan"


def decode():
    return np.asarray(dp_ops.expected_alignment(
        theta, A, (ln, lm), mode="nw", backend=backend))


E32 = decode()
# the bench menu: bf16 difference residuals (the round-2 dtype study
# showed bf16 inputs/E break traceback agreement while the O(1)-range
# residuals are safe) + int16 fixed-point E segments (exact agreement
# on chip — scale-32767 quantization is monotone; probe_dbf16_ei16).
# E_DTYPE only applies to the stream decode; the natural-layout path
# below exercises the D knob.
from deepblast_tpu.ops.dp_bm import DTypeMenu
MENU = DTypeMenu.make(d=jnp.bfloat16, e=jnp.int16)
dp_bm.D_DTYPE = jnp.bfloat16
E16 = decode()

err = float(np.max(np.abs(E16 - E32)))
agree_frac = []
for b in range(CHECK_PAIRS):
    t32 = dp_ops.traceback(E32[b])
    t16 = dp_ops.traceback(E16[b])
    n = max(len(t32), len(t16))
    agree_frac.append(sum(x == y for x, y in zip(t32, t16)) / n)

# the bench measures the stream-layout decode (no unskew): its host-side
# traceback must match the natural-layout walk exactly (same E values,
# different indexing)
# (with int16 E segments, genuine <3e-5 near-ties may resolve
# differently: gate agreement rather than exact equality)
E_s = dp_ops.expected_alignment_stream(
    theta, A, (ln, lm), mode="nw", backend=backend, dtypes=MENU)
stream_agree = []
for b in range(CHECK_PAIRS):
    ts = dp_ops.traceback_stream(E_s, N, M, b, backend=backend)
    t16 = dp_ops.traceback(E16[b])
    n = max(len(ts), len(t16))
    stream_agree.append(sum(x == y for x, y in zip(ts, t16)) / n)
stream_ok = float(np.mean(stream_agree)) >= 0.995

result = {
    "max_E_err": round(err, 5),
    "traceback_agreement": round(float(np.mean(agree_frac)), 4),
    "stream_traceback_agreement": round(float(np.mean(stream_agree)), 4),
    "pairs": CHECK_PAIRS,
}
print(json.dumps(result))
assert err < 1e-2, f"bf16-D E error too large at bench scale: {err}"
assert np.mean(agree_frac) > 0.97, f"traceback agreement {agree_frac}"
assert stream_ok, f"stream-layout traceback agreement {stream_agree}"
print("PASS")
