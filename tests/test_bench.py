"""bench.py supervision contract: the driver parses ONE json line from
stdout; a hung tunnel, a killed child, or a CPU-only host must all still
produce it (round 4 — BENCH_r03 was lost to an rc-124 timeout when the
axon tunnel hung at backend init)."""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _run(env_extra, timeout):
    env = dict(os.environ)
    env.update(env_extra)
    # force the CPU fallback path onto the scan backend regardless of
    # the host's plugins; the child re-pins via jax.config
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, env=env)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-500:]
    last = out.stdout.strip().split("\n")[-1]
    return json.loads(last)


def test_tiny_budget_takes_cpu_fallback():
    """A budget too small for a TPU attempt must still print one valid
    JSON artifact via the CPU-forced child."""
    rec = _run({"DEEPBLAST_BENCH_BUDGET": "150"}, timeout=300)
    assert rec["unit"] == "alignments/s"
    assert rec["value"] > 0
    assert "fallback" in rec["path"]
    # budget (150) + supervision slack: on a cold compile cache the CPU
    # child can still be running at the deadline, get pgid-killed, and the
    # parent stamps deadline + drain + cache-mirror time (ADVICE r4)
    assert rec["bench_wall_s"] < 170


def test_init_hang_is_detected_and_salvaged():
    """A child that hangs before READY (the BENCH_r03 failure mode) must
    be killed at the init timeout and the run must still emit JSON."""
    rec = _run({"DEEPBLAST_BENCH_BUDGET": "240",
                "DEEPBLAST_BENCH_INIT_TIMEOUT": "5",
                "DEEPBLAST_BENCH_FAKE_HANG": "init"}, timeout=420)
    assert rec["unit"] == "alignments/s"
    assert rec["value"] > 0
    assert "fallback" in rec["path"]
