"""Profiling helpers (reference: the commented-out Lightning
AdvancedProfiler at scripts/deepblast-train:54 and the manual harnesses in
tests/profile_nw.py — here backed by jax.profiler)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "timed"]


@contextlib.contextmanager
def trace(logdir="/tmp/deepblast_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
