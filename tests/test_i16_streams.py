"""int16 fixed-point stream storage for the batch-minor backend.

Round-2.5 dtype-menu extension: bf16 input/E storage failed the
traceback-agreement gate (8-bit mantissa; docs/PERF_NOTES.md round-2
dtype study) and fp16 does not compile on this toolchain, but int16
*fixed point* has 16-60x finer resolution at the same byte width:
inputs quantize at scale 32767/STREAM_RANGE (resolution ~1e-3 at the
default range 16, error ~5e-4), expectations at scale 32767 (E in
[0, 1], resolution 3e-5).  These tests bound the E error against the
fp32 path and assert traceback agreement — interpreter mode on CPU,
natively on chip under DEEPBLAST_TEST_TPU=1; scripts/bench_check.py
re-runs the same gates at the full bench shapes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepblast_tpu.ops import dp as dp_mod
from deepblast_tpu.ops import dp_bm


@pytest.fixture
def reset_dtypes():
    yield
    dp_bm.STREAM_DTYPE = None
    dp_bm.D_DTYPE = None
    dp_bm.E_DTYPE = None
    dp_bm.STREAM_RANGE = 16.0


def _problem(B=4, N=24, M=20, seed=0):
    rng = np.random.default_rng(seed)
    theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
    ln = jnp.full((B,), N, jnp.int32)
    lm = jnp.full((B,), M, jnp.int32)
    return theta, A, ln, lm


def _decode(theta, A, ln, lm):
    thetap = dp_bm.skew_input(theta)
    Ap = dp_bm.skew_input(A)
    vt, aux = dp_bm.forward_bm(thetap, Ap, ln, lm)
    Ediag, _ = dp_bm.backward_bm(jnp.ones_like(vt), aux, ln, lm)
    N, M = theta.shape[1:]
    return vt, dp_bm.unskew_output(Ediag, N, M, theta.shape[0])


def _agreement(E1, E2):
    fracs = []
    for b in range(E1.shape[0]):
        t1 = dp_mod.traceback(np.asarray(E1[b]))
        t2 = dp_mod.traceback(np.asarray(E2[b]))
        n = max(len(t1), len(t2))
        fracs.append(sum(x == y for x, y in zip(t1, t2)) / n)
    return min(fracs)


def test_i16_inputs_decode_error_and_traceback(reset_dtypes):
    """int16 fixed-point input streams: ~5e-4 per-value error keeps E
    within ~2e-3 of fp32 and the greedy walk in near-perfect agreement
    (the bf16 input config that failed this gate had ~4e-3/value)."""
    theta, A, ln, lm = _problem(B=4, N=48, M=40, seed=2)
    vt32, E32 = _decode(theta, A, ln, lm)
    dp_bm.STREAM_DTYPE = jnp.int16
    vt16, E16 = _decode(theta, A, ln, lm)

    assert E16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(vt16), np.asarray(vt32),
                               rtol=3e-3, atol=3e-2)
    err = np.max(np.abs(np.asarray(E16) - np.asarray(E32)))
    assert err < 2e-3, f"i16-input E error {err}"
    assert _agreement(E16, E32) >= 0.97


def test_i16_expectation_stream(reset_dtypes):
    """int16 fixed-point E storage (scale 32767): quantization error is
    3e-5 — far below the bf16 E rounding that broke near-tie walk
    comparisons — so E matches to ~1e-4 and the walk agrees."""
    theta, A, ln, lm = _problem(B=4, N=48, M=40, seed=3)
    _, E32 = _decode(theta, A, ln, lm)
    dp_bm.E_DTYPE = jnp.int16
    _, E16 = _decode(theta, A, ln, lm)

    assert E16.dtype == jnp.float32  # unskew_output dequantizes
    err = np.max(np.abs(np.asarray(E16) - np.asarray(E32)))
    assert err < 1e-4, f"i16-E error {err}"
    assert _agreement(E16, E32) >= 0.98


def test_i16_bench_menu_stream_decode(reset_dtypes):
    """The candidate bench menu (int16 inputs + bf16 D + int16 E) through
    the phase-split stream decode: segments store int16 and the stream
    traceback agrees with the fp32 natural-layout walk."""
    theta, A, ln, lm = _problem(B=3, N=40, M=36, seed=4)
    N, M = 40, 36
    E32 = np.asarray(dp_mod.expected_alignment(
        theta, A, (ln, lm), backend="pallas_bm"))

    dp_bm.STREAM_DTYPE = jnp.int16
    dp_bm.D_DTYPE = jnp.bfloat16
    dp_bm.E_DTYPE = jnp.int16
    out = dp_mod.expected_alignment_stream(
        theta, A, (ln, lm), backend="pallas_bm")
    assert isinstance(out, dict)
    assert all(s.dtype == jnp.int16 for s in out["seg"])
    for b in range(theta.shape[0]):
        ts = dp_mod.traceback_stream(out, N, M, b, backend="pallas_bm")
        t32 = dp_mod.traceback(E32[b])
        n = max(len(ts), len(t32))
        agree = sum(x == y for x, y in zip(ts, t32)) / n
        assert agree >= 0.97, f"pair {b}: {agree}"


def test_i16_saturation_is_clipped(reset_dtypes):
    """Inputs beyond +-STREAM_RANGE saturate (no integer wraparound):
    decode stays finite and E stays a valid expectation."""
    theta, A, ln, lm = _problem(B=2, N=16, M=16, seed=5)
    theta = theta.at[0, 3, 3].set(1e4)
    theta = theta.at[1, 2, 5].set(-1e4)
    dp_bm.STREAM_DTYPE = jnp.int16
    vt, E = _decode(theta, A, ln, lm)
    assert np.all(np.isfinite(np.asarray(vt)))
    assert np.all(np.isfinite(np.asarray(E)))
    assert np.asarray(E).max() < 1.0 + 1e-3


def test_i16_storage_dtypes_and_adjoint_fp32_fallback(reset_dtypes):
    """Storage dtype contract: input/E streams are int16, terminal scores
    fp32; adjoint expectation outputs are unbounded so they ignore the
    int16 E knob (fp32 fallback) while dequantizing the int16 E input."""
    theta, A, ln, lm = _problem(B=2, N=12, M=12, seed=1)
    dp_bm.STREAM_DTYPE = jnp.int16
    dp_bm.E_DTYPE = jnp.int16
    thetap = dp_bm.skew_input(theta)
    assert thetap.dtype == jnp.int16
    vt, aux = dp_bm.forward_bm(thetap, dp_bm.skew_input(A), ln, lm)
    assert vt.dtype == jnp.float32
    Ediag, _ = dp_bm.backward_bm(jnp.ones_like(vt), aux, ln, lm)
    assert Ediag.dtype == jnp.int16

    dp_bm.STREAM_DTYPE = None
    zt = dp_bm.skew_input(theta)
    za = dp_bm.skew_input(A)
    _, adj_aux = dp_bm.adjoint_forward_bm(aux, zt, za, ln, lm)
    Ed, EdA = dp_bm.adjoint_backward_bm(Ediag, aux, adj_aux, ln, lm)
    assert Ed.dtype == jnp.float32
    assert EdA.dtype == jnp.float32

    # the dequantized-E adjoint matches the fp32-E adjoint closely
    dp_bm.E_DTYPE = None
    E32, _ = dp_bm.backward_bm(jnp.ones_like(vt), aux, ln, lm)
    Ed32, EdA32 = dp_bm.adjoint_backward_bm(E32, aux, adj_aux, ln, lm)
    np.testing.assert_allclose(np.asarray(EdA), np.asarray(EdA32),
                               atol=5e-4)


def test_i16_grad_path_stays_usable(reset_dtypes):
    """alignment_score remains differentiable with the int16 input knob
    on, with gradients close to the fp32 path (quantization-level
    error)."""
    import jax
    theta, A, ln, lm = _problem(B=2, N=16, M=14, seed=6)

    def loss(th, a):
        return jnp.sum(dp_mod.alignment_score(
            th, a, (ln, lm), backend="pallas_bm"))

    g32 = jax.grad(loss)(theta, A)
    dp_bm.STREAM_DTYPE = jnp.int16
    g16 = jax.grad(loss)(theta, A)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               atol=2e-2)
