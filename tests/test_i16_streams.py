"""int16 fixed-point stream storage for the batch-minor backend.

Round-2.5 dtype-menu extension: bf16 input/E storage failed the
traceback-agreement gate (8-bit mantissa; docs/PERF_NOTES.md round-2
dtype study) and fp16 does not compile on this toolchain, but int16
*fixed point* has 16-60x finer resolution at the same byte width:
inputs quantize at scale 32767/stream_range (resolution ~1e-3 at the
default range 16, error ~5e-4), expectations at scale 32767 (E in
[0, 1], resolution 3e-5).  These tests bound the E error against the
fp32 path and assert traceback agreement — interpreter mode on CPU,
natively on chip under DEEPBLAST_TEST_TPU=1; scripts/bench_check.py
re-runs the same gates at the full bench shapes.

On-chip gate result (round 3, scripts/probe_i16_streams.py): every
config compiles, agreement 1.0 / E err <2e-3 — but perf-neutral vs the
D-bf16 menu, so int16 is an accuracy-preserving option, not the bench
default.

All knobs here are *per-call* :class:`DTypeMenu` values — no module
globals, no reset fixture (VERDICT r2 weak item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from deepblast_tpu.ops import dp as dp_mod
from deepblast_tpu.ops import dp_bm
from deepblast_tpu.ops.dp_bm import DTypeMenu

I16_IN = DTypeMenu.make(stream="int16")
I16_E = DTypeMenu.make(e="int16")
I16_MENU = DTypeMenu.make(stream="int16", d="bfloat16", e="int16")
I16_IN_E = DTypeMenu.make(stream="int16", e="int16")


def _problem(B=4, N=24, M=20, seed=0):
    rng = np.random.default_rng(seed)
    theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
    ln = jnp.full((B,), N, jnp.int32)
    lm = jnp.full((B,), M, jnp.int32)
    return theta, A, ln, lm


def _decode(theta, A, ln, lm, dtypes=None):
    thetap = dp_bm.skew_input(theta, dtypes=dtypes)
    Ap = dp_bm.skew_input(A, dtypes=dtypes)
    vt, aux = dp_bm.forward_bm(thetap, Ap, ln, lm, dtypes=dtypes)
    Ediag, _ = dp_bm.backward_bm(jnp.ones_like(vt), aux, ln, lm,
                                 dtypes=dtypes)
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


def test_i16_inputs_decode_error_and_traceback():
    """int16 fixed-point input streams: ~5e-4 per-value error keeps E
    within ~2e-3 of fp32 and the greedy walk in near-perfect agreement
    (the bf16 input config that failed this gate had ~4e-3/value)."""
    theta, A, ln, lm = _problem(B=4, N=48, M=40, seed=2)
    vt32, E32 = _decode(theta, A, ln, lm)
    vt16, E16 = _decode(theta, A, ln, lm, dtypes=I16_IN)

    assert E16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(vt16), np.asarray(vt32),
                               rtol=3e-3, atol=3e-2)
    err = np.max(np.abs(np.asarray(E16) - np.asarray(E32)))
    assert err < 2e-3, f"i16-input E error {err}"
    assert _agreement(E16, E32) >= 0.97


def test_i16_expectation_segments_match_fp32():
    """int16 fixed-point E storage (scale 32767) applies on the decode
    path only: the phase-split segments quantize at 3e-5 resolution —
    far below the bf16 E rounding that broke near-tie walk comparisons —
    so dequantized segment values match the fp32 natural E to ~1e-4."""
    theta, A, ln, lm = _problem(B=3, N=40, M=36, seed=3)
    N, M = 40, 36
    E32 = np.asarray(dp_mod.expected_alignment(
        theta, A, (ln, lm), backend="pallas_bm"))
    out = dp_mod.expected_alignment_stream(
        theta, A, (ln, lm), backend="pallas_bm", dtypes=I16_E)
    assert all(s.dtype == jnp.int16 for s in out["seg"])
    acc = dp_bm._stream_accessor(
        jax.tree_util.tree_map(np.asarray, out), N, M)
    errs = [abs(acc(b, i, j) - E32[b, i, j])
            for b in range(3) for i in range(N) for j in range(M)]
    assert max(errs) < 1e-4, f"i16-E segment error {max(errs)}"


def test_i16_bench_menu_stream_decode():
    """The full i16 menu (int16 inputs + bf16 D + int16 E) through the
    phase-split stream decode: segments store int16 and the stream
    traceback agrees with the fp32 natural-layout walk."""
    theta, A, ln, lm = _problem(B=3, N=40, M=36, seed=4)
    N, M = 40, 36
    E32 = np.asarray(dp_mod.expected_alignment(
        theta, A, (ln, lm), backend="pallas_bm"))

    out = dp_mod.expected_alignment_stream(
        theta, A, (ln, lm), backend="pallas_bm", dtypes=I16_MENU)
    assert isinstance(out, dict)
    assert all(s.dtype == jnp.int16 for s in out["seg"])
    for b in range(theta.shape[0]):
        ts = dp_mod.traceback_stream(out, N, M, b, backend="pallas_bm")
        t32 = dp_mod.traceback(E32[b])
        n = max(len(ts), len(t32))
        agree = sum(x == y for x, y in zip(ts, t32)) / n
        assert agree >= 0.97, f"pair {b}: {agree}"


def test_bench_default_menu_stream_decode():
    """The bench.py default menu (D=bf16 + E=i16, fp32 inputs — the
    measured-best decode menu on chip, scripts/probe_dbf16_ei16.py):
    int16 segments, traceback agreement vs the fp32 natural walk."""
    menu = DTypeMenu.make(d="bfloat16", e="int16")
    theta, A, ln, lm = _problem(B=3, N=40, M=36, seed=11)
    N, M = 40, 36
    E32 = np.asarray(dp_mod.expected_alignment(
        theta, A, (ln, lm), backend="pallas_bm"))
    out = dp_mod.expected_alignment_stream(
        theta, A, (ln, lm), backend="pallas_bm", dtypes=menu)
    assert all(s.dtype == jnp.int16 for s in out["seg"])
    for b in range(theta.shape[0]):
        ts = dp_mod.traceback_stream(out, N, M, b, backend="pallas_bm")
        t32 = dp_mod.traceback(E32[b])
        n = max(len(ts), len(t32))
        agree = sum(x == y for x, y in zip(ts, t32)) / n
        assert agree >= 0.97, f"pair {b}: {agree}"


def test_i16_saturation_is_clipped():
    """Inputs beyond +-stream_range saturate (no integer wraparound):
    decode stays finite and E stays a valid expectation."""
    theta, A, ln, lm = _problem(B=2, N=16, M=16, seed=5)
    theta = theta.at[0, 3, 3].set(1e4)
    theta = theta.at[1, 2, 5].set(-1e4)
    vt, E = _decode(theta, A, ln, lm, dtypes=I16_IN)
    assert np.all(np.isfinite(np.asarray(vt)))
    assert np.all(np.isfinite(np.asarray(E)))
    assert np.asarray(E).max() < 1.0 + 1e-3


def test_i16_storage_dtypes_decode_only():
    """Storage dtype contract: input streams int16, terminal scores
    fp32; the VJP-serving backward keeps its E residual *float* under
    the int16 E knob (Et is an arbitrary cotangent there), and the
    adjoint expectation outputs (unbounded) are fp32 too."""
    theta, A, ln, lm = _problem(B=2, N=12, M=12, seed=1)
    menu = I16_IN_E
    thetap = dp_bm.skew_input(theta, dtypes=menu)
    assert thetap.dtype == jnp.int16
    assert dp_bm.skew_cotangent(theta, dtypes=menu).dtype == jnp.float32
    vt, aux = dp_bm.forward_bm(thetap, dp_bm.skew_input(A, dtypes=menu),
                               ln, lm, dtypes=menu)
    assert vt.dtype == jnp.float32
    Ediag, _ = dp_bm.backward_bm(jnp.ones_like(vt), aux, ln, lm,
                                 dtypes=menu)
    assert Ediag.dtype == jnp.float32  # decode-only knob

    zt = dp_bm.skew_cotangent(theta, dtypes=menu)
    za = dp_bm.skew_cotangent(A, dtypes=menu)
    _, adj_aux = dp_bm.adjoint_forward_bm(aux, zt, za, ln, lm, dtypes=menu)
    Ed, EdA = dp_bm.adjoint_backward_bm(Ediag, aux, adj_aux, ln, lm,
                                        dtypes=menu)
    assert Ed.dtype == jnp.float32
    assert EdA.dtype == jnp.float32


def test_i16_grad_path_stays_usable():
    """alignment_score remains differentiable with the int16 input knob
    on, with gradients close to the fp32 path (quantization-level
    error)."""
    theta, A, ln, lm = _problem(B=2, N=16, M=14, seed=6)

    def loss(th, a, dtypes=None):
        return jnp.sum(dp_mod.alignment_score(
            th, a, (ln, lm), backend="pallas_bm", dtypes=dtypes))

    g32 = jax.grad(loss)(theta, A)
    g16 = jax.grad(lambda th, a: loss(th, a, I16_IN))(theta, A)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               atol=2e-2)


def test_i16_scaled_cotangents_not_clipped():
    """Regression (round-2 review): cotangent streams are unbounded, so
    they bypass the saturating fixed-point skew.  A x1e4-scaled
    second-order loss and a x5-scaled score gradient must scale their
    gradients exactly — with the old quantized-cotangent path the former
    lost 100% of its gradient and the latter clipped at 1."""
    theta, A, ln, lm = _problem(B=2, N=16, M=14, seed=7)

    def e_loss(th, a, scale, dtypes=None):
        E, _ = dp_mod.expected_alignment(
            th, a, (ln, lm), backend="pallas_bm", return_gap=True,
            dtypes=dtypes)
        return scale * jnp.sum(E ** 2)

    g32 = jax.grad(lambda th, a: e_loss(th, a, 1e4))(theta, A)
    g16 = jax.grad(lambda th, a: e_loss(th, a, 1e4, I16_IN_E))(theta, A)
    ref = np.max(np.abs(np.asarray(g32)))
    assert ref > 1.0  # the scaling actually produces large cotangents
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               atol=2e-2 * ref)

    def s_loss(th, a, dtypes=None):
        return 5.0 * jnp.sum(dp_mod.alignment_score(
            th, a, (ln, lm), backend="pallas_bm", dtypes=dtypes))

    g5 = jax.grad(lambda th, a: s_loss(th, a, I16_IN_E))(theta, A)
    g5_32 = jax.grad(s_loss)(theta, A)
    # E-path is float in the VJP, so the x5 gradient is not clipped at 1
    # (residual differences come only from the input quantization)
    assert np.max(np.asarray(g5)) > 1.5
    np.testing.assert_allclose(np.asarray(g5), np.asarray(g5_32),
                               atol=0.1)


def test_dtype_menu_is_hashable_cache_key():
    """DTypeMenu normalizes to dtype-name strings, hashes stably, and
    distinct menus produce distinct _build cache entries."""
    m1 = DTypeMenu.make(stream=jnp.int16, d=jnp.bfloat16)
    m2 = DTypeMenu.make(stream="int16", d="bfloat16")
    assert m1 == m2 and hash(m1) == hash(m2)
    assert m1.stream_dtype == jnp.int16
    b1 = dp_mod._build("nw", "softmax", "pallas_bm", True, m1)
    b2 = dp_mod._build("nw", "softmax", "pallas_bm", True, None)
    b3 = dp_mod._build("nw", "softmax", "pallas_bm", True, m2)
    assert b1 is b3 and b1 is not b2
