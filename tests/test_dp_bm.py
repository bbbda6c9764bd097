"""Batch-minor pallas kernels vs. the lax.scan oracle (interpreter mode on
CPU; the same tests compile natively on TPU via DEEPBLAST_TEST_TPU=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepblast_tpu.ops import dp as dp_mod
from deepblast_tpu.ops import dp_bm, dp_scan
from deepblast_tpu.ops.skew import skew, unskew
from deepblast_tpu.ops.skew_bm import unskew_bm

MODES = ["nw", "sw"]


def _problem(rng, B, N, M, dtype=jnp.float32):
    theta = jnp.asarray(rng.standard_normal((B, N, M)), dtype)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, dtype)
    ln = jnp.asarray(rng.integers(3, N + 1, size=B))
    lm = jnp.asarray(rng.integers(3, M + 1, size=B))
    ln = ln.at[0].set(N)
    lm = lm.at[0].set(M)
    return theta, A, ln, lm


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("B,N,M", [(4, 9, 7), (3, 16, 16)])
def test_forward_backward_parity(mode, B, N, M):
    rng = np.random.default_rng(0)
    theta, A, ln, lm = _problem(rng, B, N, M)
    thetad, Ad = skew(theta), skew(A)
    thetap, Ap = dp_bm.skew_input(theta), dp_bm.skew_input(A)
    Et = jnp.asarray(rng.standard_normal(B), jnp.float32)

    vt_s, qs_s = dp_scan.forward_scan(thetad, Ad, ln, lm, mode=mode)
    vt_p, aux_p = dp_bm.forward_bm(thetap, Ap, ln, lm, mode=mode)
    np.testing.assert_allclose(vt_p, vt_s, rtol=2e-6, atol=2e-6)

    Ediag_s = dp_scan.backward_scan(Et, qs_s, ln, lm, mode=mode)
    E_s = unskew(Ediag_s, N, M, offset=1)
    Ediag_p, EA_p = dp_bm.backward_bm(Et, aux_p, ln, lm, mode=mode,
                                      want_gap=True, nm=(N, M))
    E_p = unskew_bm(Ediag_p, N, M, B)
    np.testing.assert_allclose(E_p, E_s, rtol=2e-6, atol=2e-6)

    # gap expectation EA = E * (Qx + Qy); zero outside the valid region in
    # both implementations (E is masked), so compare in full
    EA_s = unskew(Ediag_s * (qs_s[0] + qs_s[2]), N, M, offset=1)
    np.testing.assert_allclose(unskew_bm(EA_p, N, M, B), EA_s,
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("mode", MODES)
def test_adjoint_parity(mode):
    rng = np.random.default_rng(1)
    B, N, M = 3, 6, 8
    theta, A, ln, lm = _problem(rng, B, N, M)
    Zt = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    ZA = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    Et = jnp.ones(B, jnp.float32)
    thetad, Ad = skew(theta), skew(A)
    Ztd, ZAd = skew(Zt), skew(ZA)

    _, qs_s = dp_scan.forward_scan(thetad, Ad, ln, lm, mode=mode)
    Ediag_s = dp_scan.backward_scan(Et, qs_s, ln, lm, mode=mode)
    vtd_s, qds_s = dp_scan.adjoint_forward_scan(
        qs_s, Ztd, ZAd, ln, lm, mode=mode)
    Eddiag_s = dp_scan.adjoint_backward_scan(
        Ediag_s, qs_s, qds_s, ln, lm, mode=mode)
    Ed_s = unskew(Eddiag_s, N, M, offset=1)
    EdA_s = unskew(Eddiag_s * (qs_s[0] + qs_s[2])
                   + Ediag_s * (qds_s[0] + qds_s[2]), N, M, offset=1)

    thetap, Ap = dp_bm.skew_input(theta), dp_bm.skew_input(A)
    Ztp, ZAp = dp_bm.skew_input(Zt), dp_bm.skew_input(ZA)
    _, aux_p = dp_bm.forward_bm(thetap, Ap, ln, lm, mode=mode)
    Ediag_p, _ = dp_bm.backward_bm(Et, aux_p, ln, lm, mode=mode, nm=(N, M))
    vtd_p, adj_aux_p = dp_bm.adjoint_forward_bm(
        aux_p, Ztp, ZAp, ln, lm, mode=mode, nm=(N, M))
    Eddiag_p, EdA_p = dp_bm.adjoint_backward_bm(
        Ediag_p, aux_p, adj_aux_p, ln, lm, mode=mode, nm=(N, M))
    Ed_p = unskew_bm(Eddiag_p, N, M, B)

    np.testing.assert_allclose(vtd_p, vtd_s, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(Ed_p, Ed_s, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(unskew_bm(EdA_p, N, M, B), EdA_s,
                               rtol=2e-5, atol=2e-5)


def test_end_to_end_backend_parity():
    """Dispatcher-level agreement with the scan backend, incl. gradients
    (i.e. the full nested-custom_vjp wiring over the bm backend)."""
    rng = np.random.default_rng(2)
    B, N, M = 2, 5, 6
    theta, A, ln, lm = _problem(rng, B, N, M)
    W = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)

    def loss(backend):
        def f(theta, A):
            E = dp_mod.expected_alignment(
                theta, A, (ln, lm), backend=backend)
            return jnp.sum(E * W)
        return f

    l_s, g_s = jax.value_and_grad(loss("scan"), argnums=(0, 1))(theta, A)
    l_p, g_p = jax.value_and_grad(loss("pallas_bm"), argnums=(0, 1))(
        theta, A)
    np.testing.assert_allclose(l_p, l_s, rtol=1e-5)
    np.testing.assert_allclose(g_p[0], g_s[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_p[1], g_s[1], rtol=1e-4, atol=1e-5)


def test_fused_skew_pair_optin_parity(monkeypatch):
    """DEEPBLAST_SKEW_PAIR=1 routes the (theta, A) and (Zt, Za) relayouts
    through the fused dual-skew kernel — values and gradients must match
    the default single-call prelude exactly (both trace fresh: the gate
    is an import-time snapshot read at trace time, so the lru_cache key
    must not alias; we clear it to force a re-trace under the flag)."""
    rng = np.random.default_rng(5)
    B, N, M = 2, 6, 5
    theta, A, ln, lm = _problem(rng, B, N, M)
    W = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)

    def f(theta, A):
        E = dp_mod.expected_alignment(
            theta, A, (ln, lm), backend="pallas_bm")
        return jnp.sum(E * W)

    l0, g0 = jax.value_and_grad(f, argnums=(0, 1))(theta, A)
    monkeypatch.setattr(dp_bm, "SKEW_PAIR", True)
    dp_mod._build.cache_clear()
    try:
        l1, g1 = jax.value_and_grad(f, argnums=(0, 1))(theta, A)
    finally:
        monkeypatch.setattr(dp_bm, "SKEW_PAIR", False)
        dp_mod._build.cache_clear()
    np.testing.assert_allclose(l1, l0, rtol=0, atol=0)
    np.testing.assert_allclose(g1[0], g0[0], rtol=0, atol=0)
    np.testing.assert_allclose(g1[1], g0[1], rtol=0, atol=0)


@pytest.mark.parametrize("mode", ["nw", "sw"])
def test_score_only_forward_parity(mode):
    """Undifferentiated alignment_score dispatches to the score-only
    forward kernel (forward_score_bm: no residual-stream writes) — it
    must match the scan oracle exactly where the full kernel does, and
    agree with the residual-writing forward (grad path) on the same
    inputs."""
    rng = np.random.default_rng(11)
    B, N, M = 3, 7, 6
    theta, A, ln, lm = _problem(rng, B, N, M)
    vt_s = dp_mod.alignment_score(theta, A, (ln, lm), mode=mode,
                                  backend="scan")
    vt_p = dp_mod.alignment_score(theta, A, (ln, lm), mode=mode,
                                  backend="pallas_bm")
    np.testing.assert_allclose(np.asarray(vt_p), np.asarray(vt_s),
                               rtol=1e-5, atol=1e-5)

    # value under grad (full forward) must equal the score-only value
    def s(theta, A):
        return jnp.sum(dp_mod.alignment_score(
            theta, A, (ln, lm), mode=mode, backend="pallas_bm"))
    v_full, _ = jax.value_and_grad(s)(theta, A)
    np.testing.assert_allclose(float(v_full), float(jnp.sum(vt_p)),
                               rtol=1e-5)


def test_second_order_score_parity():
    """grad-of-grad of the terminal score through the bm backend vs scan —
    the reference's gradgradcheck analogue (tests/test_nw.py:69-79) and
    exactly the depth the training path needs (the loss differentiates
    through decode = the first grad of the score)."""
    rng = np.random.default_rng(3)
    B, N, M = 2, 6, 5
    theta, A, ln, lm = _problem(rng, B, N, M)
    W = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    W2 = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)

    def outer(backend):
        def score_sum(theta, A):
            vt = dp_mod.alignment_score(theta, A, (ln, lm), backend=backend)
            return jnp.sum(vt)

        def f(theta, A):
            gt, gA = jax.grad(score_sum, argnums=(0, 1))(theta, A)
            return jnp.sum(gt * W) + jnp.sum(gA * W2)
        return f

    v_s, gg_s = jax.value_and_grad(outer("scan"), argnums=(0, 1))(theta, A)
    v_p, gg_p = jax.value_and_grad(outer("pallas_bm"), argnums=(0, 1))(
        theta, A)
    np.testing.assert_allclose(v_p, v_s, rtol=1e-4)
    np.testing.assert_allclose(gg_p[0], gg_s[0], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(gg_p[1], gg_s[1], rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("backend,B,N,M", [
    ("scan", 3, 24, 17),
    ("pallas_bm", 3, 24, 17),
    # large enough for several real phase windows (K2=256 -> 8 phases)
    ("pallas_bm", 2, 128, 96),
])
def test_stream_traceback_matches_natural(backend, B, N, M):
    """expected_alignment_stream + traceback_stream (the no-unskew,
    phase-split inference path) produce exactly the natural-layout
    traceback."""
    rng = np.random.default_rng(11)
    theta, A, ln, lm = _problem(rng, B, N, M)
    E = dp_mod.expected_alignment(theta, A, (ln, lm), backend=backend)
    E_s = dp_mod.expected_alignment_stream(theta, A, (ln, lm),
                                           backend=backend)
    for b in range(B):
        n, m = int(ln[b]), int(lm[b])
        assert dp_mod.traceback_stream(E_s, n, m, b, backend=backend) == \
            dp_mod.traceback(np.asarray(E[b, :n, :m]))


def test_decode_stream_monolithic_fallback():
    """Without the decode_stream entry (the escape hatch bench.py's
    compile-failure insurance uses), expected_alignment_stream falls back
    to the monolithic kernels and traceback_stream walks the dense
    stream — same states."""
    rng = np.random.default_rng(23)
    B, N, M = 2, 48, 32
    theta, A, ln, lm = _problem(rng, B, N, M)
    be = dp_mod.get_backend("pallas_bm")[1]
    E_seg = dp_mod.expected_alignment_stream(theta, A, (ln, lm),
                                             backend="pallas_bm")
    assert isinstance(E_seg, dict)
    ds = be.pop("decode_stream")
    try:
        E_dense = dp_mod.expected_alignment_stream(theta, A, (ln, lm),
                                                   backend="pallas_bm")
        assert not isinstance(E_dense, dict)
        for b in range(B):
            n, m = int(ln[b]), int(lm[b])
            assert dp_mod.traceback_stream(E_dense, n, m, b,
                                           backend="pallas_bm") == \
                dp_mod.traceback_stream(E_seg, n, m, b,
                                        backend="pallas_bm")
    finally:
        be["decode_stream"] = ds


def test_phase_plan_covers_all_valid_slots():
    """Window-coverage invariant of the phase plan: every valid slot of
    every stream row (s in [max(1, r+2-lm), min(ln, r+1)], lengths up to
    the padded dims) lies inside its phase's [w0, w1).  Under-coverage
    silently corrupts the decode (cells read zeroed inputs and their E
    never lands in a segment) — a latent off-by-two here was reachable
    at the small T values _fit_T forces for long sequences."""
    from deepblast_tpu.ops.dp_bm import _phase_plan
    from deepblast_tpu.ops.skew_bm import bm_dims
    for N, M in [(16, 16), (48, 24), (24, 48), (129, 63), (512, 512),
                 (96, 96), (200, 72), (4096, 4096)]:
        Np, Mp, S, K2 = bm_dims(N, M)
        for T in (1, 2, 4, 8):
            if K2 % T:
                continue
            for P in (1, 4, 8, 16):
                for (k0, nk, w0, w1) in _phase_plan(K2, S, T, Mp, P):
                    for r in range(k0 * T, (k0 + nk) * T):
                        smin = max(1, r + 2 - M)
                        smax = min(N, r + 1)
                        if smin > smax:
                            continue
                        assert w0 <= smin and smax < w1, \
                            (N, M, T, P, r, smin, smax, w0, w1)


@pytest.mark.parametrize("B,N,M", [(2, 96, 40), (2, 40, 96), (1, 72, 72)])
def test_decode_stream_rectangular(B, N, M):
    """Phase windows stay correct on strongly rectangular problems in
    both orientations (the triangle geometry is asymmetric in Np/Mp)."""
    from deepblast_tpu.ops import dp_bm
    rng = np.random.default_rng(13)
    theta, A, ln, lm = _problem(rng, B, N, M)
    E_s = dp_mod.expected_alignment_stream(theta, A, (ln, lm),
                                           backend="pallas_bm")
    En = np.asarray(dp_mod.expected_alignment(theta, A, (ln, lm),
                                              backend="pallas_bm"))
    acc = dp_bm._stream_accessor(
        jax.tree_util.tree_map(np.asarray, E_s), N, M)
    for b in range(B):
        n, m = int(ln[b]), int(lm[b])
        got = np.asarray([[acc(b, i, j) for j in range(m)]
                          for i in range(n)])
        np.testing.assert_allclose(got, En[b, :n, :m], rtol=2e-5,
                                   atol=2e-6)


@pytest.mark.parametrize("mode,operator", [
    ("nw", "softmax"), ("sw", "softmax"), ("nw", "sparsemax")])
def test_decode_stream_E_parity(mode, operator):
    """The phase-split decode's windowed E segments hold exactly the
    natural-path expected alignment at every valid cell (all modes and a
    non-default operator), via the registered stream accessor."""
    from deepblast_tpu.ops import dp_bm
    rng = np.random.default_rng(7)
    B, N, M = 2, 64, 48
    theta, A, ln, lm = _problem(rng, B, N, M)
    E_s = dp_mod.expected_alignment_stream(
        theta, A, (ln, lm), mode=mode, operator=operator,
        backend="pallas_bm")
    En = np.asarray(dp_mod.expected_alignment(
        theta, A, (ln, lm), mode=mode, operator=operator,
        backend="pallas_bm"))
    acc = dp_bm._stream_accessor(
        jax.tree_util.tree_map(np.asarray, E_s), N, M)
    for b in range(B):
        n, m = int(ln[b]), int(lm[b])
        got = np.asarray([[acc(b, i, j) for j in range(m)]
                          for i in range(n)])
        np.testing.assert_allclose(got, En[b, :n, :m], rtol=2e-5,
                                   atol=2e-6)


@pytest.mark.parametrize("phases", [1, 4])
def test_decode_stream_phase_count_invariant(phases):
    """The decoded alignment must not depend on DECODE_PHASES (bench.py
    samples both P=8 and P=4 since round 5): every phase plan covers the
    same valid cells, only the segment windows differ."""
    rng = np.random.default_rng(31)
    B, N, M = 2, 128, 96
    theta, A, ln, lm = _problem(rng, B, N, M)
    E8 = dp_mod.expected_alignment_stream(theta, A, (ln, lm),
                                          backend="pallas_bm")
    old = dp_bm.DECODE_PHASES
    dp_bm.DECODE_PHASES = phases
    try:
        Ep = dp_mod.expected_alignment_stream(theta, A, (ln, lm),
                                              backend="pallas_bm")
    finally:
        dp_bm.DECODE_PHASES = old
    for b in range(B):
        n, m = int(ln[b]), int(lm[b])
        assert dp_mod.traceback_stream(Ep, n, m, b,
                                       backend="pallas_bm") == \
            dp_mod.traceback_stream(E8, n, m, b, backend="pallas_bm")
    # cell-exact, not just same walk
    get8 = dp_bm._stream_accessor(E8, N, M)
    getp = dp_bm._stream_accessor(Ep, N, M)
    for b in range(B):
        n, m = int(ln[b]), int(lm[b])
        for (i, j) in [(0, 0), (n - 1, m - 1), (n // 2, m // 3),
                       (1, m - 2), (n - 2, 1)]:
            np.testing.assert_allclose(getp(b, i, j), get8(b, i, j),
                                       rtol=0, atol=0)
