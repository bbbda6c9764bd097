"""Pallas wavefront kernels vs. the lax.scan oracle (interpreter mode on
CPU; the same tests compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepblast_tpu.ops import dp as dp_mod
from deepblast_tpu.ops import dp_pallas, dp_scan
from deepblast_tpu.ops.skew import skew, unskew

MODES = ["nw", "sw"]


@pytest.mark.parametrize("B,N,M", [(4, 9, 7), (3, 16, 16), (5, 30, 13)])
def test_shear_relayout_parity(B, N, M):
    """skew_pallas/unskew_pallas shear kernels vs the XLA layout ops."""
    from deepblast_tpu.ops.skew_pallas import skew_pallas, unskew_pallas
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    K = N + M - 1
    Bp, L = B + 3, 128  # deliberately non-trivial batch padding
    got = skew_pallas(x, Bp, L)
    ref = jnp.pad(skew(x), ((0, 0), (0, Bp - B), (1, L - N - 1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)

    s = jnp.asarray(rng.standard_normal((K, Bp, L)), jnp.float32)
    mul = (jnp.asarray(rng.standard_normal((K, Bp, L)), jnp.float32),
           jnp.asarray(rng.standard_normal((K, Bp, L)), jnp.float32))
    gotu = unskew_pallas(s, N, M, B)
    refu = unskew(s, N, M, offset=1)[:B]
    np.testing.assert_allclose(np.asarray(gotu), np.asarray(refu), atol=0)
    gotm = unskew_pallas(s, N, M, B, mul=mul)
    refm = unskew(s * (mul[0] + mul[1]), N, M, offset=1)[:B]
    np.testing.assert_allclose(np.asarray(gotm), np.asarray(refm),
                               rtol=1e-6, atol=1e-6)

    # unroll-padded buffers (K2 > K rows): pad rows must never leak
    K2 = K + 8 - K % 8 if K % 8 else K + 8
    s2 = jnp.concatenate(
        [s, jnp.full((K2 - K, Bp, 128), jnp.nan, jnp.float32)], axis=0)
    gotp = unskew_pallas(s2, N, M, B)
    np.testing.assert_allclose(np.asarray(gotp), np.asarray(refu), atol=0)


def _problem(rng, B, N, M, dtype=jnp.float32):
    theta = jnp.asarray(rng.standard_normal((B, N, M)), dtype)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, dtype)
    ln = jnp.asarray(rng.integers(3, N + 1, size=B))
    lm = jnp.asarray(rng.integers(3, M + 1, size=B))
    ln = ln.at[0].set(N)
    lm = lm.at[0].set(M)
    return theta, A, ln, lm


@pytest.mark.parametrize("mode", MODES)
def test_forward_backward_parity(mode):
    rng = np.random.default_rng(0)
    B, N, M = 4, 9, 7
    theta, A, ln, lm = _problem(rng, B, N, M)
    thetad, Ad = skew(theta), skew(A)
    thetap, Ap = dp_pallas.skew_input(theta), dp_pallas.skew_input(A)
    Et = jnp.asarray(rng.standard_normal(B), jnp.float32)

    vt_s, qs_s = dp_scan.forward_scan(thetad, Ad, ln, lm, mode=mode)
    vt_p, qs_p = dp_pallas.forward_pallas(thetap, Ap, ln, lm, mode=mode)
    np.testing.assert_allclose(vt_p, vt_s, rtol=2e-6, atol=2e-6)

    E_s = unskew(dp_scan.backward_scan(Et, qs_s, ln, lm, mode=mode),
                 N, M, offset=1)
    E_p = unskew(dp_pallas.backward_pallas(Et, qs_p, ln, lm, mode=mode,
                                           nm=(N, M)),
                 N, M, offset=1)[:B]
    np.testing.assert_allclose(E_p, E_s, rtol=2e-6, atol=2e-6)

    # q is an opaque residual: the pallas backend leaves it unmasked
    # outside the valid region, so compare valid cells only
    lnn = np.asarray(ln)
    lmn = np.asarray(lm)
    lo = dp_scan.MODE_BOUNDS[mode][0] - 1
    for a, b in zip(qs_p, qs_s):
        ua = np.asarray(unskew(a, N, M, offset=1))[:B]
        ub = np.asarray(unskew(b, N, M, offset=1))
        for bi in range(B):
            np.testing.assert_allclose(
                ua[bi, lo:lnn[bi], lo:lmn[bi]],
                ub[bi, lo:lnn[bi], lo:lmn[bi]],
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
    Ed_s = unskew(dp_scan.adjoint_backward_scan(
        Ediag_s, qs_s, qds_s, ln, lm, mode=mode), N, M, offset=1)

    thetap, Ap = dp_pallas.skew_input(theta), dp_pallas.skew_input(A)
    Ztp, ZAp = dp_pallas.skew_input(Zt), dp_pallas.skew_input(ZA)
    _, qs_p = dp_pallas.forward_pallas(thetap, Ap, ln, lm, mode=mode)
    Ediag_p = dp_pallas.backward_pallas(Et, qs_p, ln, lm, mode=mode,
                                        nm=(N, M))
    vtd_p, qds_p = dp_pallas.adjoint_forward_pallas(
        qs_p, Ztp, ZAp, ln, lm, mode=mode, nm=(N, M))
    Ed_p = unskew(dp_pallas.adjoint_backward_pallas(
        Ediag_p, qs_p, qds_p, ln, lm, mode=mode, nm=(N, M)),
        N, M, offset=1)[:B]

    np.testing.assert_allclose(vtd_p, vtd_s, rtol=2e-5, atol=2e-5)
    qd_p = np.asarray(unskew(qds_p[0], N, M, offset=1))[:B]
    qd_s = np.asarray(unskew(qds_s[0], N, M, offset=1))
    lo = dp_scan.MODE_BOUNDS[mode][2] - 1
    for bi in range(B):
        n, mm = int(ln[bi]), int(lm[bi])
        np.testing.assert_allclose(qd_p[bi, lo:n, lo:mm],
                                   qd_s[bi, lo:n, lo:mm],
                                   rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(Ed_p, Ed_s, rtol=2e-5, atol=2e-5)


def test_end_to_end_backend_parity():
    """alignment_score/expected_alignment through the dispatcher must agree
    between backends, including gradients."""
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
    l_p, g_p = jax.value_and_grad(loss("pallas"), argnums=(0, 1))(theta, A)
    np.testing.assert_allclose(l_p, l_s, rtol=1e-5)
    np.testing.assert_allclose(g_p[0], g_s[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_p[1], g_s[1], rtol=1e-4, atol=1e-5)


def test_pallas_long_backend_matches_scan():
    """The long-sequence variant (XLA relayouts + pallas DP kernels) is
    end-to-end consistent with the scan oracle, including second order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepblast_tpu.ops import dp as dp_mod

    rng = np.random.default_rng(11)
    B, N, M = 3, 24, 17
    theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
    ln = jnp.asarray([N, 9, 20]); lm = jnp.asarray([M, 8, 11])
    W = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)

    def loss(t, a, backend):
        E = dp_mod.expected_alignment(t, a, (ln, lm), backend=backend)
        return jnp.sum(E * W), E

    (l_s, E_s), g_s = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(theta, A, "scan")
    (l_p, E_p), g_p = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(theta, A, "pallas_long")
    np.testing.assert_allclose(E_p, E_s, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g_p[0], g_s[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g_p[1], g_s[1], rtol=2e-5, atol=2e-5)
