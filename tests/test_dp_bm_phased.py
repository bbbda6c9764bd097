"""Phase-split training kernels (ops/dp_bm_train.py) vs the monolithic
batch-minor kernels and the scan oracle.

The phased kernels are the round-5 default training path
(DEEPBLAST_TRAIN_PHASES=8): windowed segment residuals + Element-indexed
in-place writes into the dense expectation streams.  They must agree
with the monolithic kernels bit-for-bit at every *consumed* cell (the
recurrences are identical, evaluated on zero-extended window planes),
and with the scan oracle to fp tolerance through both autodiff orders.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepblast_tpu.ops import dp as dp_ops
from deepblast_tpu.ops import dp_bm, dp_bm_train


def _mats(B=3, N=24, M=19, seed=0):
    rng = np.random.default_rng(seed)
    theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
    ln = jnp.asarray(rng.integers(max(2, N // 2), N + 1, B), jnp.int32)
    lm = jnp.asarray(rng.integers(max(2, M // 2), M + 1, B), jnp.int32)
    return theta, A, ln, lm


def test_train_plan_covers_every_natural_cell():
    """Every natural cell (r, c) inside the padded (Np, Mp) rectangle
    must map to a slot inside its phase's window — the invariant that
    makes the unwritten window complement safe (module docstring)."""
    from deepblast_tpu.ops.skew_bm import bm_dims
    for (N, M) in [(8, 8), (24, 19), (19, 24), (64, 16), (16, 64),
                   (40, 40), (33, 47)]:
        Np, Mp, S, K2 = bm_dims(N, M)
        for P in (1, 2, 4, 8, 16):
            plan = dp_bm_train._train_plan(K2, S, Mp, P)
            assert sum(nr for (_, nr, _, _) in plan) == K2
            # row -> (w0, w1)
            win = {}
            for (r0, nr, w0, w1) in plan:
                for r in range(r0, r0 + nr):
                    win[r] = (w0, w1)
            for r in range(Np):
                for c in range(Mp):
                    k, s = r + c, r + 1
                    w0, w1 = win[k]
                    assert w0 <= s < w1, (N, M, P, r, c, k, s, win[k])


@pytest.mark.parametrize("mode", ["nw", "sw"])
@pytest.mark.parametrize("shape", [(3, 24, 19), (2, 16, 31), (1, 17, 17)])
def test_phased_matches_monolithic_all_passes(mode, shape):
    """Direct kernel-level parity: identical recurrences evaluated on
    zero-extended window planes.  vt/E/EA match bit-for-bit; the
    second-order outputs are compared at 1-2 ULP — XLA compiles the
    monolithic and phased kernels separately and may FMA/reassociate
    the same expression DAG differently (observed 2e-10 in x64 on 3 of
    992 cells)."""
    B, N, M = shape
    theta, A, ln, lm = _mats(B, N, M)
    th = dp_bm.skew_input(theta)
    ad = dp_bm.skew_input(A)

    vt0, aux0 = dp_bm.forward_bm(th, ad, ln, lm, mode=mode)
    vt1, aux1 = dp_bm_train.forward_bm_phased(th, ad, ln, lm, mode=mode)
    np.testing.assert_array_equal(np.asarray(vt0), np.asarray(vt1))

    Et = jnp.ones((B,), jnp.float32)
    E0, EA0 = dp_bm.backward_bm(Et, aux0, ln, lm, mode=mode, want_gap=True)
    E1, EA1 = dp_bm_train.backward_bm_phased(Et, aux1, ln, lm, mode=mode,
                                             want_gap=True, nm=(N, M))
    for s0, s1 in [(E0, E1), (EA0, EA1)]:
        n0 = np.asarray(dp_bm.unskew_output(s0, N, M, B))
        n1 = np.asarray(dp_bm.unskew_output(s1, N, M, B))
        np.testing.assert_array_equal(n0, n1)

    rng = np.random.default_rng(7)
    Zt = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    Za = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    Ztd = dp_bm.skew_cotangent(Zt)
    Zad = dp_bm.skew_cotangent(Za)
    vtd0, adj0 = dp_bm.adjoint_forward_bm(aux0, Ztd, Zad, ln, lm, mode=mode)
    vtd1, adj1 = dp_bm_train.adjoint_forward_bm_phased(
        aux1, Ztd, Zad, ln, lm, mode=mode, nm=(N, M))
    np.testing.assert_array_equal(np.asarray(vtd0), np.asarray(vtd1))

    Ed0, EdA0 = dp_bm.adjoint_backward_bm(E0, aux0, adj0, ln, lm, mode=mode)
    Ed1, EdA1 = dp_bm_train.adjoint_backward_bm_phased(
        E1, aux1, adj1, ln, lm, mode=mode, nm=(N, M))
    for s0, s1 in [(Ed0, Ed1), (EdA0, EdA1)]:
        n0 = np.asarray(dp_bm.unskew_output(s0, N, M, B))
        n1 = np.asarray(dp_bm.unskew_output(s1, N, M, B))
        np.testing.assert_allclose(n0, n1, rtol=0, atol=1e-6)


def test_za_none_drops_stream_and_matches_zeros():
    """za=None (zero gap cotangent — the training decode path) must give
    the same tangents as an explicit zeros Za stream."""
    B, N, M = 3, 24, 19
    theta, A, ln, lm = _mats(B, N, M)
    th = dp_bm.skew_input(theta)
    ad = dp_bm.skew_input(A)
    _, aux = dp_bm_train.forward_bm_phased(th, ad, ln, lm)
    rng = np.random.default_rng(3)
    Ztd = dp_bm.skew_cotangent(
        jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32))
    Zzero = dp_bm.skew_cotangent(jnp.zeros((B, N, M), jnp.float32))
    vtdN, adjN = dp_bm_train.adjoint_forward_bm_phased(
        aux, Ztd, None, ln, lm, nm=(N, M))
    vtdZ, adjZ = dp_bm_train.adjoint_forward_bm_phased(
        aux, Ztd, Zzero, ln, lm, nm=(N, M))
    np.testing.assert_array_equal(np.asarray(vtdN), np.asarray(vtdZ))
    for a, b in zip(adjN[0] + adjN[1], adjZ[0] + adjZ[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["nw", "sw"])
def test_registry_second_order_vs_scan(mode):
    """The registered pallas_bm training path (phased by default) agrees
    with the scan oracle through two autodiff orders."""
    B, N, M = 2, 20, 15
    theta, A, ln, lm = _mats(B, N, M, seed=5)
    lens = (ln, lm)

    def loss(t, a, backend):
        E = dp_ops.expected_alignment(t, a, lens, mode=mode,
                                      backend=backend)
        return jnp.sum(E * E)

    gp = jax.grad(loss, argnums=(0, 1))(theta, A, "pallas_bm")
    gs = jax.grad(loss, argnums=(0, 1))(theta, A, "scan")
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                               atol=2e-5)

    def s2(t, a, backend):
        def sc(t, a):
            return jnp.sum(dp_ops.alignment_score(t, a, lens, mode=mode,
                                                  backend=backend))
        g = jax.grad(sc)(t, a)
        return jnp.sum(g * g)

    g2p = jax.grad(s2)(theta, A, "pallas_bm")
    g2s = jax.grad(s2)(theta, A, "scan")
    np.testing.assert_allclose(np.asarray(g2p), np.asarray(g2s), atol=2e-5)


def test_phased_bf16_residual_menu():
    """The d=bf16 storage menu threads through the phased kernels (the
    --dp-bf16-residuals training flag)."""
    B, N, M = 2, 24, 24
    theta, A, ln, lm = _mats(B, N, M, seed=9)
    lens = (ln, lm)
    menu = dp_bm.DTypeMenu.make(d="bfloat16")
    E32 = dp_ops.expected_alignment(theta, A, lens, backend="pallas_bm")
    E16 = dp_ops.expected_alignment(theta, A, lens, backend="pallas_bm",
                                    dtypes=menu)
    err = float(jnp.max(jnp.abs(E32 - E16)))
    assert err < 2e-2, err

    def loss(t, a, dtypes):
        E = dp_ops.expected_alignment(t, a, lens, backend="pallas_bm",
                                      dtypes=dtypes)
        return jnp.sum(E * E)

    g32 = jax.grad(loss, argnums=(0, 1))(theta, A, None)
    g16 = jax.grad(loss, argnums=(0, 1))(theta, A, menu)
    for a, b in zip(g32, g16):
        cos = float(jnp.vdot(a, b) / (jnp.linalg.norm(a)
                                      * jnp.linalg.norm(b)))
        assert cos > 0.999, cos
