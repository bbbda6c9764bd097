"""Fused blocked kernels vs. the scan oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepblast_tpu.ops import dp_fused, dp_scan
from deepblast_tpu.ops.skew import skew, unskew

MODES = ["nw", "sw"]


def _problem(rng, B, N, M):
    theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
    ln = jnp.asarray(rng.integers(3, N + 1, size=B))
    lm = jnp.asarray(rng.integers(3, M + 1, size=B))
    ln = ln.at[0].set(N)
    lm = lm.at[0].set(M)
    return theta, A, ln, lm


@pytest.mark.parametrize("mode", MODES)
def test_forward_fused_matches_scan(mode):
    rng = np.random.default_rng(0)
    B, N, M = 3, 11, 9
    theta, A, ln, lm = _problem(rng, B, N, M)
    vt_s, qs_s = dp_scan.forward_scan(
        skew(theta), skew(A), ln, lm, mode=mode)
    vt_f, res = dp_fused.forward_fused(theta, A, ln, lm, mode=mode)
    np.testing.assert_allclose(vt_f, vt_s, rtol=2e-6, atol=2e-6)
    for comp, name in zip(qs_s, ["qx", "qm", "qy"]):
        ref = np.asarray(unskew(comp, N, M, offset=1))
        np.testing.assert_allclose(
            np.asarray(res[name])[:B, :N, :M], ref, rtol=2e-6, atol=2e-6,
            err_msg=name)


@pytest.mark.parametrize("mode", MODES)
def test_backward_fused_matches_scan(mode):
    rng = np.random.default_rng(1)
    B, N, M = 3, 10, 13
    theta, A, ln, lm = _problem(rng, B, N, M)
    Et = jnp.asarray(rng.standard_normal(B), jnp.float32)
    _, qs_s = dp_scan.forward_scan(skew(theta), skew(A), ln, lm, mode=mode)
    E_ref = np.asarray(unskew(
        dp_scan.backward_scan(Et, qs_s, ln, lm, mode=mode),
        N, M, offset=1))
    _, res = dp_fused.forward_fused(theta, A, ln, lm, mode=mode)
    E = dp_fused.backward_fused(Et, res, ln, lm, mode=mode)
    np.testing.assert_allclose(np.asarray(E), E_ref, rtol=2e-6, atol=2e-6)


def test_multi_block_shapes():
    """Shapes that span several (RB, MB) blocks exercise the boundary
    carries; use small blocks via monkeypatching."""
    rng = np.random.default_rng(2)
    B, N, M = 2, 20, 27
    old_rb, old_mb = dp_fused.RB, dp_fused.MBK
    dp_fused.RB, dp_fused.MBK = 8, 8
    try:
        theta, A, ln, lm = _problem(rng, B, N, M)
        Et = jnp.ones((B,), jnp.float32)
        vt_s, qs_s = dp_scan.forward_scan(
            skew(theta), skew(A), ln, lm, mode="nw")
        vt_f, res = dp_fused.forward_fused(theta, A, ln, lm, mode="nw")
        np.testing.assert_allclose(vt_f, vt_s, rtol=2e-5, atol=2e-5)
        E_ref = np.asarray(unskew(
            dp_scan.backward_scan(Et, qs_s, ln, lm, mode="nw"),
            N, M, offset=1))
        E = dp_fused.backward_fused(Et, res, ln, lm, mode="nw")
        np.testing.assert_allclose(np.asarray(E), E_ref,
                                   rtol=2e-5, atol=2e-5)
    finally:
        dp_fused.RB, dp_fused.MBK = old_rb, old_mb
