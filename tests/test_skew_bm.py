"""Parity tests for the batch-minor relayout kernels (interpreter mode on
CPU; re-run on chip via DEEPBLAST_TEST_TPU=1)."""

import numpy as np
import pytest
import jax.numpy as jnp

from deepblast_tpu.ops.skew import skew
from deepblast_tpu.ops.skew_bm import (
    bm_dims, skew_bm, skew_bm_pair, unskew_bm)


def _rand(B, N, M, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)


@pytest.mark.parametrize("B,N,M", [
    (2, 16, 16), (3, 8, 24), (1, 24, 8), (2, 17, 13), (5, 16, 32),
])
def test_skew_bm_matches_xla_skew(B, N, M):
    x = _rand(B, N, M)
    s = skew_bm(x)
    Np, Mp, S, K2 = bm_dims(N, M)
    assert s.shape == (K2, S, -(-B // 128) * 128)
    # contract: stream[d, s, b] = x[b, s-1, d+1-s]; compare against the
    # XLA skew (skew(x)[d, b, i] = x[b, i, d-i]) shifted by the slot offset
    ref = np.asarray(skew(x))                       # (K, B, N)
    got = np.asarray(s)
    K = N + M - 1
    for d in range(K):
        for sl in range(1, N + 1):
            j = d + 1 - sl
            if 0 <= j < M:
                np.testing.assert_allclose(
                    got[d, sl, :B], ref[d, :, sl - 1], rtol=0, atol=0)


@pytest.mark.parametrize("B,N,M", [
    (2, 16, 16), (3, 8, 24), (1, 24, 8), (2, 17, 13), (5, 16, 32),
    (2, 160, 96),
])
def test_unskew_bm_roundtrip(B, N, M):
    x = _rand(B, N, M, seed=1)
    out = unskew_bm(skew_bm(x), N, M, B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0)


@pytest.mark.parametrize("B,N,M", [
    (2, 16, 16), (3, 8, 24), (1, 24, 8), (2, 17, 13), (5, 16, 32),
])
def test_skew_bm_compact_fold(B, N, M):
    """compact=True folds rows mod Mp: every *valid* cell of padded row d
    appears at compact row d % Mp, same slot/lane (the paired diagonals'
    slot windows are disjoint, so no collisions)."""
    x = _rand(B, N, M, seed=3)
    Np, Mp, S, K2 = bm_dims(N, M)
    padded = np.asarray(skew_bm(x))
    compact = np.asarray(skew_bm(x, compact=True))
    assert compact.shape[0] == Mp
    for d in range(N + M - 1):
        for sl in range(1, N + 1):
            if 0 <= d + 1 - sl < M:
                np.testing.assert_array_equal(
                    compact[d % Mp, sl, :B], padded[d, sl, :B])


@pytest.mark.parametrize("B,N,M", [
    (2, 16, 16), (3, 8, 24), (2, 17, 13), (2, 160, 96),
])
@pytest.mark.parametrize("kw", [
    {},
    {"compact": True},
    {"compact": True, "out_dtype": jnp.bfloat16},
    {"compact": True, "out_dtype": jnp.int16, "quant_scale": 4096.0},
])
def test_skew_bm_pair_matches_two_singles(B, N, M, kw):
    """The fused dual skew is bit-identical to two single calls under
    every storage menu (fp32 / compact / bf16 / int16 fixed point)."""
    x = _rand(B, N, M, seed=4)
    y = _rand(B, N, M, seed=5) - 1.0
    sx, sy = skew_bm_pair(x, y, **kw)
    np.testing.assert_array_equal(np.asarray(sx),
                                  np.asarray(skew_bm(x, **kw)))
    np.testing.assert_array_equal(np.asarray(sy),
                                  np.asarray(skew_bm(y, **kw)))


def test_skew_bm_pair_rejects_shape_mismatch():
    with pytest.raises(ValueError):
        skew_bm_pair(_rand(2, 16, 16), _rand(2, 16, 24))


def test_skew_bm_pair_rejects_dtype_mismatch():
    # the kernel would otherwise silently cast y to x.dtype, diverging
    # from what two skew_bm calls produce (ADVICE r3)
    import jax.numpy as jnp
    with pytest.raises(ValueError):
        skew_bm_pair(_rand(2, 16, 16),
                     _rand(2, 16, 16).astype(jnp.bfloat16))


def test_unskew_bm_rejects_mismatched_stream():
    x = _rand(2, 16, 24, seed=2)
    s = skew_bm(x)
    with pytest.raises(ValueError):
        unskew_bm(s, 16, 128, 2)
