"""Alignment losses (reference: deepblast/losses.py).

Vectorised, fully-batched re-designs: the reference loops over the batch in
Python and boolean-masks each pair (deepblast/losses.py:29-46); here every
loss is a single masked reduction over the padded ``(B, N, M)`` batch so the
whole loss is one fused XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "matrix_cross_entropy",
    "soft_alignment_loss",
    "soft_path_loss",
    "get_loss",
]

#: Smallest clamp the reference found numerically safe
#: (deepblast/losses.py:27).
EPS = 3e-8


def _pair_mask(G, x_len, y_len):
    B, N, M = G.shape
    i = jnp.arange(N)[None, :, None]
    j = jnp.arange(M)[None, None, :]
    inside = (i < x_len[:, None, None]) & (j < y_len[:, None, None])
    return G.astype(bool) & inside


def matrix_cross_entropy(Ytrue, Ypred, x_len, y_len, G):
    """Masked binary cross entropy, mean per pair then mean over batch
    (reference: deepblast/losses.py:9-48)."""
    mask = _pair_mask(G, x_len, y_len)
    Yp = jnp.clip(Ypred, EPS, 1 - EPS)
    ll = Ytrue * jnp.log(Yp) + (1 - Ytrue) * jnp.log(1 - Yp)
    ll = jnp.where(mask, ll, 0.0)
    count = jnp.maximum(mask.sum(axis=(1, 2)), 1)
    per_pair = -ll.sum(axis=(1, 2)) / count
    return per_pair.mean()


def soft_alignment_loss(Ytrue, Ypred, x_len, y_len, G):
    """Masked Frobenius norm of ``Ytrue - Ypred`` per pair
    (reference: deepblast/losses.py:82-118)."""
    mask = _pair_mask(G, x_len, y_len)
    d = jnp.where(mask, Ytrue - Ypred, 0.0)
    per_pair = jnp.sqrt(jnp.sum(d * d, axis=(1, 2)) + 1e-12)
    return per_pair.mean()


def soft_path_loss(P, Ypred, x_len, y_len, G):
    """Masked Frobenius norm of ``P * Ypred`` per pair
    (reference: deepblast/losses.py:51-79)."""
    mask = _pair_mask(G, x_len, y_len)
    d = jnp.where(mask, P * Ypred, 0.0)
    per_pair = jnp.sqrt(jnp.sum(d * d, axis=(1, 2)) + 1e-12)
    return per_pair.mean()


_LOSSES = {
    "cross_entropy": matrix_cross_entropy,
    "sse": soft_alignment_loss,
    "path": soft_path_loss,
}


def get_loss(name):
    if name not in _LOSSES:
        raise ValueError(f"`{name}` is not implemented.")
    return _LOSSES[name]
