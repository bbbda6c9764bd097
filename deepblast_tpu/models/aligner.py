"""Neural alignment model (reference: deepblast/alignment.py:13-171).

``NeuralAligner`` turns frozen language-model embeddings of two sequences
into DP potentials and decodes the expected alignment:

* ``theta = softplus(zx @ zy^T)`` — per-pair match potentials
  (reference: deepblast/alignment.py:122)
* ``A = logsigmoid(gx @ gy^T)`` — per-cell gap potentials
  (reference: deepblast/alignment.py:123)
* ``aln = expected_alignment(theta, A)`` — the differentiable decode
  (reference: deepblast/alignment.py:124, deepblast/nw.py:446-458)

TPU-first design notes: the language model runs *outside* this module (it is
frozen; its activations are produced once per batch, reference's ``no_grad``
in deepblast/alignment.py:90-93), the pairwise interactions are batched
einsums that map straight onto the MXU, and decoding is the batched
wavefront DP with per-pair lengths instead of per-pair Python slicing
(reference: deepblast/alignment.py:165-169).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepblast_tpu.models.heads import build_head
from deepblast_tpu.ops import dp as dp_ops

_MODE_ALIASES = {
    "needleman-wunsch": "nw",
    "smith-waterman": "sw",
    "nw": "nw",
    "sw": "sw",
}


class NeuralAligner(nn.Module):
    """Match/gap heads over LM embeddings + differentiable DP decoding."""

    embedding_dim: int = 1024      # LM output dim (reference n_input)
    hidden_dim: int = 1024         # head feature dim (reference n_units)
    layers: int = 2
    k_size: int = 5
    dropout: float = 0.0
    layer_type: str = "cnn"
    alignment_mode: str = "needleman-wunsch"
    operator: str = "softmax"
    backend: Optional[str] = None
    matmul_dtype: Optional[str] = None   # e.g. "bfloat16" for MXU-friendly
    # per-model DP storage-dtype menu (ops.dp_bm.DTypeMenu); threaded
    # through every DP call so two models with different menus in one
    # process can't contaminate each other's traced kernels
    dp_dtypes: Optional[tuple] = None

    @property
    def mode(self):
        return _MODE_ALIASES[self.alignment_mode]

    def setup(self):
        kw = dict(embedding_dim=self.embedding_dim,
                  hidden_dim=self.hidden_dim, layers=self.layers,
                  k_size=self.k_size, dropout=self.dropout)
        self.match_embedding = build_head(self.layer_type, **kw)
        self.gap_embedding = build_head(self.layer_type, **kw)

    def blosum_factor(self, hx, lengths=None, deterministic=True):
        """Head features for one side (reference:
        deepblast/alignment.py:81-97, sans the in-module LM call).

        ``lengths`` makes the features *padding-invariant*: the stacked
        heads mix neighbouring positions (conv receptive field / reverse
        RNN), so without masking, features at the last few true positions
        depend on the pad width and pad content — scores then change with
        batch composition and length bucketing.  The reference has the
        same leak (its StackedCNN convolves the padded batch buffer,
        deepblast/embedding.py:152-168); here it is fixed and
        test-covered (tests/test_cli.py::test_search_cli_bucket_parity,
        tests/test_models.py)."""
        zx = self.match_embedding(hx, lengths=lengths,
                                  deterministic=deterministic)
        gx = self.gap_embedding(hx, lengths=lengths,
                                deterministic=deterministic)
        return zx, gx

    def potentials(self, hx, hy, lengths=None, deterministic=True):
        """Match and gap potential matrices ``(B, N, M)``."""
        ln, lm = lengths if lengths is not None else (None, None)
        zx, gx = self.blosum_factor(hx, ln, deterministic)
        zy, gy = self.blosum_factor(hy, lm, deterministic)
        if self.matmul_dtype is not None:
            dt = jnp.dtype(self.matmul_dtype)
            zx, zy, gx, gy = (v.astype(dt) for v in (zx, zy, gx, gy))
        match = jnp.einsum("bid,bjd->bij", zx, zy,
                           preferred_element_type=jnp.float32)
        gap = jnp.einsum("bid,bjd->bij", gx, gy,
                         preferred_element_type=jnp.float32)
        theta = jax.nn.softplus(match)
        A = jax.nn.log_sigmoid(gap)
        return theta, A

    def __call__(self, hx, hy, lengths=None, deterministic=True):
        """Returns ``(aln, theta, A)`` like the reference forward
        (reference: deepblast/alignment.py:99-125)."""
        theta, A = self.potentials(hx, hy, lengths, deterministic)
        aln = dp_ops.expected_alignment(
            theta, A, lengths, mode=self.mode, operator=self.operator,
            backend=self.backend, dtypes=self.dp_dtypes)
        return aln, theta, A

    def score(self, hx, hy, lengths=None):
        """Terminal alignment scores (reference:
        deepblast/alignment.py:127-137)."""
        theta, A = self.potentials(hx, hy, lengths, deterministic=True)
        return dp_ops.alignment_score(
            theta, A, lengths, mode=self.mode, operator=self.operator,
            backend=self.backend, dtypes=self.dp_dtypes)
