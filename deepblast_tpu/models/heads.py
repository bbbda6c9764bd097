"""Match/gap embedding heads (reference: deepblast/embedding.py).

Flax re-designs of the reference's PackedSequence-aware torch modules.  All
heads map padded LM embeddings ``(B, L, D)`` to head features ``(B, L, F)``;
padding positions produce garbage that downstream consumers mask by length
(the TPU-friendly replacement for PackedSequence plumbing,
reference: deepblast/dataset/utils.py:214-251).

Note the reference's argument-shift quirk: ``DeepBLAST`` passes positional
args so that the ``--layers`` hyper-parameter lands in ``StackedCNN``'s
``k_size`` while the depth stays 2 (reference: deepblast/trainer.py:74-77 vs
deepblast/alignment.py:15,57-60 and deepblast/embedding.py:130).  Here depth
and kernel width are independent, honestly-named fields; the config layer
maps reference flag sets onto them.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class StackedCNN(nn.Module):
    """Linear embed -> n x [Conv1d(k, same) + ReLU] -> dropout
    (reference: deepblast/embedding.py:129-169)."""

    features: int
    layers: int = 2
    k_size: int = 5
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(x.shape[-1], name="embed")(x)
        for i in range(self.layers):
            h = nn.Conv(self.features, (self.k_size,), padding="SAME",
                        name=f"conv{i}")(h)
            h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h


class StackedRNN(nn.Module):
    """Linear embed -> stacked bidirectional LSTM/GRU -> dropout -> proj
    (reference: deepblast/embedding.py:85-126)."""

    hidden: int
    features: int
    layers: int = 2
    dropout: float = 0.0
    rnn_type: str = "lstm"

    @nn.compact
    def __call__(self, x, lengths=None, deterministic: bool = True):
        cell = {"lstm": nn.OptimizedLSTMCell, "gru": nn.GRUCell}[self.rnn_type]
        h = nn.Dense(x.shape[-1], name="embed")(x)
        for i in range(self.layers):
            fwd = nn.RNN(cell(self.hidden), name=f"fwd{i}")
            bwd = nn.RNN(cell(self.hidden), reverse=True,
                         keep_order=True, name=f"bwd{i}")
            hf = fwd(h, seq_lengths=lengths)
            hb = bwd(h, seq_lengths=lengths)
            h = jnp.concatenate([hf, hb], axis=-1)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.features, name="proj")(h)


class LinearHead(nn.Module):
    """Single linear head, the ``n_layers == 1`` branch of the reference
    aligner (reference: deepblast/alignment.py:63-65)."""

    features: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.Dense(self.features)(x)


class LMEmbed(nn.Module):
    """Token embedding + projected LM states, transformed
    (reference: deepblast/embedding.py:5-39)."""

    nin: int
    nout: int
    lm: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, tokens, lm_states):
        h = nn.Embed(self.nin, self.nout, name="embed")(tokens)
        h_lm = nn.Dense(self.nout, name="proj")(lm_states)
        return nn.relu(h + h_lm)


class EmbedLinear(nn.Module):
    """Embedding (+ optional LM mix) followed by a linear projection
    (reference: deepblast/embedding.py:42-82)."""

    nin: int
    nhidden: int
    nout: int
    use_lm: bool = False

    @nn.compact
    def __call__(self, tokens, lm_states=None):
        if self.use_lm:
            h = LMEmbed(self.nin, self.nhidden, name="lmembed")(
                tokens, lm_states)
            return nn.Dense(self.nout, name="proj")(h)
        h = nn.Embed(self.nin, self.nout, name="embed")(tokens)
        return h


def build_head(layer_type: str, *, embedding_dim: int, hidden_dim: int,
               layers: int, k_size: int = 5, dropout: float = 0.0,
               name=None):
    """Factory matching the reference aligner's head selection
    (reference: deepblast/alignment.py:48-65)."""
    if layers <= 1:
        return LinearHead(hidden_dim, name=name)
    if layer_type == "cnn":
        return StackedCNN(hidden_dim, layers=layers, k_size=k_size,
                          dropout=dropout, name=name)
    if layer_type == "rnn":
        return StackedRNN(hidden_dim, hidden_dim, layers=layers,
                          dropout=dropout, name=name)
    raise ValueError(f"layer type {layer_type!r} not supported")
