#!/usr/bin/env python3
"""End-to-end quality evaluation (VERDICT r3 item: the first quality
number) — trains DeepBLAST on a simulated corpus and measures alignment
accuracy on held-out pairs against principled baselines.

Corpus: pairs sampled from the BLOSUM62 *joint* distribution with
affine-geometric indels (deepblast_tpu/data/substitution.py).  By
construction, classic Needleman-Wunsch with BLOSUM62 scoring is the
Bayes-matched reference for this corpus — the trained model should
approach it from below, and both should dominate the untrained model and
identity-scored NW.  (The reference's Malidup benchmark needs the PDB
corpus + manual alignments, unavailable here; this is the same
measurement protocol — roc_edges over held-out pairs,
deepblast/score.py:8-18 — on a corpus whose optimum is *known*.)

Also runs the structural leg end to end: synthetic homolog structures
built from the alignment columns (deepblast_tpu/data/dssp.py backbone
builder), model-predicted alignment -> process_alignment -> TM/PSI/RMS
(examples/structural_eval.py path, reference deepblast/metrics.py:504).

Writes docs/quality_r03.json and prints the table.  CPU by default
(scan backend; ~10 min); DEEPBLAST_QUALITY_TPU=1 runs the training on
the chip instead (pallas_bm).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/quality_eval.py
"""

import json
import os
import time

import jax

if not os.environ.get("DEEPBLAST_QUALITY_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deepblast_tpu.data import ProtT5Tokenizer, TMAlignDataset  # noqa: E402
from deepblast_tpu.data.state_utils import (  # noqa: E402
    states2edges, tmstate_f)
from deepblast_tpu.data.substitution import (  # noqa: E402
    simulate_blosum_pairs, substitution_theta)
from deepblast_tpu.eval.score import filter_gaps, roc_edges  # noqa: E402
from deepblast_tpu.ops import dp as dp_ops  # noqa: E402
from deepblast_tpu.train import DeepBLAST, DeepBLASTConfig  # noqa: E402

N_TRAIN = int(os.environ.get("DEEPBLAST_QUALITY_TRAIN", 1024))
N_VALID = int(os.environ.get("DEEPBLAST_QUALITY_VALID", 128))
N_TEST = int(os.environ.get("DEEPBLAST_QUALITY_TEST", 256))
MAXLEN = 96
EPOCHS = int(os.environ.get("DEEPBLAST_QUALITY_EPOCHS", 16))
GAP_GRID = (-1.0, -2.0, -4.0, -6.0, -8.0)


def f1_of(stats):
    tp, fp, fn = stats[0], stats[1], stats[2]
    return 2.0 * tp / max(2.0 * tp + fp + fn, 1e-9)


def frame_states(row):
    return [tmstate_f(c) for c in row.iloc[7]]


def pair_stats(true_states, pred_states):
    te = filter_gaps(true_states, states2edges(true_states))
    pe = filter_gaps(pred_states, states2edges(pred_states))
    return roc_edges(te, pe)


def summarize(all_stats):
    arr = np.asarray(all_stats, float)
    return {
        "F1": round(float(np.mean([f1_of(s) for s in all_stats])), 4),
        "perc_id": round(float(np.mean(arr[:, 3])), 4),
        "ppv": round(float(np.mean(arr[:, 4])), 4),
        "fnr": round(float(np.mean(arr[:, 5])), 4),
    }


# ---------------------------------------------------------------------------
# Model evaluation: decode + traceback per held-out pair
# ---------------------------------------------------------------------------

def eval_model(model, state, frame):
    # .copy(): TMAlignDataset renames/augments the frame's columns
    # in place, and this frame is reused across evaluations
    ds = TMAlignDataset(frame.copy(), tokenizer=model.tokenizer,
                        max_len=MAXLEN)
    val_step = model.make_val_step()
    stats = []
    n_seen = 0
    for batch in model._batches(ds, False, 0):
        _, aln, _, _ = val_step(state, model._device_batch(batch))
        aln = np.asarray(aln)
        for b in range(len(batch["x_len"])):
            n, m = int(batch["x_len"][b]), int(batch["y_len"][b])
            pred = [s for _, _, s in dp_ops.traceback(aln[b, :n, :m])]
            # true states ride in the batch — make_batches length-buckets,
            # so positional pairing against the frame would misalign
            true = list(np.asarray(batch["states"][b]))
            stats.append(pair_stats(true, pred))
            n_seen += 1
    assert n_seen == len(frame)
    return stats


# ---------------------------------------------------------------------------
# Classic NW baselines (hardmax decode over padded batches: one compile)
# ---------------------------------------------------------------------------

def nw_stats(frame, gap, scoring="blosum62"):
    B = len(frame)
    theta = np.zeros((B, MAXLEN, MAXLEN), np.float32)
    ln = np.zeros((B,), np.int32)
    lm = np.zeros((B,), np.int32)
    for k, (_, row) in enumerate(frame.iterrows()):
        x, y = row.iloc[5], row.iloc[6]
        if scoring == "blosum62":
            th = substitution_theta(x, y)
        else:                                   # identity +1/-1
            xa, ya = np.frombuffer(x.encode(), np.uint8), \
                np.frombuffer(y.encode(), np.uint8)
            th = np.where(xa[:, None] == ya[None, :], 1.0, -1.0)
        theta[k, :len(x), :len(y)] = th
        ln[k], lm[k] = len(x), len(y)
    A = np.full((B, MAXLEN, MAXLEN), gap, np.float32)
    E = dp_ops.expected_alignment(
        jnp.asarray(theta), jnp.asarray(A),
        (jnp.asarray(ln), jnp.asarray(lm)),
        operator="hardmax", backend="scan")
    E = np.asarray(E)
    stats = []
    for k, (_, row) in enumerate(frame.iterrows()):
        pred = [s for _, _, s in
                dp_ops.traceback(E[k, :ln[k], :lm[k]])]
        stats.append(pair_stats(frame_states(row), pred))
    return stats


def tune_gap(frame, scoring):
    best = None
    for g in GAP_GRID:
        f1 = summarize(nw_stats(frame, g, scoring))["F1"]
        print(f"  {scoring} gap={g}: valid F1={f1}", flush=True)
        if best is None or f1 > best[1]:
            best = (g, f1)
    return best[0]


# ---------------------------------------------------------------------------
# Structural leg: synthetic homolog structures -> TM under predicted aln
# ---------------------------------------------------------------------------

def structural_leg(model, state, frame, outdir):
    """Build a 3-D structure over each test pair's alignment columns
    (mixed helix/strand/loop segments so misalignments cost TM), carve
    the two chains out of the shared fold, and score the model's
    predicted alignment with the full FR_TM_maxsub pipeline."""
    from deepblast_tpu.data.dssp import build_backbone
    from deepblast_tpu.data.parse_pdb import AA_321
    from deepblast_tpu.eval.metrics import process_alignment

    aa_123 = {v: k for k, v in AA_321.items()}
    rng = np.random.default_rng(7)
    rows = []
    for t in range(4):
        row = frame.iloc[t]
        x, y, states = row.iloc[5], row.iloc[6], row.iloc[7]
        ncols = len(states)
        # segmented fold: random helix/strand/loop runs over the columns
        phi_psi = []
        while len(phi_psi) < ncols:
            kind = rng.integers(0, 3)
            seg = int(rng.integers(4, 12))
            if kind == 0:
                phi_psi += [(-57.0, -47.0)] * seg
            elif kind == 1:
                phi_psi += [(-139.0, 135.0)] * seg
            else:
                phi_psi += [(float(rng.uniform(-150, -50)),
                             float(rng.uniform(-60, 160)))
                            for _ in range(seg)]
        co = build_backbone(phi_psi[:ncols])
        xi = [i for i, s in enumerate(states) if s in ":1"]
        yi = [i for i, s in enumerate(states) if s in ":2"]

        def write(path, idx, seq):
            with open(path, "w") as f:
                serial = 1
                for r, i in enumerate(idx):
                    for key, lab in (("N", " N  "), ("CA", " CA "),
                                     ("C", " C  "), ("O", " O  ")):
                        px, py, pz = co[key][i]
                        f.write(
                            f"ATOM  {serial:5d} {lab} "
                            f"{aa_123.get(seq[r], 'ALA')} A{r + 1:4d}    "
                            f"{px:8.3f}{py:8.3f}{pz:8.3f}"
                            f"  1.00  0.00\n")
                        serial += 1
                f.write("TER\nEND\n")

        p0 = os.path.join(outdir, f"pair{t}_x.pdb")
        p1 = os.path.join(outdir, f"pair{t}_y.pdb")
        write(p0, xi, x)
        write(p1, yi, y)
        pred = model.align(x, y, state=state)
        sm_pred = process_alignment(pred, pdb0=p0, pdb1=p1)
        sm_true = process_alignment(states, pdb0=p0, pdb1=p1)
        rows.append({"pair": t, "TM_pred": round(float(sm_pred.TM), 4),
                     "TM_true": round(float(sm_true.TM), 4),
                     "PSI_pred": round(float(sm_pred.PSI), 4)})
        print(f"  structural pair {t}: TM(pred)={rows[-1]['TM_pred']} "
              f"TM(true)={rows[-1]['TM_true']}", flush=True)
    return rows


def main():
    t0 = time.time()
    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas_bm" if on_tpu else "scan"
    print(f"# backend={backend}", flush=True)

    train = simulate_blosum_pairs(N_TRAIN, seed=1)
    valid = simulate_blosum_pairs(N_VALID, seed=2)
    test = simulate_blosum_pairs(N_TEST, seed=3)

    cfg = DeepBLASTConfig(
        embedding_dim=64, hidden_dim=64, layers=2, vocab_size=32,
        lm_type="embed", batch_size=32, learning_rate=2e-3,
        epochs=EPOCHS, scheduler="cosine", loss="cross_entropy",
        pad_multiple=MAXLEN, max_len=MAXLEN, backend=backend,
        # DEEPBLAST_QUALITY_SEED varies model init + batch order for the
        # multi-seed dtype-menu gate (round 5; corpus seeds stay fixed so
        # menu arms are paired per seed)
        seed=int(os.environ.get("DEEPBLAST_QUALITY_SEED", "0")),
        # DEEPBLAST_QUALITY_BF16=1: train with the bf16 difference-
        # residual storage menu — end-task quality evidence for the
        # --dp-bf16-residuals flag beyond step-level grad parity
        dp_bf16_residuals=(
            os.environ.get("DEEPBLAST_QUALITY_BF16", "0") == "1"),
        # DEEPBLAST_QUALITY_SPD: steps per jitted dispatch (lax.scan
        # over stacked batches).  Trajectory-identical at dropout=0
        # (tests/test_train.py::test_multi_step_dispatch_matches_single)
        # and amortises the ~31 ms tunnel RTT that dominated the r4
        # on-chip runs (0.144 s/step at B=32, 96^2) — what makes the
        # 64k-pair protocol affordable on the chip.
        steps_per_dispatch=int(os.environ.get("DEEPBLAST_QUALITY_SPD",
                                              "1")))
    tok = ProtT5Tokenizer()
    model = DeepBLAST(cfg, tokenizer=tok)
    train_ds = TMAlignDataset(train, tokenizer=tok, max_len=MAXLEN)
    valid_ds = TMAlignDataset(valid, tokenizer=tok, max_len=MAXLEN)

    # DEEPBLAST_QUALITY_GATE=1: A/B-gate mode — skip the untrained /
    # NW-baseline / structural legs (constant across dtype-menu arms)
    # and report only the trained test accuracy
    gate_only = os.environ.get("DEEPBLAST_QUALITY_GATE", "0") == "1"

    untrained = None
    if not gate_only:
        state0 = model.init()
        untrained = summarize(eval_model(model, state0, test))
        print(f"untrained: {untrained}", flush=True)

    state, history = model.fit(train_ds, valid_ds)
    print(f"train: loss {history[0]['train_loss']:.4f} -> "
          f"{history[-1]['train_loss']:.4f}, "
          f"val {history[-1].get('validation_loss'):.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    trained = summarize(eval_model(model, state, test))
    print(f"trained: {trained}", flush=True)

    if gate_only:
        result = {
            "corpus": {"train": N_TRAIN, "valid": N_VALID, "test": N_TEST,
                       "epochs": EPOCHS, "backend": backend,
                       "seed": cfg.seed,
                       "dp_bf16_residuals": cfg.dp_bf16_residuals},
            "history": {
                "first_train_loss": round(history[0]["train_loss"], 4),
                "last_train_loss": round(history[-1]["train_loss"], 4),
                "last_val_loss": round(
                    history[-1].get("validation_loss", float("nan")), 4)},
            "alignment_accuracy": {"trained": trained},
            "wall_s": round(time.time() - t0, 1),
        }
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs",
            os.environ.get("DEEPBLAST_QUALITY_OUT", "quality_gate.json"))
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return

    g_bl = tune_gap(valid, "blosum62")
    blosum = summarize(nw_stats(test, g_bl, "blosum62"))
    print(f"blosum62 NW (gap={g_bl}): {blosum}", flush=True)

    g_id = tune_gap(valid, "identity")
    ident = summarize(nw_stats(test, g_id, "identity"))
    print(f"identity NW (gap={g_id}): {ident}", flush=True)

    outdir = "/tmp/deepblast_quality"
    os.makedirs(outdir, exist_ok=True)
    structural = structural_leg(model, state, test, outdir)

    result = {
        "corpus": {"train": N_TRAIN, "valid": N_VALID, "test": N_TEST,
                   "epochs": EPOCHS, "backend": backend,
                   "generator": "blosum62-joint + affine-geometric indels"},
        "history": {"first_train_loss": round(history[0]["train_loss"], 4),
                    "last_train_loss": round(history[-1]["train_loss"], 4),
                    "last_val_loss": round(
                        history[-1].get("validation_loss", float("nan")), 4)},
        "alignment_accuracy": {
            "trained": trained,
            "untrained": untrained,
            "nw_blosum62": {**blosum, "gap": g_bl},
            "nw_identity": {**ident, "gap": g_id},
        },
        "structural": structural,
        "wall_s": round(time.time() - t0, 1),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs",
        os.environ.get("DEEPBLAST_QUALITY_OUT", "quality_r03.json"))
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
