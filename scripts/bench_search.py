#!/usr/bin/env python3
"""End-to-end ``deepblast-search`` throughput on one chip.

The reference's search script is broken upstream (imports a removed
class, reference scripts/deepblast-search:9) and, when it ran, scored
pairs one batch at a time on one GPU with per-pair python slicing.
This benchmark runs this repo's working search CLI end to end — FASTA
parsing, shape-rounded padding (``--pad-multiple``), batched scoring
through the pallas_bm forward kernel, TSV output — and reports scored
pairs/second.

Protocol: train a small embed-LM model for one epoch on the synthetic
fixture corpus (to have a real checkpoint on disk), synthesize 4 query
x 1024 database sequences (len 100-250), run search once to warm the
jit caches, then time a second identical run (the steady-state a
database scan sees; the first run's bucket compiles happen once per
process).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python scripts/bench_search.py
"""

import json
import os
import sys
import tempfile
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tests.test_train import fixture_frame  # noqa: E402

AMINO = "ACDEFGHIKLMNPQRSTVWY"
NQ, NDB = 4, 1024
ON_TPU = jax.default_backend() == "tpu"
if not ON_TPU:
    NQ, NDB = 2, 8
# Scoring batch size: through the tunnel each batch pays ~6 host round
# trips (~31 ms each), so steady-state throughput scales almost linearly
# with batch size until device compute catches up (measured 208.6 pairs/s
# at 64 -> see PERF_NOTES for the 256 point).
BS = int(os.environ.get("DEEPBLAST_SEARCH_BS", 64))


def write_fasta(path, n, seed, lo=100, hi=250):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            L = int(rng.integers(lo, hi))
            seq = "".join(rng.choice(list(AMINO), L))
            f.write(f">s{seed}_{i}\n{seq}\n")


def main():
    root = tempfile.mkdtemp(prefix="bench_search_")
    train = os.path.join(root, "train.tab")
    fixture_frame(8, seed=0).to_csv(train, sep="\t", header=False,
                                    index=False)
    out = os.path.join(root, "model")
    from deepblast_tpu.cli.train import main as train_main
    rc = train_main([
        "--train-pairs", train, "--valid-pairs", train,
        "--test-pairs", train, "-o", out,
        "--embedding-dim", "128", "--hidden-dim", "256",
        "--vocab-size", "32", "--epochs", "1", "--batch-size", "8",
        "--scheduler", "none", "--dropout", "0.0", "--max-len", "64",
    ])
    assert rc == 0

    q = os.path.join(root, "q.fasta")
    db = os.path.join(root, "db.fasta")
    write_fasta(q, NQ, seed=1)
    write_fasta(db, NDB, seed=2)

    from deepblast_tpu.cli.search import main as search_main
    args = ["--query-fasta", q, "--db-fasta", db,
            "--load-from-checkpoint", out,
            "--output-file", os.path.join(root, "hits.tsv"),
            "--batch-size", str(BS), "--pad-multiple", "64"]
    t0 = time.time()
    assert search_main(args) == 0
    warm_s = time.time() - t0
    t0 = time.time()
    assert search_main(args) == 0
    hot_s = time.time() - t0
    # Per-length bucketing was deleted in round 5: 2.3x slower through
    # the tunnel (151.4 vs 353.8 pairs/s, r4) and slower on pure device
    # compute with launches priced at zero (probe_bucket_compute.py).
    n_pairs = NQ * NDB
    with open(os.path.join(root, "hits.tsv")) as f:
        n_lines = sum(1 for _ in f)
    assert n_lines == n_pairs, (n_lines, n_pairs)
    print(json.dumps({
        "pairs": n_pairs, "warm_s": round(warm_s, 1),
        "steady_s": round(hot_s, 1),
        "pairs_per_s": round(n_pairs / hot_s, 1),
        "batch_size": BS,
        "backend": "pallas_bm" if ON_TPU else "scan",
    }))


if __name__ == "__main__":
    main()
