"""Device-compute A/B for `--length-buckets` (VERDICT r4 item 8).

Round 4 measured bucketing 2.3x SLOWER end-to-end through the tunnel
(151 vs 354 pairs/s): a scan becomes ~25 launches instead of 16 and each
launch pays fixed host round trips.  The feature's *motivating* claim is
for a locally-attached chip where dispatch is ~us and device compute
dominates.  This probe tests exactly that claim by timing the scoring
step's DEVICE COMPUTE per shape (time_op: in-jit repetitions, dispatch
subtracted) and summing over the batch-shape multiset an actual
4096-pair scan produces under each strategy — i.e. the wall-clock a
local-attach scan would see, with launches priced at zero (maximally
favorable to bucketing).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bucket_compute.py
"""

import json
import os
from collections import Counter

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepblast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from deepblast_tpu.train import DeepBLAST, DeepBLASTConfig  # noqa: E402
from deepblast_tpu.utils.timing import time_op  # noqa: E402

BS = int(os.environ.get("PROBE_BS", "256"))
PAD = 64
NQ, NDB = 4, 1024
LO, HI = 100, 250


def bucket(n):
    return -(-n // PAD) * PAD


def batch_shapes():
    """Replicate the search CLI's batching on the bench_search corpus:
    returns {strategy: Counter((qlen_pad, dlen_pad) -> n_batches)}."""
    rng = np.random.default_rng(1)
    qlens = [int(rng.integers(LO, HI)) for _ in range(NQ)]
    rng = np.random.default_rng(2)
    dlens = [int(rng.integers(LO, HI)) for _ in range(NDB)]
    pairs = [(q, d) for q in qlens for d in dlens]  # query-major stream

    unbucketed = Counter()
    buf = []
    for p in pairs:
        buf.append(p)
        if len(buf) == BS:
            unbucketed[(bucket(max(q for q, _ in buf)),
                        bucket(max(d for _, d in buf)))] += 1
            buf = []
    if buf:
        unbucketed[(bucket(max(q for q, _ in buf)),
                    bucket(max(d for _, d in buf)))] += 1

    bucketed = Counter()
    groups = Counter()
    for (q, d) in pairs:
        groups[(bucket(q), bucket(d))] += 1
    for shape, n in groups.items():
        bucketed[shape] += -(-n // BS)
    return {"unbucketed": unbucketed, "bucketed": bucketed}


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = DeepBLASTConfig(embedding_dim=128, hidden_dim=256, layers=2,
                          vocab_size=32, lm_type="embed", max_len=512,
                          pad_multiple=PAD)
    model = DeepBLAST(cfg)
    state = model.init()
    params, lm_params = state.params, state.lm_params

    def score_fn(x, y, xl, yl, _eps=0.0):
        hx, hy = model._embeddings(params, lm_params,
                                   dict(x=x, y=y, x_len=xl, y_len=yl))
        from deepblast_tpu.models.aligner import NeuralAligner
        theta, A = model.aligner.apply(
            {"params": params["aligner"]}, hx, hy, (xl, yl),
            method=NeuralAligner.potentials)
        from deepblast_tpu.ops import dp as dp_ops
        return dp_ops.alignment_score(theta, A, (xl, yl),
                                      mode=model.aligner.mode,
                                      backend=cfg.backend)

    shapes = batch_shapes()
    all_shapes = set()
    for c in shapes.values():
        all_shapes |= set(c)
    per_shape = {}
    rng = np.random.default_rng(0)
    for (Lq, Ld) in sorted(all_shapes):
        x = jnp.asarray(rng.integers(0, 25, (BS, Lq)), jnp.int32)
        y = jnp.asarray(rng.integers(0, 25, (BS, Ld)), jnp.int32)
        xl = jnp.full((BS,), Lq, jnp.int32)
        yl = jnp.full((BS,), Ld, jnp.int32)
        dt = time_op(score_fn, x, y, xl, yl, reps=8, iters=3)
        per_shape[(Lq, Ld)] = dt
        print(f"shape ({Lq},{Ld}): {dt*1e3:.3f} ms/batch", flush=True)

    out = {}
    for strat, counter in shapes.items():
        total = sum(per_shape[s] * n for s, n in counter.items())
        out[strat] = {
            "launches": sum(counter.values()),
            "device_compute_s": round(total, 4),
            "pairs_per_s_compute_only": round(NQ * NDB / total, 1),
        }
    out["verdict"] = ("bucketing wins on device compute"
                      if out["bucketed"]["device_compute_s"]
                      < out["unbucketed"]["device_compute_s"]
                      else "bucketing loses even at zero dispatch cost")
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
