"""``deepblast-search`` — score query x database FASTA pairs
(reference: scripts/deepblast-search, which is stale/broken upstream:
it imports a removed class, scripts/deepblast-search:9).

Beyond the reference (which runs on one GPU): with more than one device
and ``--mesh auto`` (the default), scoring batches are sharded over the
``data`` axis of a device mesh — parameters replicated, pairs split —
so database scans scale across a TPU slice the same way training does.

Batch formation supports optional length bucketing (``--length-buckets``):
pairs accumulate per (padded-x-len, padded-y-len) bucket and flush when
a bucket fills, so short pairs never pay a long pair's padded compute
and every bucket compiles exactly one fixed-shape program (tail flushes
replicate their last row instead of triggering ragged-shape recompiles).
Off by default: through a high-RTT tunnel the per-launch host round
trips dominate scan cost, and fewer launches beat less padded compute
(measured 353.8 vs 151.4 pairs/s at the bench_search config —
docs/PERF_NOTES.md round 4).  With bucketing on, output rows appear in
flush order, not strict input order — the TSV is a score table, not a
stream.
"""

from __future__ import annotations

import argparse
from types import SimpleNamespace

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser("deepblast-search")
    parser.add_argument("--query-fasta", type=str, required=True)
    parser.add_argument("--db-fasta", type=str, required=True)
    parser.add_argument("--load-from-checkpoint", type=str, required=True,
                        help="model output directory (with config.json)")
    parser.add_argument("--output-file", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=10)
    parser.add_argument("--mesh", choices=["auto", "none"], default="auto",
                        help="shard scoring batches over the data axis of "
                             "a device mesh when >1 device is visible")
    parser.add_argument("--length-buckets", action="store_true",
                        help="accumulate pairs into per-length batch "
                             "buckets (less padded compute, more "
                             "launches). Off by default: through a "
                             "high-RTT tunnel the per-launch round "
                             "trips dominate — measured 353.8 pairs/s "
                             "unbucketed vs 151.4 bucketed at the "
                             "bench_search config (PERF_NOTES r4); "
                             "worth enabling when device compute, not "
                             "dispatch, is the bottleneck")
    parser.add_argument("--pad-multiple", type=int, default=64,
                        help="round padded sequence lengths up to this "
                             "multiple so batch shapes bucket and the "
                             "scorer compiles a handful of programs "
                             "instead of one per batch")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepblast_tpu.data.dataset import FastaDataset
    from deepblast_tpu.data.state_utils import pad_sequences
    from deepblast_tpu.train.checkpoint import load_model

    model = load_model(args.load_from_checkpoint)
    ds = FastaDataset(args.query_fasta, args.db_fasta,
                      tokenizer=model.tokenizer)

    mesh = None
    dp = 1
    # jit the scorer in BOTH paths: eager score_pairs dispatches each op
    # separately (~31 ms tunnel RTT each — measured 860 ms/batch vs
    # <10 ms jitted at the bench_search shapes).  Params ride as explicit
    # jit args, never closure constants (XLA constant-folds large
    # closures through layout ops; CLAUDE.md gotcha).
    if args.mesh == "auto" and len(jax.devices()) > 1:
        from deepblast_tpu.parallel import mesh as mesh_lib
        dp = len(jax.devices())  # flush() pads the batch up to dp shards
        mesh = mesh_lib.make_mesh(dp=dp, tp=1)
        repl = mesh_lib.replicated_sharding(mesh)
        params = jax.device_put(model.state.params, repl)
        lm_params = jax.device_put(model.state.lm_params, repl) \
            if model.state.lm_params is not None else None
        bsh = mesh_lib.batch_sharding(mesh)

    else:
        params = model.state.params
        lm_params = model.state.lm_params

    @jax.jit
    def _score(params, lm_params, batch):
        state = SimpleNamespace(params=params, lm_params=lm_params)
        return model.score_pairs(state, batch)

    def _pad_bucketed(seqs):
        # bucket padded lengths so batch shapes repeat and the jitted
        # scorer compiles once per bucket, not once per flush
        toks, lens = pad_sequences(seqs)
        pm = max(1, args.pad_multiple)
        L = -(-toks.shape[1] // pm) * pm
        if L != toks.shape[1]:
            toks = np.pad(toks, ((0, 0), (0, L - toks.shape[1])))
        return toks, lens

    pm = max(1, args.pad_multiple)

    def bucket_key(item):
        # route each pair to a (padded-x-len, padded-y-len) bucket so a
        # batch never pads short pairs up to an unrelated long pair's
        # length — at len 100-250 with pm=64 a mixed batch pays max-len
        # compute for every row; bucketed batches pay their own length
        if not args.length_buckets:
            return (0, 0)
        return (-(-len(item["x"]) // pm) * pm,
                -(-len(item["y"]) // pm) * pm)

    # every launch is padded (tail item replicated) to the same row
    # count, so each bucket compiles exactly one program — partial
    # flushes at end-of-scan reuse it instead of compiling per ragged
    # tail shape; drain() slices the replicas back off
    full = args.batch_size
    if mesh is not None and full % dp:
        full += dp - full % dp

    def dispatch(items):
        """Tokenize, pad, and launch one scoring batch (async dispatch —
        jax returns before the device finishes)."""
        its = items + [items[-1]] * (full - len(items))
        xs, xl = _pad_bucketed([it["x"] for it in its])
        ys, yl = _pad_bucketed([it["y"] for it in its])
        batch = dict(x=jnp.asarray(xs), y=jnp.asarray(ys),
                     x_len=jnp.asarray(xl), y_len=jnp.asarray(yl))
        if mesh is not None:
            batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        return items, _score(params, lm_params, batch), xl, yl

    def drain(pending, out):
        # the device-to-host readback happens one batch late, so host
        # tokenization of batch k+1 overlaps device compute of batch k
        # (the trainer's deferred-loss-readback pattern)
        items, dev_scores, xl, yl = pending
        scores = np.asarray(dev_scores)[:len(items)]
        for it, s, ql, dl in zip(items, scores, xl, yl):
            norm = s / (float(ql) * float(dl))
            out.write(f"{it['qid']}\t{it['dbid']}\t"
                      f"{np.round(s, 4)}\t{np.round(norm, 4)}\n")

    from collections import deque

    with open(args.output_file, "w") as out:
        # a 2-deep in-flight queue: host collate of batch k+2 overlaps
        # device compute of k+1 while k's readback completes — per-launch
        # host round trips dominate tunnel-attached scans
        buckets, inflight = {}, deque()

        def launch(items):
            if len(inflight) >= 2:
                drain(inflight.popleft(), out)
            inflight.append(dispatch(items))

        for item in ds:
            k = bucket_key(item)
            b = buckets.setdefault(k, [])
            b.append(item)
            if len(b) >= args.batch_size:
                launch(b)
                buckets[k] = []
        # End-of-scan leftovers: flushing each partial bucket separately
        # costs one fixed-overhead launch per bucket; instead merge them
        # all, sorted longest-first so chunks stay near-homogeneous, and
        # launch ceil(n/batch_size) packed batches (each pads to its own
        # chunk max — _pad_bucketed rounds to the same bucket grid, so
        # no new program shapes are introduced beyond the grid).
        left = [it for b in buckets.values() for it in b]
        left.sort(key=bucket_key, reverse=True)
        for i in range(0, len(left), args.batch_size):
            launch(left[i:i + args.batch_size])
        while inflight:
            drain(inflight.popleft(), out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
