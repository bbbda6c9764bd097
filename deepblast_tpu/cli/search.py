"""``deepblast-search`` — score query x database FASTA pairs
(reference: scripts/deepblast-search, which is stale/broken upstream:
it imports a removed class, scripts/deepblast-search:9)."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser("deepblast-search")
    parser.add_argument("--query-fasta", type=str, required=True)
    parser.add_argument("--db-fasta", type=str, required=True)
    parser.add_argument("--load-from-checkpoint", type=str, required=True,
                        help="model output directory (with config.json)")
    parser.add_argument("--output-file", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=10)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from deepblast_tpu.data.dataset import FastaDataset
    from deepblast_tpu.data.state_utils import pad_sequences
    from deepblast_tpu.train.checkpoint import load_model

    model = load_model(args.load_from_checkpoint)
    ds = FastaDataset(args.query_fasta, args.db_fasta,
                      tokenizer=model.tokenizer)

    def flush(items, out):
        xs, xl = pad_sequences([it["x"] for it in items])
        ys, yl = pad_sequences([it["y"] for it in items])
        batch = dict(x=jnp.asarray(xs), y=jnp.asarray(ys),
                     x_len=jnp.asarray(xl), y_len=jnp.asarray(yl))
        scores = np.asarray(model.score_pairs(model.state, batch))
        for it, s, ql, dl in zip(items, scores, xl, yl):
            norm = s / (float(ql) * float(dl))
            out.write(f"{it['qid']}\t{it['dbid']}\t"
                      f"{np.round(s, 4)}\t{np.round(norm, 4)}\n")

    with open(args.output_file, "w") as out:
        items = []
        for item in ds:
            items.append(item)
            if len(items) == args.batch_size:
                flush(items, out)
                items = []
        if items:
            flush(items, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
