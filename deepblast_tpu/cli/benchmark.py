"""``deepblast-benchmark`` — kernel/throughput sweeps.

Replicates the reference perf harness configs (batch {4..256} at 800x800 and
lengths {64..1024} at B=64, reference: deepblast/tests/profile_nw.py:45-76;
mean fwd+bwd at B=1024 800x800, reference: deepblast/tests/cuda_timing.py)
plus backend and pass-depth dimensions specific to this framework.
"""

from __future__ import annotations

import argparse
import json
import time


def make_menu(name):
    """Named storage-dtype menus (see ops/dp_bm.py DTypeMenu)."""
    if name in (None, "fp32"):
        return None
    import jax.numpy as jnp

    from deepblast_tpu.ops.dp_bm import DTypeMenu
    return {
        # the --dp-bf16-residuals training config
        "d-bf16": DTypeMenu.make(d=jnp.bfloat16),
        # everything 16-bit that passes its gate (inference/bench only)
        "all-bf16": DTypeMenu.make(stream=jnp.bfloat16, d=jnp.bfloat16,
                                   e=jnp.bfloat16),
        "i16": DTypeMenu.make(stream=jnp.int16, d=jnp.bfloat16,
                              e=jnp.int16),
    }[name]


def run_config(B, N, M, mode, backend, depth, iters, reps=4, dtypes=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepblast_tpu.ops import dp as dp_ops
    from deepblast_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.standard_normal((B, N, M)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((B, N, M)) - 1.0, jnp.float32)
    ln = jnp.full((B,), N, jnp.int32)
    lm = jnp.full((B,), M, jnp.int32)

    if depth == "fwd":
        def op(theta, A, _eps=0.0):
            return dp_ops.alignment_score(
                theta, A, (ln, lm), mode=mode, backend=backend,
                dtypes=dtypes)
    elif depth == "fwd+bwd":
        def op(theta, A, _eps=0.0):
            return dp_ops.expected_alignment(
                theta, A, (ln, lm), mode=mode, backend=backend,
                dtypes=dtypes)
    elif depth == "decode":
        # the inference product path (what bench.py times): expected
        # alignment in the backend-native stream layout, no unskew
        def op(theta, A, _eps=0.0):
            return dp_ops.expected_alignment_stream(
                theta, A, (ln, lm), mode=mode, backend=backend,
                dtypes=dtypes)
    else:  # train: gradient through the decode (2nd-order path)
        def op(theta, A, _eps=0.0):
            def loss(t, a):
                E = dp_ops.expected_alignment(
                    t, a, (ln, lm), mode=mode, backend=backend,
                    dtypes=dtypes)
                return jnp.sum(E * E)
            return jax.grad(loss, argnums=(0, 1))(theta, A)

    dt = time_op(op, theta, A, reps=reps, iters=iters)
    return dict(B=B, N=N, M=M, mode=mode, backend=backend, depth=depth,
                seconds=dt, alignments_per_sec=B / dt,
                cell_updates_per_sec=B * N * M / dt)


def main(argv=None):
    parser = argparse.ArgumentParser("deepblast-benchmark")
    parser.add_argument("--sweep", choices=["batch", "length", "headline"],
                        default="headline")
    parser.add_argument("--mode", default="nw", choices=["nw", "sw"])
    parser.add_argument("--backend", default=None,
                        choices=[None, "scan", "pallas", "pallas_bm"])
    parser.add_argument("--depth", default="fwd+bwd",
                        choices=["fwd", "fwd+bwd", "decode", "train"])
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--length", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--dtype-menu", default="fp32",
                        choices=["fp32", "d-bf16", "all-bf16", "i16"],
                        help="storage-dtype menu for the pallas_bm "
                             "kernels (d-bf16 = the --dp-bf16-residuals "
                             "training config)")
    args = parser.parse_args(argv)
    dtypes = make_menu(args.dtype_menu)
    menu_label = args.dtype_menu
    if dtypes is not None:
        # storage-dtype menus only apply to backends that register a
        # with_dtypes factory (pallas_bm); label the artifact honestly
        # when the selected backend ignores the request
        from deepblast_tpu.ops.dp import get_backend
        _, be = get_backend(args.backend)
        if "with_dtypes" not in be:
            print(f"# --dtype-menu {args.dtype_menu} ignored: backend "
                  "has no storage-dtype support (fp32)", flush=True)
            dtypes = None
            menu_label = f"{args.dtype_menu} (ignored: fp32 backend)"

    if args.sweep == "batch":
        configs = [(b, 800, 800) for b in (4, 8, 16, 32, 64, 128, 256)]
    elif args.sweep == "length":
        configs = [(args.batch_size, n, n)
                   for n in (64, 128, 256, 512, 1024)]
    else:
        configs = [(args.batch_size, args.length, args.length)]

    for B, N, M in configs:
        res = run_config(B, N, M, args.mode, args.backend, args.depth,
                         args.iters, dtypes=dtypes)
        res["dtype_menu"] = menu_label
        print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
