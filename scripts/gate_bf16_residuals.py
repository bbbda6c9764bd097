#!/usr/bin/env python3
"""Multi-seed decision gate for the --dp-bf16-residuals training default
(VERDICT r4 item 2).

Round 4's single on-chip A/B (F1 0.7236 bf16 vs 0.7261 fp32, identical
config) could not distinguish menu effect from seed noise.  This gate
aggregates the round-5 paired CPU seeds (scan backend with the d-menu
emulation — the same bf16 rounding of the difference residuals the TPU
kernels apply, ops/dp_scan.py residual_dtype) plus the r4 chip pair,
and applies the pre-registered rule from the VERDICT: if the mean
paired F1 delta is within seed noise (|mean| <= 1 paired standard
deviation, i.e. a one-sample t below ~1 at these n), the 17-28%
step-time win flips the training default to bf16; otherwise the default
stays fp32 and the foreclosure is recorded.

Run after the seed runs: python scripts/gate_bf16_residuals.py
"""

import json
import math
import os

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")

PAIRS = [
    # (label, fp32 artifact, bf16 artifact, F1 extractor)
    *[(f"cpu seed {s}",
       f"quality_r05_gate_s{s}_fp32.json",
       f"quality_r05_gate_s{s}_bf16.json",
       lambda r: r["alignment_accuracy"]["trained"]["F1"])
      for s in (1, 2, 3)],
    # r4's chip pair ran at 4,096 pairs / 24 epochs (quality_r03_tpu is
    # the fp32 arm at that exact config; quality_r04_tpu_16k is a
    # different scale and NOT its pair)
    ("chip seed 0 (r4, 4k pairs)",
     "quality_r03_tpu.json", "quality_r04_tpu_bf16.json",
     lambda r: r["alignment_accuracy"]["trained"]["F1"]),
]


def main():
    rows = []
    for label, f32, f16, get in PAIRS:
        try:
            with open(os.path.join(DOCS, f32)) as f:
                a = get(json.load(f))
            with open(os.path.join(DOCS, f16)) as f:
                b = get(json.load(f))
        except (OSError, KeyError) as e:
            print(f"{label}: MISSING ({e})")
            continue
        rows.append((label, a, b, b - a))
        print(f"{label}: fp32 F1 {a:.4f}  bf16 F1 {b:.4f}  "
              f"delta {b - a:+.4f}")
    if len(rows) < 3:
        print("VERDICT: insufficient seeds — no decision")
        return 1
    deltas = [d for (_, _, _, d) in rows]
    n = len(deltas)
    mean = sum(deltas) / n
    sd = math.sqrt(sum((d - mean) ** 2 for d in deltas) / (n - 1))
    print(f"\nn={n} paired seeds; mean delta {mean:+.4f}, "
          f"paired SD {sd:.4f}, |mean|/SD = {abs(mean) / max(sd, 1e-9):.2f}")
    if abs(mean) <= sd:
        print("VERDICT: within seed noise -> flip dp_bf16_residuals "
              "default to True (step-time win decides)")
        return 0
    direction = "bf16 better" if mean > 0 else "fp32 better"
    print(f"VERDICT: outside noise ({direction}) -> "
          f"{'flip' if mean > 0 else 'foreclose'} the default")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
