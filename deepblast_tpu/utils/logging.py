"""Metrics logging (reference: TensorBoard throughout deepblast/trainer.py
and the SummaryWriter helper at deepblast/trainer.py:111-118).

A composite logger: JSONL always (greppable, exportable), TensorBoard when
the package is available.  :func:`tensorboard_to_csv` covers the
``deepblast-tensorboard2csv`` CLI's scraping
(reference: scripts/deepblast-tensorboard2csv:12-41).
"""

from __future__ import annotations

import datetime
import json
import os

__all__ = ["MetricsLogger", "tensorboard_to_csv"]


class MetricsLogger:
    def __init__(self, root_dir="./", logging_path=None, tensorboard=True):
        if logging_path is None:
            suffix = datetime.datetime.now().strftime("%y%m%d_%H%M%S")
            logging_path = f"logdir_{suffix}"
        self.path = os.path.join(root_dir, logging_path)
        os.makedirs(self.path, exist_ok=True)
        self._jsonl = open(os.path.join(self.path, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(self.path)
            except Exception:
                self._tb = None

    def log_scalar(self, tag, value, step):
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb:
            self._tb.add_scalar(tag, value, step)

    def log_text(self, tag, text, step):
        self._jsonl.write(json.dumps(
            {"tag": tag, "text": text, "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb:
            self._tb.add_text(tag, text, step)

    def log_figure(self, tag, fig, step):
        if self._tb:
            self._tb.add_figure(tag, fig, step, close=True)
        else:
            import matplotlib.pyplot as plt
            plt.close(fig)

    def close(self):
        self._jsonl.close()
        if self._tb:
            self._tb.close()


def tensorboard_to_csv(logdir, out_csv, pattern=None):
    """Scrape scalar stats from TB event files (or our JSONL mirror) into a
    CSV (reference: scripts/deepblast-tensorboard2csv:12-41)."""
    import pandas as pd
    rows = []
    jsonl = os.path.join(logdir, "metrics.jsonl")
    if os.path.exists(jsonl):
        with open(jsonl) as f:
            for line in f:
                d = json.loads(line)
                if "value" in d and (pattern is None or pattern in d["tag"]):
                    rows.append(d)
    else:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator)
        acc = EventAccumulator(logdir)
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            if pattern and pattern not in tag:
                continue
            for ev in acc.Scalars(tag):
                rows.append({"tag": tag, "value": ev.value, "step": ev.step})
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    return df
