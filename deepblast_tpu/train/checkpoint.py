"""Orbax checkpointing (reference checkpoint policy:
scripts/deepblast-train:57-63 ModelCheckpoint on validation_loss, plus the
final state-dict dump at scripts/deepblast-train:92-94; user-facing
reconstruction mirrors deepblast/utils.py:12-65)."""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

__all__ = ["Checkpointer", "load_model"]


class Checkpointer:
    """Monitored checkpoint writer keeping the best-k states."""

    def __init__(self, directory, keep=3, monitor="validation_loss"):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                best_fn=lambda m: m.get(monitor, m.get("train_loss", 0.0)),
                best_mode="min",
            ),
        )

    def save(self, state, metrics=None):
        import orbax.checkpoint as ocp
        step = int(state.step)
        self.mgr.save(step, args=ocp.args.StandardSave(state),
                      metrics={k: float(v) for k, v in (metrics or {}).items()
                               if isinstance(v, (int, float))})
        self.mgr.wait_until_finished()

    def restore(self, state, step: Optional[int] = None):
        """Restore into the structure of ``state`` (an abstract/template
        TrainState)."""
        import orbax.checkpoint as ocp
        step = step if step is not None else self.mgr.best_step()
        if step is None:
            step = self.mgr.latest_step()
        target = jax.tree_util.tree_map(np.asarray, state)
        return self.mgr.restore(step, args=ocp.args.StandardRestore(target))

    def latest_step(self):
        return self.mgr.latest_step()


def save_config(config, directory):
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        f.write(config.to_json())


def load_model(directory, step=None, tokenizer=None, lm_params=None):
    """Rebuild a DeepBLAST model + state from an output directory
    (reference: deepblast/utils.py:12-65)."""
    from deepblast_tpu.train.trainer import DeepBLAST, DeepBLASTConfig
    with open(os.path.join(directory, "config.json")) as f:
        config = DeepBLASTConfig.from_json(f.read())
    model = DeepBLAST(config, tokenizer=tokenizer, lm_params=lm_params)
    state = model.init()
    ckpt = Checkpointer(os.path.join(directory, "checkpoints"))
    model.state = ckpt.restore(state, step)
    return model
