"""Learning-rate schedules (reference: deepblast/trainer.py:302-336).

optax re-implementations of the torch schedulers the reference exposes.
All schedules are per-*epoch* in the reference (Lightning steps them once an
epoch); here they take ``steps_per_epoch`` and operate per optimizer step.
"""

from __future__ import annotations

import numpy as np
import optax

__all__ = ["make_schedule"]


def make_schedule(name, learning_rate, epochs, steps_per_epoch=1):
    total = max(1, epochs * steps_per_epoch)
    if name == "none":
        return optax.constant_schedule(learning_rate)
    if name == "cosine":
        # CosineAnnealingLR(T_max=epochs), eta_min=0
        return optax.cosine_decay_schedule(learning_rate, total)
    if name == "cosine_restarts":
        # CosineAnnealingWarmRestarts(T_0=1, T_mult=2): doubling cosine cycles
        schedules, boundaries = [], []
        t, start = steps_per_epoch, 0
        while start < total:
            schedules.append(optax.cosine_decay_schedule(learning_rate, t))
            start += t
            boundaries.append(start)
            t *= 2
        return optax.join_schedules(schedules, boundaries[:-1])
    if name == "triangular":
        # CyclicLR(mode='triangular2'): amplitude halves each cycle
        base_lr = 1e-8
        steps = max(1, int(np.log2(learning_rate / base_lr)))
        step_size = max(1, (epochs // steps) * steps_per_epoch)

        def sched(count):
            cycle = np.floor(1 + count / (2 * step_size))
            xx = np.abs(count / step_size - 2 * cycle + 1)
            scale = 1.0 / (2.0 ** (cycle - 1))
            return base_lr + (learning_rate - base_lr) * \
                np.maximum(0.0, 1 - xx) * scale

        import jax.numpy as jnp

        def sched_jax(count):
            count = jnp.asarray(count, jnp.float32)
            cycle = jnp.floor(1 + count / (2 * step_size))
            xx = jnp.abs(count / step_size - 2 * cycle + 1)
            scale = 1.0 / (2.0 ** (cycle - 1))
            return base_lr + (learning_rate - base_lr) * \
                jnp.maximum(0.0, 1 - xx) * scale

        return sched_jax
    if name == "steplr":
        min_lr = 1e-6
        steps = max(1, int(np.log2(learning_rate / min_lr)))
        step_size = max(1, (epochs // steps) * steps_per_epoch)
        return optax.exponential_decay(
            learning_rate, transition_steps=step_size, decay_rate=0.5,
            staircase=True)
    raise ValueError(f"`{name}` scheduler is not implemented.")
