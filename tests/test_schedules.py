"""Pin the optax schedules against torch's actual per-epoch sequences
(VERDICT round-1 weak item 6).

The reference steps each torch scheduler once per epoch
(reference: deepblast/trainer.py:302-336); our schedules take
``steps_per_epoch`` and evaluate per optimizer step, so with
``steps_per_epoch=1`` the sequence over ``count = 0..epochs-1`` must match
torch's LR at epochs ``0..epochs-1``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deepblast_tpu.train.schedules import make_schedule  # noqa: E402

LR = 5e-4
EPOCHS = 16


def _torch_lrs(make_sched, epochs=EPOCHS, lr=LR):
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sched = make_sched(opt)
    lrs = []
    for _ in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(lrs)


def _ours(name, epochs=EPOCHS, lr=LR):
    sched = make_schedule(name, lr, epochs, steps_per_epoch=1)
    return np.array([float(sched(i)) for i in range(epochs)])


def test_cosine_matches_torch():
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
        o, T_max=EPOCHS))
    np.testing.assert_allclose(_ours("cosine"), ref, rtol=1e-6)


def test_cosine_restarts_matches_torch():
    ref = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            o, T_0=1, T_mult=2))
    np.testing.assert_allclose(_ours("cosine_restarts"), ref, rtol=1e-6)


def test_triangular_matches_torch():
    # reference: CyclicLR(base_lr=1e-8, max_lr=lr, mode='triangular2',
    # step_size_up=epochs // log2(lr / base_lr))
    base = 1e-8
    step = EPOCHS // int(np.log2(LR / base))
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.CyclicLR(
        o, base, max_lr=LR, step_size_up=step, mode="triangular2",
        cycle_momentum=False))
    np.testing.assert_allclose(_ours("triangular"), ref, rtol=1e-5)


def test_steplr_matches_torch():
    step = EPOCHS // int(np.log2(LR / 1e-6))
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.StepLR(
        o, step_size=step, gamma=0.5))
    np.testing.assert_allclose(_ours("steplr"), ref, rtol=1e-6)


def test_none_is_constant():
    np.testing.assert_allclose(_ours("none"), np.full(EPOCHS, LR))


def test_per_step_resolution_scales():
    """With steps_per_epoch > 1 the schedule interpolates within epochs but
    still hits torch's per-epoch values at epoch boundaries (cosine)."""
    spe = 4
    sched = make_schedule("cosine", LR, EPOCHS, steps_per_epoch=spe)
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
        o, T_max=EPOCHS))
    ours = np.array([float(sched(e * spe)) for e in range(EPOCHS)])
    # same half-cosine sampled at finer resolution: epoch boundaries agree
    # with torch's T_max=epochs curve evaluated at e/epochs
    expect = LR * 0.5 * (1 + np.cos(np.pi * np.arange(EPOCHS) / EPOCHS))
    np.testing.assert_allclose(ours, expect, rtol=1e-6)
    np.testing.assert_allclose(ref, expect, rtol=1e-6)
