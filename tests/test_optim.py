"""Optimizer/schedule parity: optax schedules vs the reference torch
LR schedulers, and the decay/no-decay split vs the reference's module-type
bucketing."""

import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from decafnet_tpu.train.optim import (
    warmup_cosine_schedule,
    warmup_multistep_schedule,
    decay_mask,
)


def _torch_lr_trace(sched_cls, n_steps, **kwargs):
    layer = torch.nn.Linear(4, 4)
    opt = torch.optim.AdamW(layer.parameters(), lr=1e-3)
    sched = sched_cls(opt, **kwargs)
    lrs = []
    for _ in range(n_steps):
        lrs.append(opt.param_groups[0]["lr"])  # lr used at this step
        opt.step()
        sched.step()
    return np.asarray(lrs)


def test_warmup_cosine_parity():
    from libs.modeling.optim import LinearWarmupCosineAnnealingLR

    warmup, total = 10, 50
    want = _torch_lr_trace(LinearWarmupCosineAnnealingLR, total,
                           warmup_epochs=warmup, max_epochs=total)
    fn = warmup_cosine_schedule(1e-3, warmup, total, eta_min=1e-8)
    got = np.asarray([float(fn(t)) for t in range(total)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-9)


def test_warmup_multistep_parity():
    from libs.modeling.optim import LinearWarmupMultiStepLR

    warmup, total = 8, 60
    for milestones in ([-1], [20, 40], [0, 25]):
        want = _torch_lr_trace(LinearWarmupMultiStepLR, total,
                               warmup_epochs=warmup, milestones=milestones,
                               gamma=0.1)
        fn = warmup_multistep_schedule(1e-3, warmup, milestones, gamma=0.1)
        got = np.asarray([float(fn(t)) for t in range(total)])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-10,
                                   err_msg=f"milestones={milestones}")


def test_decay_mask_split():
    """Conv kernels decay; norms / biases / scales / bkgd_token do not --
    matching the reference's split (libs/modeling/optim.py:66-129)."""
    params = {
        "vid_map": {"conv": {"weight": jnp.zeros((8, 4, 1)),
                             "bias": jnp.zeros((8,))}},
        "ln": {"weight": jnp.zeros((8, 1)), "bias": jnp.zeros((8, 1))},
        "tcn_norm": {"weight": jnp.zeros((8,)), "bias": jnp.zeros((8,))},
        "scales_0": {"scale": jnp.zeros(())},
        "drop_path": {"scale": jnp.zeros((1, 8, 1))},
        "text_net": {"bkgd_token": jnp.zeros((8, 1))},
    }
    mask = decay_mask(params)
    assert mask["vid_map"]["conv"]["weight"] is True
    assert mask["vid_map"]["conv"]["bias"] is False
    assert mask["ln"]["weight"] is False
    assert mask["tcn_norm"]["weight"] is False
    assert mask["scales_0"]["scale"] is False
    assert mask["drop_path"]["scale"] is False
    assert mask["text_net"]["bkgd_token"] is False
