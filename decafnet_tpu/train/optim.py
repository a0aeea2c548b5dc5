"""Optimizer and LR schedules via optax.

Reproduces the reference semantics:
  * decay / no-decay parameter split (reference: libs/modeling/optim.py:66-129):
    conv/linear weights decay; biases, norm weights, per-channel/scalar
    scales, and the background token do not. In this framework conv kernels
    are the only rank-3 'weight' leaves, so the split is
    ``decay <=> (leaf name == 'weight' and ndim == 3)``.
  * per-iteration linear warmup then cosine / multistep decay
    (reference: libs/modeling/optim.py:485-717). The chainable-form torch
    schedulers are reproduced in closed form, including the quirk that only
    strictly-positive milestones ever fire (steps=(-1,) => no decay) and
    the lr used at optimization step t is base * t / (warmup_itrs - 1)
    during warmup (the scheduler steps once at construction).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax


def decay_mask(params):
    """Pytree of bools: True where AdamW weight decay applies."""
    def leaf_mask(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name == "weight" and jnp.ndim(leaf) == 3

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def warmup_cosine_schedule(base_lr, warmup_itrs, total_itrs, eta_min=1e-8):
    """lr(t): linear 0 -> base over warmup, cosine base -> eta_min after
    (reference: LinearWarmupCosineAnnealingLR closed form)."""
    def fn(t):
        t = jnp.asarray(t, jnp.float32)
        if warmup_itrs > 1:
            warm = base_lr * t / (warmup_itrs - 1)
        else:
            warm = jnp.full_like(t, base_lr)
        denom = max(total_itrs - warmup_itrs, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(math.pi * (t - warmup_itrs) / denom))
        return jnp.where(t < warmup_itrs, warm, cos)
    return fn


def warmup_multistep_schedule(base_lr, warmup_itrs, milestones, gamma=0.1):
    """lr(t): linear warmup then step decay at strictly-positive milestones
    (reference: LinearWarmupMultiStepLR chainable semantics)."""
    ms = sorted(m for m in milestones if m > 0)

    def fn(t):
        t = jnp.asarray(t, jnp.float32)
        if warmup_itrs > 1:
            warm = base_lr * t / (warmup_itrs - 1)
        else:
            warm = jnp.full_like(t, base_lr)
        n_passed = sum((t - warmup_itrs >= m).astype(jnp.float32)
                       for m in ms) if ms else jnp.zeros_like(t)
        decayed = base_lr * gamma ** n_passed
        return jnp.where(t < warmup_itrs, warm, decayed)
    return fn


def make_schedule(cfg_sched, itrs_per_epoch):
    """Build the lr schedule from the scheduler config subtree
    (reference: libs/modeling/optim.py:687-717)."""
    warmup_itrs = cfg_sched.get("warmup_epochs", 0) * itrs_per_epoch
    name = cfg_sched["name"]
    base_lr = cfg_sched["_base_lr"]
    if name == "cosine":
        total = warmup_itrs + cfg_sched["epochs"] * itrs_per_epoch
        return warmup_cosine_schedule(base_lr, warmup_itrs, total)
    if name == "multistep":
        ms = [itrs_per_epoch * s for s in cfg_sched.get("steps", ())]
        return warmup_multistep_schedule(
            base_lr, warmup_itrs, ms, cfg_sched.get("gamma", 0.1))
    if name == "null":
        return lambda t: jnp.asarray(base_lr, jnp.float32)
    raise NotImplementedError(f"invalid scheduler: {name}")


def make_optimizer(params, cfg_optimizer, schedule):
    """optax transform chain matching the reference optimizer settings
    (reference: libs/modeling/optim.py:217-239 + grad clipping at
    libs/worker_v2.py:320-321)."""
    name = cfg_optimizer["name"]
    wd = cfg_optimizer.get("weight_decay", 0.0)
    mask = decay_mask(params)
    if name == "adamw":
        opt = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                          weight_decay=wd, mask=mask)
    elif name == "adam":
        opt = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "sgd":
        opt = optax.sgd(schedule, momentum=cfg_optimizer.get("momentum", 0.9))
    else:
        raise NotImplementedError(f"invalid optimizer: {name}")

    clip = cfg_optimizer.get("clip_grad_norm")
    if clip:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt


def ema_update(params, ema_params, beta):
    """EMA lerp: ema <- (1 - beta) * p + beta * ema
    (reference: libs/worker_v2.py:653-656)."""
    return jax.tree.map(lambda p, e: p + beta * (e - p), params, ema_params)
