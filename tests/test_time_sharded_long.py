"""Sequence-parallel correctness at REALISTIC lengths (round-4, VERDICT
item 5): T=4096 with a 7-level FPN on the 8-device CPU mesh, so EVERY
level's time axis is genuinely sharded (deepest level: 64 points = 8 per
device) and the band-attention / conv halo exchanges cross device
boundaries many times per level — the regime where SPMD partitioners
develop off-by-halo bugs that toy shapes (T=128) cannot expose.

Forward equality covers the eval-path partitioning (band attention via the
length-dispatched backend, strided convs, TCN refine, dual heads); the
train-step equality drives the same halo exchanges through the BACKWARD
pass plus AdamW/EMA. No reference analogue (the reference is strictly
single-device over the time axis, libs/worker_v2.py:739).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decafnet_tpu.core import get_cfg_defaults, update_opt
from decafnet_tpu.models import (fpn_lengths, generate_points, make_model,
                                 select_points)
from decafnet_tpu.parallel import make_mesh
from decafnet_tpu.parallel.mesh import shard_batch, time_sharding
from decafnet_tpu.train.optim import make_optimizer, make_schedule
from decafnet_tpu.train.trainer import TrainState, build_train_step

T_LONG = 4096
N_LEVELS = 7


def _long_cfg():
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = 16
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = T_LONG
    cfg.model.vid_net.arch = (1, 0, N_LEVELS)  # 7 FPN levels like NLQ/MAD
    cfg.model.text_net.in_dim = 12
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.3
    cfg.model.sn = 64
    cfg.data.max_num_text = 2
    cfg.train.batch_size = 1
    cfg.train.microbatch_size = 1
    cfg.seed = 0
    update_opt(cfg)
    assert cfg.model.num_fpn_levels == N_LEVELS
    assert cfg.data.max_vid_len == T_LONG  # vid_stride 1 in this config
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = _long_cfg()
    model = make_model(cfg)
    rng = np.random.RandomState(0)
    R, cv, ct, L = 2, cfg.model.vid_net.in_dim, cfg.model.text_net.in_dim, 8
    vid = rng.randn(1, cv, T_LONG).astype(np.float32)
    shallow = rng.randn(1, cv, T_LONG).astype(np.float32)
    vm = np.zeros((1, T_LONG), bool)
    vm[0, : T_LONG - 300] = True  # padded tail crosses the last shard
    batch = {
        "vid": vid, "shallow_vid": shallow, "vid_masks": vm,
        "text": rng.randn(R, ct, L).astype(np.float32),
        "text_masks": np.ones((R, L), bool),
        "text_cls": rng.randn(R, cv).astype(np.float32),
        "targets": np.asarray([[30.0, 900.0], [1500.0, 3600.0]],
                              np.float32),
        "row_valid": np.ones((R,), bool),
    }
    # params are T-independent: init on a short (chunkable) length
    t0 = 512
    params = model.init(
        jax.random.PRNGKey(0),
        np.repeat(vid[..., :t0], R, 0), np.repeat(shallow[..., :t0], R, 0),
        np.repeat(vm[..., :t0], R, 0), batch["text"], batch["text_cls"],
        batch["text_masks"], deterministic=True)["params"]
    return cfg, model, batch, params


def test_long_forward_matches_single_device(setup):
    cfg, model, batch, params = setup
    R = batch["text"].shape[0]

    def fwd(p, vid, shallow, vm, text, tcls, tm):
        return model.apply({"params": p}, vid, shallow, vm, text, tcls, tm,
                           deterministic=True, queries_per_video=R)

    args = (batch["vid"], batch["shallow_vid"], batch["vid_masks"],
            batch["text"], batch["text_cls"], batch["text_masks"])
    ref = jax.device_get(jax.jit(fwd)(params, *args))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    sharded_args = [
        jax.device_put(a, time_sharding(mesh, np.ndim(a)))
        if i < 3 else jax.device_put(a, rep)
        for i, a in enumerate(args)]
    got = jax.device_get(jax.jit(fwd)(
        jax.device_put(params, rep), *sharded_args))

    # (logits1, logits2, offsets, masks) — tuples of per-level arrays
    for gi, (g_group, r_group) in enumerate(zip(got, ref)):
        for lvl, (g, r) in enumerate(zip(g_group, r_group)):
            if g.dtype == bool:
                np.testing.assert_array_equal(
                    g, r, err_msg=f"out {gi} level {lvl}")
            else:
                np.testing.assert_allclose(
                    g, r, rtol=2e-5, atol=2e-5,
                    err_msg=f"out {gi} level {lvl}")


def test_long_train_step_matches_unsharded(setup):
    cfg, model, batch, params = setup
    lens = fpn_lengths(T_LONG // cfg.model.vid_stride,
                       cfg.model.num_fpn_levels)
    points_t = np.ascontiguousarray(np.concatenate(select_points(
        generate_points(cfg.pt_gen.max_seq_len, cfg.pt_gen.num_fpn_levels,
                        cfg.pt_gen.regression_range, cfg.pt_gen.sigma),
        lens)).T)
    sched = dict(cfg.scheduler)
    sched["_base_lr"] = cfg.optimizer.lr
    opt = make_optimizer(params, cfg.optimizer, make_schedule(sched, 10))

    def fresh_state():
        return TrainState(step=jnp.int32(0),
                          params=jax.tree.map(jnp.copy, params),
                          ema_params=jax.tree.map(jnp.copy, params),
                          opt_state=opt.init(params),
                          loss_norm=jnp.float32(cfg.train.loss_norm))

    step = jax.jit(build_train_step(model, opt, cfg))

    s0, m0 = step(fresh_state(), batch, jax.random.PRNGKey(2),
                  jax.device_put(points_t))
    m0 = jax.device_get(m0)

    mesh = make_mesh()
    batch_sh = shard_batch(batch, mesh, axis="time")
    s1, m1 = step(fresh_state(), batch_sh, jax.random.PRNGKey(2),
                  jax.device_put(points_t))
    m1 = jax.device_get(m1)

    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for (p0, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(s0.params))[0],
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(s1.params))[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(p0))
