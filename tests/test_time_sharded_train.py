"""Sequence-parallel TRAINING (``tpu.shard_time`` / ``shard_batch(...,
axis='time')``): the video time axis shards over the mesh while the batch
replicates; XLA SPMD partitions the full train step (forward + backward +
AdamW + EMA) with halo exchanges. Losses and updated parameters must match
the unsharded step. No reference analogue (DDP shards only the batch)."""

import numpy as np

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from decafnet_tpu.models import (fpn_lengths, generate_points, make_model,
                                 select_points)
from decafnet_tpu.parallel import make_mesh
from decafnet_tpu.parallel.mesh import shard_batch
from decafnet_tpu.train.optim import make_optimizer, make_schedule
from decafnet_tpu.train.trainer import TrainState, build_train_step


def _setup():
    cfg = ge._tiny_cfg(n_videos=1)
    cfg.data.max_num_text = 2
    T = cfg.data.max_vid_len
    model = make_model(cfg)
    rng = np.random.RandomState(1)
    R = 2
    vid, shallow, vm, _, _, _ = ge._example_inputs(cfg, rows=1)
    batch = {
        "vid": vid, "shallow_vid": shallow, "vid_masks": vm,
        "text": rng.randn(R, cfg.model.text_net.in_dim,
                          cfg.data.max_text_len).astype(np.float32),
        "text_masks": np.ones((R, cfg.data.max_text_len), bool),
        "text_cls": rng.randn(R, cfg.model.vid_net.in_dim).astype(
            np.float32),
        "targets": np.tile(np.asarray([[3.0, 40.0]], np.float32), (R, 1)),
        "row_valid": np.ones((R,), bool),
    }
    params = model.init(
        jax.random.PRNGKey(0), np.repeat(vid, R, 0),
        np.repeat(shallow, R, 0), np.repeat(vm, R, 0), batch["text"],
        batch["text_cls"], batch["text_masks"],
        deterministic=True)["params"]
    lens = fpn_lengths(T // cfg.model.vid_stride, cfg.model.num_fpn_levels)
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

    step = jax.jit(build_train_step(model, opt, cfg), donate_argnums=(0,))
    return cfg, batch, points_t, fresh_state, step


def test_time_sharded_train_step_matches_unsharded():
    cfg, batch, points_t, fresh_state, step = _setup()

    s0, m0 = step(fresh_state(), batch, jax.random.PRNGKey(2),
                  jax.device_put(points_t))
    # second step to cover optimizer-state propagation
    s0, m0b = step(s0, batch, jax.random.PRNGKey(3),
                   jax.device_put(points_t))
    m0, m0b = jax.device_get((m0, m0b))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch_sh = shard_batch(batch, mesh, axis="time")
    s1, m1 = step(fresh_state(), batch_sh, jax.random.PRNGKey(2),
                  jax.device_put(points_t))
    s1, m1b = step(s1, batch_sh, jax.random.PRNGKey(3),
                   jax.device_put(points_t))
    m1, m1b = jax.device_get((m1, m1b))

    for a, b in ((m0, m1), (m0b, m1b)):
        for k in a:
            np.testing.assert_allclose(float(a[k]), float(b[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(s0.params))[0],
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(s1.params))[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(p0))
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(s0.ema_params))[0],
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(s1.ema_params))[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(p0))


def test_data_time_composed_sharding_matches_unsharded():
    """DP x SP over a 2-D ('data', 'time') mesh: batch rows shard over
    'data' while every video's time axis shards over 'time'."""
    cfg = ge._tiny_cfg(n_videos=4)
    cfg.data.max_num_text = 2
    T = cfg.data.max_vid_len
    B, mnt = 4, 2
    R = B * mnt
    model = make_model(cfg)
    rng = np.random.RandomState(1)
    vid, shallow, vm, _, _, _ = ge._example_inputs(cfg, rows=B)
    batch = {
        "vid": vid, "shallow_vid": shallow, "vid_masks": vm,
        "text": rng.randn(R, cfg.model.text_net.in_dim,
                          cfg.data.max_text_len).astype(np.float32),
        "text_masks": np.ones((R, cfg.data.max_text_len), bool),
        "text_cls": rng.randn(R, cfg.model.vid_net.in_dim).astype(
            np.float32),
        "targets": np.tile(np.asarray([[3.0, 40.0]], np.float32), (R, 1)),
        "row_valid": np.ones((R,), bool),
    }
    params = model.init(
        jax.random.PRNGKey(0), np.repeat(vid, mnt, 0),
        np.repeat(shallow, mnt, 0), np.repeat(vm, mnt, 0), batch["text"],
        batch["text_cls"], batch["text_masks"],
        deterministic=True)["params"]
    lens = fpn_lengths(T // cfg.model.vid_stride, cfg.model.num_fpn_levels)
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

    step = jax.jit(build_train_step(model, opt, cfg), donate_argnums=(0,))
    s0, m0 = step(fresh_state(), batch, jax.random.PRNGKey(2),
                  jax.device_put(points_t))
    m0 = jax.device_get(m0)

    mesh = make_mesh((4, 2))
    assert mesh.axis_names == ("data", "time")
    batch_sh = shard_batch(batch, mesh, axis="data+time")
    s1, m1 = step(fresh_state(), batch_sh, jax.random.PRNGKey(2),
                  jax.device_put(points_t))
    m1 = jax.device_get(m1)

    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(s0.params))[0],
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(s1.params))[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(p0))
