"""The jitted SPMD train step and the training loop.

Reference control flow (libs/worker_v2.py:213-723) mapped to JAX:
  * one jitted, donated train step = microbatch `lax.scan` (grad
    accumulation; replaces the no_sync loop at worker_v2.py:366-377)
    -> global loss normalization -> optax update (incl. grad clipping)
    -> EMA lerp -> loss-norm EMA update. Cross-host reductions are implicit:
    batches are sharded over the ('data',) mesh and global sums compile to
    XLA all-reduces (replacing DDP averaging x world_size and the explicit
    all_gather of the positive-point count, worker_v2.py:379-382,447-463).
  * loss = (focal(cls1) + focal(cls2)) / 2 + loss_weight * DIoU, each summed
    over valid points and divided by the running EMA loss normalizer
    (worker_v2.py:439-465).
  * checkpoints: native msgpack state + a torch-layout .pth export with the
    reference's {'model','model_ema'} split (worker_v2.py:675-696).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization, struct

from ..data import DataLoader, batchify_train, make_dataset
from ..models import fpn_lengths, generate_points, make_model, select_points
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.logging import (AverageMeter, Logger,
                             count_parameters, time_str)
from .annotate import annotate_points
from .losses import calc_focal_loss, calc_iou_loss
from .optim import ema_update, make_optimizer, make_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    ema_params: dict
    opt_state: tuple
    loss_norm: jnp.ndarray


def build_microbatch_loss(model, cfg):
    """The per-microbatch loss: forward -> point annotation ->
    (focal(cls1)+focal(cls2))/2 + weighted IoU loss, each summed over valid
    points and divided by the running loss normalizer
    (reference: libs/worker_v2.py:386-477). Factored out of the train step
    so the train-step oracle test can take value_and_grad of exactly the
    code the Trainer runs."""
    max_num_text = cfg.data.max_num_text or 1
    loss_cfg = dict(
        fc_a=cfg.loss.fc_a, fc_s=cfg.loss.fc_s,
        reg_loss=cfg.train.reg_loss, loss_weight=cfg.train.loss_weight,
        center_sampling=cfg.train.center_sampling,
        center_sampling_radius=cfg.train.center_sampling_radius,
        vid_stride=cfg.model.vid_stride,
    )

    # video-major training (round-4): with channel dropout off (the
    # default; reference libs/core/opt.py:104) the vid_map projection and
    # the expert-stream read commute with the per-query row expansion, so
    # the model's grouped path (queries_per_video) runs them once per
    # VIDEO instead of once per query row -- the same structural win the
    # eval path already has. Gradient equality to the per-row expansion:
    # tests/test_grouped_eval.py::test_train_grads_match_grouped. The
    # model itself falls back to rows when cdrop > 0 or sfonly.
    video_major = bool(cfg.tpu.get("video_major_train", True))

    def microbatch_loss(params, mb, rng, loss_norm, points_t):
        if video_major:
            logits1, logits2, offsets, masks = model.apply(
                {"params": params}, mb["vid"], mb["shallow_vid"],
                mb["vid_masks"], mb["text"], mb["text_cls"],
                mb["text_masks"], deterministic=False,
                rngs={"dropout": rng}, queries_per_video=max_num_text)
        else:
            vid = jnp.repeat(mb["vid"], max_num_text, axis=0)
            shallow = jnp.repeat(mb["shallow_vid"], max_num_text, axis=0)
            vmask = jnp.repeat(mb["vid_masks"], max_num_text, axis=0)
            logits1, logits2, offsets, masks = model.apply(
                {"params": params}, vid, shallow, vmask,
                mb["text"], mb["text_cls"], mb["text_masks"],
                deterministic=False, rngs={"dropout": rng})

        logits1 = jnp.concatenate(logits1, axis=1)       # (R, P)
        logits2 = jnp.concatenate(logits2, axis=1)
        offsets = jnp.concatenate(offsets, axis=2)       # (R, 2, P)
        masks = jnp.concatenate(masks, axis=1)           # (R, P)
        masks = masks & mb["row_valid"][:, None]

        targets = mb["targets"] / loss_cfg["vid_stride"]
        gt_labels, gt_offsets = annotate_points(
            points_t, targets,
            center_sampling=loss_cfg["center_sampling"],
            center_sampling_radius=loss_cfg["center_sampling_radius"])

        pos_masks = gt_labels & masks
        norm = jnp.sum(pos_masks).astype(jnp.float32)

        cls1 = calc_focal_loss(logits1, gt_labels, masks,
                               smoothing=loss_cfg["fc_s"],
                               alpha=loss_cfg["fc_a"]) / loss_norm
        cls2 = calc_focal_loss(logits2, gt_labels, masks,
                               smoothing=loss_cfg["fc_s"],
                               alpha=loss_cfg["fc_a"]) / loss_norm
        cls_loss = (cls1 + cls2) / 2
        reg_loss = calc_iou_loss(offsets, gt_offsets, pos_masks,
                                 reg_loss=loss_cfg["reg_loss"]) / loss_norm
        total = cls_loss + loss_cfg["loss_weight"] * reg_loss
        return total, {"cls": cls_loss, "reg": reg_loss, "total": total,
                       "norm": norm}

    return microbatch_loss


def build_train_step(model, optimizer, cfg):
    """Build the jitted train step.

    The candidate points arrive as a (4, P) device array ARGUMENT
    (transposed rows: coord / reg_min / reg_max / stride) -- never a closure
    constant, which some platforms re-materialize per call.
    """
    micro = cfg.train.get("microbatch_size") or cfg.train.batch_size
    loss_cfg = dict(
        loss_norm_momentum=cfg.train.loss_norm_momentum,
        ema_beta=cfg.train.ema_beta,
    )
    microbatch_loss = build_microbatch_loss(model, cfg)

    def split_micro(batch, n_micro):
        def rs(x, rows_per):
            return x.reshape((n_micro, rows_per) + x.shape[1:])
        out = {}
        for k, v in batch.items():
            rows = v.shape[0]
            out[k] = rs(v, rows // n_micro)
        return out

    def train_step(state, batch, rng, points_t):
        bsz = batch["vid"].shape[0]
        n_micro = max(bsz // micro, 1)

        grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

        if n_micro == 1:
            (_, metrics), grads = grad_fn(state.params, batch, rng,
                                          state.loss_norm, points_t)
        else:
            mbs = split_micro(batch, n_micro)
            rngs = jax.random.split(rng, n_micro)

            def body(carry, xs):
                grads_acc, metrics_acc = carry
                mb, r = xs
                (_, m), g = grad_fn(state.params, mb, r, state.loss_norm,
                                    points_t)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                metrics_acc = jax.tree.map(jnp.add, metrics_acc, m)
                return (grads_acc, metrics_acc), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            zero_metrics = {k: jnp.float32(0.0)
                            for k in ("cls", "reg", "total", "norm")}
            (grads, metrics), _ = jax.lax.scan(
                body, (zero_grads, zero_metrics), (mbs, rngs))

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        ema = ema_update(params, state.ema_params, loss_cfg["ema_beta"])

        mom = loss_cfg["loss_norm_momentum"]
        new_norm = (mom * state.loss_norm
                    + (1.0 - mom) * jnp.maximum(metrics["norm"], 1.0))

        new_state = TrainState(
            step=state.step + 1, params=params, ema_params=ema,
            opt_state=opt_state, loss_norm=new_norm)
        return new_state, metrics

    return train_step


class Trainer:
    """Training orchestration (reference: libs/worker_v2.py:213-723)."""

    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.tpu.mesh_shape)
        # sequence-parallel training (tpu.shard_time): the video TIME axis
        # shards over the mesh -- XLA SPMD partitions the whole step
        # (fwd+bwd+optimizer) with halo exchanges. On a 1-D mesh the batch
        # replicates (axis='time'); on a 2-D ('data', 'time') mesh
        # (tpu.mesh_shape: (n_data, n_time)) batch rows shard over 'data'
        # simultaneously (axis='data+time').
        self.shard_time = bool(cfg.tpu.get("shard_time", False))
        self.batch_axis = "data"
        if self.shard_time:
            self.batch_axis = ("data+time"
                               if "time" in self.mesh.axis_names else "time")
            if self.batch_axis == "data+time":
                assert cfg.train.batch_size % self.mesh.shape["data"] == 0, (
                    f"batch {cfg.train.batch_size} must divide the mesh "
                    f"data axis ({self.mesh.shape['data']})")
        # data parallelism requires batch_size % mesh size == 0; shrink the
        # mesh to the largest divisor rather than failing
        n_dev = self.mesh.devices.size
        if not self.shard_time and cfg.train.batch_size % n_dev != 0:
            keep = 1
            for d in range(1, min(n_dev, cfg.train.batch_size) + 1):
                if cfg.train.batch_size % d == 0:
                    keep = d
            self.mesh = make_mesh(devices=list(self.mesh.devices.flat)[:keep])
            print(f"[trainer] batch {cfg.train.batch_size} not divisible by "
                  f"{n_dev} devices; using a {keep}-device data mesh")
        self.rng = jax.random.PRNGKey(cfg.seed)
        np_rng = np.random.RandomState(cfg.seed)

        self.num_epochs = cfg.train.epochs + cfg.train.warmup_epochs
        self.dataset = make_dataset(cfg, num_epochs=self.num_epochs,
                                    is_training=True, rng=np_rng)
        self.batch_size = cfg.train.batch_size
        self.max_num_text = cfg.data.max_num_text or 1
        self.input_vid_len = cfg.data.max_vid_len
        # batch assembly runs in the prefetch thread, overlapped with the
        # device step; under multi-host SPMD every process loads only its
        # contiguous block of the global batch (assembled into global
        # arrays by shard_batch)
        self.loader = DataLoader(
            self.dataset, self.batch_size, shuffle=True, seed=cfg.seed,
            num_threads=cfg.train.num_workers,
            rank=jax.process_index(), world_size=jax.process_count(),
            shard_within_batch=jax.process_count() > 1,
            transform=lambda samples: batchify_train(
                samples, self.input_vid_len, cfg.data.max_text_len,
                self.max_num_text))
        self.itrs_per_epoch = len(self.loader)
        self.num_itrs = self.num_epochs * self.itrs_per_epoch
        self.epoch = self.itr = 0


        # model + params from one real batch's shapes
        self.model = make_model(cfg)
        sample = self.dataset[0]
        init_batch = batchify_train([sample], self.input_vid_len,
                                    cfg.data.max_text_len, self.max_num_text)
        self.rng, init_rng = jax.random.split(self.rng)
        params = self.model.init(
            init_rng,
            np.repeat(init_batch["vid"], self.max_num_text, 0),
            np.repeat(init_batch["shallow_vid"], self.max_num_text, 0),
            np.repeat(init_batch["vid_masks"], self.max_num_text, 0),
            init_batch["text"], init_batch["text_cls"],
            init_batch["text_masks"], deterministic=True)["params"]

        if cfg.model.pretrain:
            from ..models.import_torch import load_torch_checkpoint
            params = load_torch_checkpoint(cfg.model.pretrain, "model",
                                           template=params)

        # candidate points for the static train length, transposed (4, P)
        # and device-resident (passed as a step argument, never a closure)
        level0 = self.input_vid_len // cfg.model.vid_stride
        lens = fpn_lengths(level0, cfg.model.num_fpn_levels)
        all_points = generate_points(
            cfg.pt_gen.max_seq_len, cfg.pt_gen.num_fpn_levels,
            cfg.pt_gen.regression_range, cfg.pt_gen.sigma)
        self.points_t = jax.device_put(np.ascontiguousarray(
            np.concatenate(select_points(all_points, lens)).T))

        sched_cfg = dict(cfg.scheduler)
        sched_cfg["_base_lr"] = cfg.optimizer.lr
        schedule = make_schedule(sched_cfg, self.itrs_per_epoch)
        self.optimizer = make_optimizer(params, cfg.optimizer, schedule)
        opt_state = self.optimizer.init(params)

        self.state = TrainState(
            step=jnp.int32(0), params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=opt_state,
            loss_norm=jnp.float32(cfg.train.loss_norm))

        self._step_fn = jax.jit(
            build_train_step(self.model, self.optimizer, cfg),
            donate_argnums=(0,))

        # only process 0 writes logs/checkpoints (the reference does the
        # same via rank-0 guards, libs/worker_v2.py:345-364)
        self.is_lead = jax.process_index() == 0
        root = cfg.aux.logdir
        if self.is_lead:
            os.makedirs(os.path.join(root, "models"), exist_ok=True)
            os.makedirs(os.path.join(root, "states"), exist_ok=True)
        self.logger = Logger(os.path.join(root, "log.txt")
                             if self.is_lead else None,
                             quiet=not self.is_lead)
        from ..utils.tracking import MetricsSink
        self.metrics_sink = MetricsSink(root, cfg, enabled=self.is_lead)
        self.loss_meters = {}
        self.timer = AverageMeter()
        self.log_interval = cfg.aux.log_interval
        self.logger.write(
            f"Model: {count_parameters(params):.2f}M parameters")

        # auto-resume when both checkpoint halves exist
        # (reference: train.py:66-69)
        if (cfg.aux.get("resume", True)
                and os.path.exists(os.path.join(root, "models", "last.msgpack"))
                and os.path.exists(os.path.join(root, "states", "last.msgpack"))):
            self.load()
        elif cfg.aux.get("model_resume"):
            self.load_model_only(cfg.aux.model_resume)

        self.evaluator = None
        # train-time eval runs on the lead process only, like the
        # reference's rank-0 Evaluator (libs/worker_v2.py:359-364)
        if self.is_lead and cfg.aux.eval_run and cfg.aux.eval_run > 0:
            from ..eval.evaluator import Evaluator
            self.evaluator = Evaluator(cfg, mesh=self.mesh, train_time=True)

    # -- checkpointing ------------------------------------------------------
    # two-directory scheme like the reference (libs/worker_v2.py:675-696):
    # models/ holds {params, ema_params}; states/ holds the training state.

    def _model_blob(self):
        return {
            "params": self.state.params,
            "ema_params": self.state.ema_params,
        }

    def _train_state_blob(self):
        return {
            "opt_state": self.state.opt_state,
            "loss_norm": self.state.loss_norm,
            "step": self.state.step,
            "epoch": self.epoch,
            "itr": self.itr,
        }

    def checkpoint(self):
        if not self.is_lead:
            return
        root = self.cfg.aux.logdir

        def _atomic_write(path, data):
            # tmp + rename (atomic on POSIX within a dir): a preemption
            # kill mid-write must never leave a truncated msgpack behind
            # masquerading as a resumable checkpoint
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)

        blob = serialization.to_bytes(jax.device_get(self._model_blob()))
        for name in ("last.msgpack", f"{self.epoch}-{self.itr}.msgpack"):
            _atomic_write(os.path.join(root, "models", name), blob)
        state_blob = serialization.to_bytes(
            jax.device_get(self._train_state_blob()))
        _atomic_write(os.path.join(root, "states", "last.msgpack"),
                      state_blob)
        # torch-layout export for reference interop
        # (reference checkpoint schema: libs/worker_v2.py:675-696)
        try:
            import torch
            from ..models.import_torch import params_to_state_dict
            model_ckpt = {
                "model": {k: torch.from_numpy(np.array(v)) for k, v in
                          params_to_state_dict(
                              jax.device_get(self.state.params)).items()},
                "model_ema": {k: torch.from_numpy(np.array(v)) for k, v in
                              params_to_state_dict(
                                  jax.device_get(self.state.ema_params)).items()},
            }
            torch.save(model_ckpt,
                       os.path.join(root, "models", f"{self.epoch}-{self.itr}.pth"))
            torch.save(model_ckpt, os.path.join(root, "models", "last.pth"))
        except ImportError:
            pass
        self._prune_checkpoints()

    def _prune_checkpoints(self):
        """Retain only the ``aux.save_run`` most recent epoch-tagged model
        checkpoints (plus ``last.*``), bounding disk growth. The reference
        defines aux.save_run=2 (libs/core/opt.py:26) but never wires it and
        accumulates every epoch; epochs listed in ``log.checkpoint_epochs``
        are additionally exempt from pruning."""
        keep = self.cfg.aux.get("save_run", 0)
        if not keep or keep <= 0:
            return
        exempt = set(int(e) for e in
                     (self.cfg.log.get("checkpoint_epochs") or ()))
        mdir = os.path.join(self.cfg.aux.logdir, "models")
        tagged = {}
        for fname in os.listdir(mdir):
            stem, ext = os.path.splitext(fname)
            if ext not in (".msgpack", ".pth") or "-" not in stem:
                continue
            try:
                epoch, itr = (int(x) for x in stem.split("-"))
            except ValueError:
                continue
            tagged.setdefault((epoch, itr), []).append(fname)
        order = sorted(tagged, reverse=True)
        for epoch, itr in order[keep:]:
            if epoch in exempt:
                continue
            for fname in tagged[(epoch, itr)]:
                try:
                    os.remove(os.path.join(mdir, fname))
                except OSError:
                    pass

    def load(self, ckpt="last"):
        """Resume model weights + EMA + optimizer + schedule position
        (reference: libs/worker_v2.py:658-670)."""
        root = self.cfg.aux.logdir
        with open(os.path.join(root, "models", f"{ckpt}.msgpack"), "rb") as f:
            m = serialization.from_bytes(
                jax.device_get(self._model_blob()), f.read())
        with open(os.path.join(root, "states", "last.msgpack"), "rb") as f:
            s = serialization.from_bytes(
                jax.device_get(self._train_state_blob()), f.read())
        self.state = TrainState(
            step=jnp.asarray(s["step"]),
            params=m["params"], ema_params=m["ema_params"],
            opt_state=s["opt_state"],
            loss_norm=jnp.asarray(s["loss_norm"]))
        self.epoch, self.itr = int(s["epoch"]), int(s["itr"])
        self.logger.write(
            f"Loaded checkpoint [epoch {self.epoch} / itr {self.itr}]")

    def load_model_only(self, path):
        """Weights-only warm start from a native .msgpack or a
        reference-layout .pth (reference aux.model_resume / model.pretrain,
        libs/core/opt.py:22, libs/worker_v2.py:229-233)."""
        if path.endswith(".pth"):
            from ..models.import_torch import load_torch_checkpoint
            params = load_torch_checkpoint(path, "model",
                                           template=self.state.params)
            ema = load_torch_checkpoint(path, "model_ema",
                                        template=self.state.params)
            self.state = self.state.replace(params=params, ema_params=ema)
            return
        with open(path, "rb") as f:
            m = serialization.from_bytes(
                jax.device_get(self._model_blob()), f.read())
        self.state = self.state.replace(params=m["params"],
                                        ema_params=m["ema_params"])

    # -- loop ---------------------------------------------------------------

    def run(self):
        cfg = self.cfg
        self.logger.write("Training started.")

        # preemption-signal checkpointing (SURVEY 5.3): a SIGTERM (e.g. TPU
        # VM preemption) requests a final checkpoint; training auto-resumes
        # from it on restart. The handler ONLY sets a flag: the train step
        # DONATES the state buffers (donate_argnums), so if the signal
        # lands while the main thread is inside _step_fn the old state's
        # arrays are already deleted -- checkpointing from the handler
        # there crashes with "Array has been deleted" (found by
        # tests/test_sigterm_checkpoint.py sweeping preemption points).
        # The loop checkpoints at the next step boundary, where the new
        # state is guaranteed live.
        import signal

        self._preempted = False

        def _on_sigterm(signum, frame):
            self.logger.write("SIGTERM received; will checkpoint at the "
                              "next step boundary.")
            self._preempted = True

        def _checkpoint_and_exit():
            self.logger.write("Preemption checkpoint for resume.")
            self.checkpoint()
            raise SystemExit(143)

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            prev_handler = None  # not on the main thread (tests)
        while self.epoch < self.num_epochs:
            self.loader.set_epoch(self.epoch)
            start = time.time()
            for batch in self.loader:
                batch = shard_batch(batch, self.mesh, axis=self.batch_axis)
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, metrics = self._step_fn(self.state, batch,
                                                    step_rng, self.points_t)
                self.itr += 1
                if self._preempted:
                    _checkpoint_and_exit()
                for k in ("cls", "reg", "total"):
                    self.loss_meters.setdefault(k, AverageMeter()).update(
                        float(metrics[k]))
                self.timer.update(time.time() - start)
                start = time.time()
                if self.itr == 1 or self.itr % self.log_interval == 0:
                    self.log()
                if cfg.aux.dryrun:
                    break
                if (cfg.aux.eval_by == "itr" and cfg.aux.eval_run > 0
                        and self.itr % cfg.aux.eval_run == 0):
                    self.evaluate(self.itr)
            self.epoch += 1
            if self._preempted:  # signal landed between steps / in eval
                _checkpoint_and_exit()
            if cfg.aux.eval_by == "epoch":
                self.evaluate(self.epoch)
            if cfg.aux.dryrun:
                break
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        self.logger.write("Training completed.")

    def evaluate(self, ct):
        self.checkpoint()
        if (self.evaluator is not None and self.cfg.aux.eval_run > 0
                and ct % self.cfg.aux.eval_run == 0):
            # per-cadence eval log file (reference: libs/worker_v2.py:816-818)
            self.evaluator.logger = Logger(os.path.join(
                self.cfg.aux.logdir, f"eval_{self.epoch}_{self.itr}.txt"))
            self.evaluator.run(ema_params=self.state.ema_params,
                               tag=f"{self.epoch}_{self.itr}")
            self.evaluator.reset()

    def log(self):
        t = len(str(self.num_itrs))
        parts = [f"[{self.itr:0{t}d}/{self.num_itrs:0{t}d}]"]
        record = {"itr": self.itr, "epoch": self.epoch}
        for k, meter in self.loss_meters.items():
            parts.append(f"{k} {meter.item():.3f} |")
            record[f"train/{k}"] = meter.item()
            meter.reset()
        record["itr_time"] = self.timer.item()
        parts.append(time_str(self.timer.item()))
        self.timer.reset()
        self.logger.write(" ".join(parts))
        # metrics.jsonl + env-gated wandb push (replaces the reference's
        # hardcoded-key wandb logging, libs/helper/utils.py:100-141)
        self.metrics_sink.log(record, step=self.itr)
