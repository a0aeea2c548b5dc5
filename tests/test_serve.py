"""Serving surface (decafnet_tpu/serve.py + serve.py HTTP CLI): the
checkpoint-resident GroundingService must reproduce the Evaluator's
detections exactly (same decode path, loader-free), and the HTTP endpoint
must round-trip them. The reference has no serving surface (its Evaluator
is dataset-bound bs=1, libs/worker_v2.py:726-814)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from decafnet_tpu.core import get_cfg_defaults, update_opt, update_eval_data
from decafnet_tpu.data import (apply_synthetic_cfg, batchify_train,
                               make_synthetic_dataset)
from decafnet_tpu.eval import Evaluator
from decafnet_tpu.models import make_model
from decafnet_tpu.serve import GroundingService


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_synth")
    return make_synthetic_dataset(str(root), num_videos=3, num_queries=3,
                                  clip_range=(40, 130), seed=11)


@pytest.fixture(scope="module")
def cfg(synth):
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = 64
    cfg.model.vid_net.arch = (1, 0, 3)
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.5
    cfg.model.sn = 8
    cfg.train.num_workers = 0
    cfg.seed = 5
    apply_synthetic_cfg(cfg, synth)
    update_opt(cfg)
    update_eval_data(cfg)
    return cfg


@pytest.fixture(scope="module")
def evaluator_and_params(cfg):
    ev = Evaluator(cfg, train_time=True)
    model = make_model(cfg)
    sample = [s for s in (ev.dataset[i] for i in range(len(ev.dataset)))
              if s["vid"].shape[1] <= cfg.data.max_vid_len][0]
    b = batchify_train([sample], cfg.data.max_vid_len,
                       cfg.data.max_text_len, 1)
    params = model.init(jax.random.PRNGKey(0), b["vid"], b["shallow_vid"],
                        b["vid_masks"], b["text"], b["text_cls"],
                        b["text_masks"], deterministic=True)["params"]
    return ev, params


def _service_request(sample):
    """The GroundingService argument view of a dataset sample."""
    return dict(
        vid=sample["vid"], shallow_vid=sample["shallow_vid"],
        texts=sample["text"], text_cls=sample["text_cls"],
        fps=sample["fps"], duration=sample["duration"],
        clip_size=sample["clip_size"], clip_stride=sample["clip_stride"])


def test_service_matches_evaluator(cfg, evaluator_and_params):
    ev, params = evaluator_and_params
    service = GroundingService(cfg, params=params)

    for i in range(len(ev.dataset)):
        sample = ev.dataset[i]
        _, expected, _ = ev.predict_video(sample, params)
        got = service.ground(**_service_request(sample))
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            np.testing.assert_allclose(
                np.asarray(g["segments"], np.float32).reshape(-1, 2),
                np.asarray(e["segments"], np.float32).reshape(-1, 2),
                rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(g["scores"]),
                                       np.asarray(e["scores"]),
                                       rtol=1e-6, atol=1e-6)


def test_service_shape_bucket_reuse(cfg, evaluator_and_params):
    """Requests in the same (T, Q, L) bucket reuse one compiled program."""
    ev, params = evaluator_and_params
    service = GroundingService(cfg, params=params)
    sample = ev.dataset[0]
    service.ground(**_service_request(sample))
    n_compiled = len(service._ev._decode_cache)
    service.ground(**_service_request(sample))
    assert len(service._ev._decode_cache) == n_compiled


def test_ground_many_matches_per_request(cfg, evaluator_and_params):
    """Batched serving: same-bucket videos decode stacked (V videos x Q
    rows, pow-2 padded with inert copies); detections must equal the
    per-request path exactly."""
    ev, params = evaluator_and_params
    service = GroundingService(cfg, params=params)

    requests = [_service_request(ev.dataset[i])
                for i in range(len(ev.dataset))]
    expected = [service.ground(**r) for r in requests]
    batched = service.ground_many(requests)

    assert len(batched) == len(expected)
    for got_video, exp_video in zip(batched, expected):
        assert len(got_video) == len(exp_video)
        for g, e in zip(got_video, exp_video):
            np.testing.assert_allclose(
                np.asarray(g["segments"], np.float32).reshape(-1, 2),
                np.asarray(e["segments"], np.float32).reshape(-1, 2),
                rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(g["scores"]),
                                       np.asarray(e["scores"]),
                                       rtol=1e-6, atol=1e-6)

    # if any bucket held >1 video, a stacked (V>1) program must have run
    buckets = {}
    for r in requests:
        _, items = service._prepare(**r)
        for item in items:
            k = service._ev._bucket_key(item)
            buckets[k] = buckets.get(k, 0) + 1
    if any(v > 1 for v in buckets.values()):
        assert any(key[4] > 1 for key in service._ev._decode_cache), (
            "same-bucket videos were not stacked")


def test_service_from_logdir(cfg, tmp_path):
    """The serve.py CLI contract: a trained experiment dir (opt.yaml +
    checkpoint) stands up a service whose detections match an Evaluator
    loading the same EMA weights."""
    import os

    from decafnet_tpu.serve import service_from_logdir
    from decafnet_tpu.train import Trainer

    logdir = str(tmp_path / "exp")
    cfg = cfg.clone()
    cfg.aux.logdir = logdir
    cfg.aux.dryrun = True
    cfg.train.batch_size = 2
    cfg.train.microbatch_size = 1
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 0
    trainer = Trainer(cfg)
    trainer.run()
    trainer.checkpoint()
    os.makedirs(logdir, exist_ok=True)
    cfg.dump_to_file(os.path.join(logdir, "opt.yaml"))

    service = service_from_logdir(logdir, "last")

    ev_cfg = cfg.clone()
    ev_cfg.aux.ckpt = "last"
    ev = Evaluator(ev_cfg)  # loads models/last.msgpack (EMA branch)
    sample = ev.dataset[0]
    _, expected, _ = ev.predict_video(sample, ev.params)
    got = service.ground(**_service_request(sample))
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        np.testing.assert_allclose(
            np.asarray(g["segments"], np.float32).reshape(-1, 2),
            np.asarray(e["segments"], np.float32).reshape(-1, 2),
            rtol=1e-6, atol=1e-6)


def test_http_roundtrip(cfg, evaluator_and_params, tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(
        __file__).resolve().parents[1]))
    from serve import make_handler
    from http.server import ThreadingHTTPServer

    ev, params = evaluator_and_params
    service = GroundingService(cfg, params=params)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        sample = ev.dataset[1]
        # mixed transport: vid via .npy path, the rest inline
        vid_path = tmp_path / "vid.npy"
        np.save(vid_path, sample["vid"].astype(np.float32))
        req = {
            "vid_path": str(vid_path),
            "shallow_vid": np.asarray(sample["shallow_vid"]).tolist(),
            "texts": [np.asarray(t).tolist() for t in sample["text"]],
            "text_cls": np.asarray(sample["text_cls"]).tolist(),
            "fps": sample["fps"], "duration": sample["duration"],
            "clip_size": sample["clip_size"],
            "clip_stride": sample["clip_stride"],
        }
        data = json.dumps(req).encode()
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/ground", data=data,
            headers={"Content-Type": "application/json"}), timeout=120)
        got = json.loads(r.read())["detections"]

        expected = service.ground(**_service_request(sample))
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            np.testing.assert_allclose(g["segments"], e["segments"],
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(g["scores"], e["scores"],
                                       rtol=1e-6, atol=1e-6)

        # malformed request -> structured 400, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/ground", data=b'{"vid": [[0.0]]}',
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()
        server.server_close()
