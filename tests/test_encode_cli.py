"""End-to-end encode CLI: synthetic raw frames -> encode.py -> feature
files -> dataset loaders -> full Evaluator run. The reference has no encode
path at all (features arrive precomputed, libs/data/dataset.py:363-407);
this proves the repo can produce every input file its own datasets consume."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import encode as encode_cli  # repo-root CLI
from decafnet_tpu.core import get_cfg_defaults, update_opt, update_eval_data
from decafnet_tpu.data import apply_synthetic_cfg, make_synthetic_dataset

FEAT_DIM = 32  # must match vid/shallow dims of the synthetic annotations


@pytest.fixture(scope="module")
def encoded(tmp_path_factory):
    root = tmp_path_factory.mktemp("encode_cli")
    paths = make_synthetic_dataset(
        str(root / "ds"), num_videos=2, num_queries=2, clip_range=(9, 14),
        vid_dim=FEAT_DIM, shallow_dim=FEAT_DIM, text_dim=24, seed=5)

    # raw frames for every annotated video, clip counts matching the anno
    anno = json.load(open(paths["anno_file"]))
    frames_dir = root / "frames"
    os.makedirs(frames_dir)
    rng = np.random.RandomState(0)
    for split in anno:
        for vid_id, info in anno[split].items():
            frames = rng.randint(
                0, 256, size=(info["num_clips"], 2, 16, 16, 3),
                dtype=np.uint8)
            np.save(frames_dir / f"{vid_id}.npy", frames)

    out_e = root / "expert_features"
    out_s = root / "sidekick_features"
    opt = json.dumps({"patch_size": 8, "dim": 16, "depth": 1, "heads": 2,
                      "out_dim": FEAT_DIM})
    rc = encode_cli.main([
        "--frames_dir", str(frames_dir),
        "--out_expert_dir", str(out_e),
        "--out_sidekick_dir", str(out_s),
        "--expert", "factorized", "--expert_opt", opt,
        "--sidekick", "factorized", "--sidekick_opt", opt,
        "--frames", "2", "--input_res", "16",
    ])
    assert rc == 0
    return paths, anno, str(out_e), str(out_s)


def test_encode_cli_writes_dataset_layout(encoded):
    paths, anno, out_e, out_s = encoded
    for split in anno:
        for vid_id, info in anno[split].items():
            for d in (out_e, out_s):
                feat = np.load(os.path.join(d, f"{vid_id}.npy"))
                assert feat.shape == (info["num_clips"], FEAT_DIM)
                assert feat.dtype == np.float32
                assert np.isfinite(feat).all()


def test_encode_cli_deterministic(encoded, tmp_path):
    """Same frames + same seed -> bitwise identical features."""
    paths, anno, out_e, out_s = encoded
    vid_id = sorted(anno["val"])[0]
    frames_dir = tmp_path / "frames2"
    os.makedirs(frames_dir)
    src = os.path.join(os.path.dirname(out_e), "frames", f"{vid_id}.npy")
    np.save(frames_dir / f"{vid_id}.npy", np.load(src))
    out2 = tmp_path / "expert2"
    opt = json.dumps({"patch_size": 8, "dim": 16, "depth": 1, "heads": 2,
                      "out_dim": FEAT_DIM})
    encode_cli.main([
        "--frames_dir", str(frames_dir), "--out_expert_dir", str(out2),
        "--expert", "factorized", "--expert_opt", opt,
        "--frames", "2", "--input_res", "16",
    ])
    a = np.load(os.path.join(out_e, f"{vid_id}.npy"))
    b = np.load(out2 / f"{vid_id}.npy")
    np.testing.assert_array_equal(a, b)


def test_encoded_features_drive_full_eval(encoded):
    """The CLI's output files feed the real dataset -> Evaluator chain."""
    import jax

    from decafnet_tpu.data import batchify_train
    from decafnet_tpu.eval import Evaluator
    from decafnet_tpu.models import make_model

    paths, anno, out_e, out_s = encoded
    cfg = get_cfg_defaults("grounder")
    cfg.model.name = "iter"
    cfg.model.vid_net.in_dim = FEAT_DIM
    cfg.model.vid_net.embd_dim = 16
    cfg.model.vid_net.max_seq_len = 16
    cfg.model.vid_net.arch = (1, 0, 2)
    cfg.model.text_net.in_dim = 24
    cfg.model.text_net.embd_dim = 16
    cfg.model.text_net.n_layers = 1
    cfg.model.fusion.n_layers = 1
    cfg.model.sratio = 0.5
    cfg.model.sn = 4
    cfg.train.num_workers = 0
    cfg.seed = 1
    apply_synthetic_cfg(cfg, paths)
    # swap the fabricated features for the CLI-encoded ones
    cfg.data.vid_feat_dir = out_e
    cfg.data.shallow_vid_feat_dir = out_s
    cfg.eval.data.vid_feat_dir = out_e
    cfg.eval.data.shallow_vid_feat_dir = out_s
    update_opt(cfg)
    update_eval_data(cfg)

    ev = Evaluator(cfg, train_time=True)
    model = make_model(cfg)
    sample = ev.dataset[0]
    b = batchify_train([sample], cfg.data.max_vid_len,
                       cfg.data.max_text_len, 1)
    params = model.init(jax.random.PRNGKey(0), b["vid"], b["shallow_vid"],
                        b["vid_masks"], b["text"], b["text_cls"],
                        b["text_masks"], deterministic=True)["params"]
    metrics = ev.run(ema_params=params)
    assert ev.meter.text_cnt == 4  # 2 val videos x 2 queries
    assert np.isfinite(metrics).all()
