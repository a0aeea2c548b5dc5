"""Config system semantics (reference: libs/core/opt.py, libs/core/utils.py):
merge order, int->float coercion, diff-based experiment naming, derived
fields, eval-data backfill, snapshot round-trip, unknown-key rejection."""

import os

import pytest
import yaml

from decafnet_tpu.core import (
    CfgNode,
    get_cfg_defaults,
    setup_cfg,
    update_opt,
    update_eval_data,
    update_from,
    generate_expname,
    diff_dict,
)


def test_merge_from_list_coercion_and_rejection():
    cfg = get_cfg_defaults("grounder")
    cfg.merge_from_list(["model.sratio", "1", "train.batch_size", "8"])
    assert cfg.model.sratio == 1.0 and isinstance(cfg.model.sratio, float)
    assert cfg.train.batch_size == 8
    with pytest.raises(KeyError):
        cfg.merge_from_list(["model.not_a_key", "1"])
    with pytest.raises(AssertionError):
        cfg.merge_from_list(["model.sratio"])


def test_merge_from_file_and_tuple_coercion(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text(yaml.safe_dump({
        "model": {"vid_net": {"arch": [2, 0, 5]}, "sratio": 0.3},
        "eval": {"iou_threshs": [0.1, 0.3, 0.5]},
    }))
    cfg = get_cfg_defaults("grounder")
    cfg.merge_from_file(str(f))
    assert cfg.model.vid_net.arch == (2, 0, 5)   # tuple coercion
    assert cfg.eval.iou_threshs == (0.1, 0.3, 0.5)
    assert cfg.model.sratio == 0.3


def test_update_opt_derived_fields():
    cfg = get_cfg_defaults("grounder")
    cfg.model.vid_net.max_seq_len = 2304
    cfg.model.vid_net.arch = (2, 0, 7)
    update_opt(cfg)
    assert cfg.model.max_vid_len == 2304
    assert cfg.data.max_vid_len == 2304 * cfg.model.vid_net.stride
    assert cfg.model.num_fpn_levels == 7
    assert cfg.pt_gen.max_seq_len == 2304 * 4
    assert cfg.model.fusion.vid_dim == cfg.model.vid_net.embd_dim
    assert cfg.model.reg_head.num_fpn_levels == 7


def test_update_eval_data_backfill():
    cfg = get_cfg_defaults("grounder")
    cfg.data.anno_file = "/x/anno.json"
    cfg.data.eval_split = "val"
    update_eval_data(cfg)
    assert cfg.eval.data.anno_file == "/x/anno.json"
    assert cfg.eval.data.split == "val"
    assert cfg.data.split == "train"


def test_expname_from_diff(tmp_path):
    default = get_cfg_defaults("grounder")
    cfg = default.clone()
    name = generate_expname(cfg, default)
    assert name == "default"
    cfg.model.sratio = 0.3
    cfg.train.batch_size = 8
    name = generate_expname(cfg, default)
    assert "Model.Sratio:0.3" in name and "Train.BatchSize:8" in name

    f = tmp_path / "nlq.yaml"
    f.write_text(yaml.safe_dump({"model": {"sratio": 0.3}}))
    cfg2 = default.clone()
    cfg2.merge_from_file(str(f))
    # sratio difference is explained by the file, so only the stem shows
    assert generate_expname(cfg2, default, [str(f)]) == "nlq"


def test_diff_dict_skips_aux():
    default = get_cfg_defaults("grounder")
    cfg = default.clone()
    cfg.aux.mark = "x"
    cfg.model.sn = 30
    d = diff_dict(default, cfg)
    assert d == {"model.sn": 30}


def test_setup_cfg_snapshot_seed_resume(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text(yaml.safe_dump({"task": "grounder",
                                 "log": {"root": str(tmp_path / "log")},
                                 "model": {"sn": 30}}))
    cfg = setup_cfg([str(f)])
    assert cfg.model.sn == 30
    assert cfg.seed is not None
    os.makedirs(cfg.aux.logdir, exist_ok=True)
    cfg.dump_to_file(os.path.join(cfg.aux.logdir, "opt.yaml"))

    # same experiment -> same logdir -> seed resumed from snapshot
    cfg2 = setup_cfg([str(f)])
    assert cfg2.aux.logdir == cfg.aux.logdir
    assert cfg2.seed == cfg.seed


def test_update_from_backfills_new_defaults():
    old = CfgNode.from_dict({"task": "grounder",
                             "model": {"sratio": 0.3}})
    new = update_from(old, get_cfg_defaults("grounder"))
    assert new.model.sratio == 0.3            # snapshot wins
    assert new.model.sn == 60                 # default backfilled
    assert "nms" in new and new.nms.sigma == 0.9


def test_task_defaults():
    mad = get_cfg_defaults("mad")
    assert mad.eval.max_vid_len == 32768
    assert mad.train.microbatch_size == 1
    cha = get_cfg_defaults("charades")
    assert cha.data.group_method is None
