"""Dump-diff oracle: the repo's task default trees must reproduce the
reference's (libs/core/opt.py) key-for-key and value-for-value, so a
reference-written opt.yaml round-trips through ``update_from`` unchanged.

The reference depends on yacs (not installed here); its opt.py is executed
with a stub yacs module backed by the repo's own CfgNode, which supports the
same attribute/clone/iteration surface.
"""

import importlib.util
import sys
import types

import pytest

from decafnet_tpu.core import CfgNode, get_cfg_defaults, update_from

REF_OPT = "/root/reference/libs/core/opt.py"

# Reference-internal keys the rebuild intentionally does not carry:
#   * aux.*: azure/wandb/submission plumbing (gpu, wandb_project, wandb_id,
#     distributed, mount, is_submit, region, ntd, pretrain, cache_size, tag,
#     extract_feature, download_mv_feat) -- infra, not semantics; the repo's
#     aux carries its own runtime keys. aux is excluded from expnames in both.
#   * task: the reference's module-global default 'snag' is never updated by
#     get_cfg_defaults (a latent bug there); the repo sets it properly.
EXCLUDE_PREFIXES = ("aux.",)
EXCLUDE_KEYS = {"task"}


def _flatten(node, prefix=""):
    out = {}
    for k, v in node.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


def load_reference_defaults(task):
    """Execute the reference opt.py (fresh module per call -- its CN global
    accumulates) with yacs stubbed by the repo CfgNode."""
    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    saved = {k: sys.modules.get(k) for k in ("yacs", "yacs.config")}
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_config
    try:
        spec = importlib.util.spec_from_file_location("_ref_opt", REF_OPT)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.get_cfg_defaults(task)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.parametrize("task", ["grounder", "mad", "charades"])
def test_task_defaults_match_reference(task):
    ref = _flatten(load_reference_defaults(task))
    got = _flatten(get_cfg_defaults(task))
    missing, wrong = [], []
    for k, v in ref.items():
        if k in EXCLUDE_KEYS or any(k.startswith(p)
                                    for p in EXCLUDE_PREFIXES):
            continue
        if k not in got:
            missing.append(k)
        elif got[k] != v:
            wrong.append((k, got[k], v))
    assert not missing, f"keys missing vs reference defaults: {missing}"
    assert not wrong, f"values differing from reference defaults: {wrong}"


@pytest.mark.parametrize("task", ["grounder", "mad", "charades"])
def test_reference_snapshot_roundtrip(task):
    """A snapshot written from the reference's exact default tree passes
    through update_from without any shared key changing (i.e. a released
    opt.yaml reproduces byte-for-byte; update_from only ADDS repo-only
    keys) (reference: libs/core/utils.py:302-315)."""
    ref = load_reference_defaults(task)
    backfilled = update_from(ref, get_cfg_defaults(task))
    flat_ref = _flatten(ref)
    flat_back = _flatten(backfilled)
    for k, v in flat_ref.items():
        assert flat_back[k] == v, (k, flat_back[k], v)


def test_delegation_keys_only_for_grounder():
    """mad/charades model trees carry only ``norm`` of the delegation knobs,
    exactly like the reference (opt.py:204-255 vs opt.py:77-131)."""
    g = get_cfg_defaults("grounder").model
    m = get_cfg_defaults("mad").model
    for k in ("sratio", "sn", "msf", "scat", "sfonly"):
        assert k in g and k not in m
    assert "norm" in m
    c = get_cfg_defaults("charades").model
    assert c.rdim == 32 and c.rlayer is None and "rdim" not in m
