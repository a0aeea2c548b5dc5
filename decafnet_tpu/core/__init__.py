from .config import (
    CfgNode,
    get_cfg_defaults,
    setup_cfg,
    update_opt,
    update_eval_data,
    update_from,
    generate_expname,
    diff_dict,
)

__all__ = [
    "CfgNode",
    "get_cfg_defaults",
    "setup_cfg",
    "update_opt",
    "update_eval_data",
    "update_from",
    "generate_expname",
    "diff_dict",
]
