from advise_tpu.config.defaults import assert_and_infer_cfg, get_cfg
from advise_tpu.config.node import CfgNode
from advise_tpu.config.parser import load_config, parse_args

__all__ = [
    "CfgNode",
    "get_cfg",
    "assert_and_infer_cfg",
    "parse_args",
    "load_config",
]
