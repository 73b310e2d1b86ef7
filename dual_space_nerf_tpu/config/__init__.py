from .node import CfgNode
from .defaults import get_cfg_defaults

# Global singleton, mirroring `configs/__init__.py:7` in the reference.
cfg = get_cfg_defaults()

__all__ = ["CfgNode", "cfg", "get_cfg_defaults"]
