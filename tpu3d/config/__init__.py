"""tpu3d.config — global detector config + dataset path registry."""

from .config import (
    AttrDict,
    cfg,
    cfg_from_file,
    cfg_from_list,
    fresh_cfg,
    save_config_to_file,
)
from . import paths

__all__ = ["AttrDict", "cfg", "cfg_from_file", "cfg_from_list", "fresh_cfg",
           "save_config_to_file", "paths"]
