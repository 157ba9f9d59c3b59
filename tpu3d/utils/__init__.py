"""tpu3d.utils — logging, checkpoints, misc host utilities."""

from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_part_ckpt,
    save_checkpoint,
)
from .logging import create_logger, create_tb_writer

__all__ = ["latest_checkpoint", "load_checkpoint", "load_part_ckpt",
           "save_checkpoint", "create_logger", "create_tb_writer"]
