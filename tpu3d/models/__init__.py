"""tpu3d.models — PointRCNN model family (flax, fixed shapes, jittable)."""

from .bbox_codec import decode_bbox_target, reg_channels
from .point_rcnn import PointRCNN, rcnn_extra_features
from .pointnet2 import (
    BatchNorm,
    Pointnet2MSG,
    PointnetFPModule,
    PointnetSAModule,
    PointnetSAModuleMSG,
    SharedMLP,
)
from .proposal import proposal_layer
from .proposal_target import proposal_target_layer
from .rcnn import RCNNNet
from .rpn import RPN
from .train_functions import get_rcnn_loss, get_rpn_loss, model_loss
from . import losses

__all__ = [
    "decode_bbox_target", "reg_channels", "PointRCNN", "rcnn_extra_features",
    "BatchNorm", "Pointnet2MSG", "PointnetFPModule", "PointnetSAModule",
    "PointnetSAModuleMSG", "SharedMLP", "proposal_layer",
    "proposal_target_layer", "RCNNNet", "RPN", "get_rcnn_loss", "get_rpn_loss",
    "model_loss", "losses",
]
