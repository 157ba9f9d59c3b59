"""tpu3d.datasets — host-side input pipeline (fixed-shape batches for device)."""

from .kitti_dataset import KittiDataset
from .kitti_rcnn_dataset import MAX_GT, KittiRCNNDataset
from .loader import BatchLoader, device_prefetch
from .synthetic import create_synthetic_kitti

__all__ = ["KittiDataset", "KittiRCNNDataset", "MAX_GT", "BatchLoader",
           "create_synthetic_kitti", "device_prefetch"]
