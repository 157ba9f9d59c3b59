"""tpu3d.convert — dataset converters to the KITTI interchange format.

Reference parity: convert/__init__.py — {argo,nusc,lyft,waymo}_to_kitti(raw,
kitti). Dataset SDKs (argoverse-api, nuscenes-devkit, lyft-devkit,
waymo_open_dataset+TF) are lazy-imported: the framework works without them, and
each converter raises a clear ImportError naming its requirement when used.
Shared KITTI-writing logic lives in kitti_format (the reference duplicates it
per converter).
"""

from .argo2kitti import argo_to_kitti
from .lyft2kitti import lyft_to_kitti
from .nusc2kitti import nusc_to_kitti
from .waymo2kitti import waymo_to_kitti
from . import kitti_format

__all__ = ["argo_to_kitti", "lyft_to_kitti", "nusc_to_kitti", "waymo_to_kitti",
           "kitti_format"]
