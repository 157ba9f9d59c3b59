"""tpu3d.download — dataset acquisition (reference parity: download/__init__.py).

nuScenes and Lyft require manual browser downloads in the reference too; the
download_{kitti,argo,waymo} entry points fetch everything fetchable by URL.
"""

from .kitti import download_kitti
from .argo import download_argo
from .waymo import download_waymo

__all__ = ["download_kitti", "download_argo", "download_waymo"]
