"""KITTI 3D object benchmark download (reference parity: download/kitti.py)."""

from __future__ import annotations

import os

from .utils import download_gdrive, download_url, unzip

# http://www.cvlibs.net/datasets/kitti/eval_object.php?obj_benchmark=3d
S3_BASE = "https://s3.eu-central-1.amazonaws.com/avg-kitti"
ZIP_NAMES = ["data_object_image_2.zip", "data_object_image_3.zip",
             "data_object_velodyne.zip", "data_object_calib.zip",
             "data_object_label_2.zip"]

# the AVOD project's split files (https://github.com/kujason/avod)
GDRIVE_SPLITS = {
    "train": "14v045QtiTo7rz4WA7SiBx4Ge29M1fdkx",
    "val": "1FKeWeDJlQLqNB6KjQuUQpdlVe31aUy5t",
    "trainval": "1r2M_XnBQ533Je_DFiiolmQrnstcKghcR",
}


def download_kitti(dst: str, delete_zips: bool = True) -> None:
    for name in ZIP_NAMES:
        local = download_url(f"{S3_BASE}/{name}", dst)
        unzip(local, delete_zips=delete_zips)
    for token in GDRIVE_SPLITS.values():
        download_gdrive(token, dst)
    with open(os.path.join(dst, "test.txt"), "w") as f:
        f.write("\n".join(f"{x:06d}" for x in range(7518)))
    print(f"KITTI dataset has been downloaded to {dst}")
