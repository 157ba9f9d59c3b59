"""Swap dataset split files for the paper's canonical ones.

Reference parity: split/replace_split.py — existing {train,val}.txt are renamed
to *_original.txt once, then the committed splits are copied in.
"""

from __future__ import annotations

import os
import shutil

DATASETS = ["kitti", "argo", "nusc", "lyft", "waymo"]
SPLITS = ["train", "val"]


def replace_split(path_dic: dict) -> None:
    """path_dic maps dataset name (kitti / {x}-in-kitti-format) -> dataset dir."""
    source_dir = os.path.dirname(os.path.abspath(__file__))
    for dataset in DATASETS:
        src = os.path.join(source_dir, dataset)
        key = dataset if dataset == "kitti" else dataset + "-in-kitti-format"
        dst = path_dic[key]
        for split in SPLITS:
            dst_file = os.path.join(dst, f"{split}.txt")
            dst_original = os.path.join(dst, f"{split}_original.txt")
            if os.path.isfile(dst_file) and not os.path.isfile(dst_original):
                os.rename(dst_file, dst_original)
            shutil.copyfile(os.path.join(src, f"{split}.txt"), dst_file)


if __name__ == "__main__":
    from ..config.paths import raw_path_dic

    replace_split(raw_path_dic)
