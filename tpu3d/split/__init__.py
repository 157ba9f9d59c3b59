"""tpu3d.split — the paper's canonical train/val splits for all 5 datasets.

The committed {dataset}/{train,val}.txt id lists are the exact data files the
paper uses (reference parity: split/ — kitti 3712/3769, argo 13122/5015,
nusc 11040/3026, lyft 12599/3024, waymo 12000/3000 ids).
"""

from .replace_split import replace_split
from .gen_car_split import gen_car_splits, has_car, is_valid_car

__all__ = ["replace_split", "gen_car_splits", "has_car", "is_valid_car"]
