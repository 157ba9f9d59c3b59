"""Filter splits to frames containing at least one valid car.

Reference parity: scripts/gen_car_split.py — a car is valid when its 2D height
(+1 px) >= 25, truncation <= 0.5 and occlusion <= 2; the filtered id lists are
shuffled with seed 19260817 and written as {split}_car1.txt.
"""

from __future__ import annotations

import os

import numpy as np

SPLIT_PATH_DIC = {"train": "training", "val": "training"}


def is_valid_car(fields: list[str]) -> bool:
    if len(fields) < 8 or fields[0] != "Car":
        return False
    height = float(fields[7]) - float(fields[5]) + 1
    return (height >= 25 and float(fields[1]) <= 0.5
            and float(fields[2]) <= 2)


def has_car(label_filename: str) -> bool:
    with open(label_filename) as f:
        return any(is_valid_car(line.strip().split(" ")) for line in f
                   if line.strip())


def gen_car_splits(dataset_paths: dict, seed: int = 19260817) -> None:
    rng = np.random.RandomState(seed)
    for dataset, path in dataset_paths.items():
        for split, subdir in SPLIT_PATH_DIC.items():
            with open(os.path.join(path, f"{split}.txt")) as f:
                names = [x.strip() for x in f if x.strip()]
            names = [n for n in names if has_car(
                os.path.join(path, subdir, "label_2", f"{n}.txt"))]
            rng.shuffle(names)
            with open(os.path.join(path, f"{split}_car1.txt"), "w") as f:
                f.write("\n".join(names))


if __name__ == "__main__":
    from ..config.paths import dataset_paths

    gen_car_splits(dataset_paths)
