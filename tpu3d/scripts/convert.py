"""Parallel dataset conversion CLI (reference parity: scripts/convert.py).

    python -m tpu3d.scripts.convert --datasets argo+nusc+lyft+waymo
"""

import argparse
import multiprocessing as _mp

from .. import convert
from ..config.paths import raw_path_dic

mp = _mp.get_context("spawn")


def main(argv=None):
    parser = argparse.ArgumentParser(description="convert datasets to KITTI")
    parser.add_argument("--datasets", type=str, default="argo+nusc+lyft+waymo")
    args = parser.parse_args(argv)
    processes = []
    for dataset in args.datasets.split("+"):
        p = mp.Process(
            target=getattr(convert, f"{dataset}_to_kitti"),
            args=(raw_path_dic[dataset],
                  raw_path_dic[f"{dataset}-in-kitti-format"]))
        p.start()
        processes.append(p)
        print(f"starting to convert {dataset} to KITTI format ...")
    for p in processes:
        p.join()


if __name__ == "__main__":
    main()
