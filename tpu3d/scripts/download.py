"""Parallel dataset download CLI (reference parity: scripts/download.py).

    python -m tpu3d.scripts.download --datasets kitti+argo+waymo
"""

import argparse
import multiprocessing as _mp

from .. import download
from ..config.paths import raw_path_dic

mp = _mp.get_context("spawn")


def main(argv=None):
    parser = argparse.ArgumentParser(description="download datasets")
    parser.add_argument("--datasets", type=str, default="kitti+argo+waymo")
    args = parser.parse_args(argv)
    processes = []
    for dataset in args.datasets.split("+"):
        p = mp.Process(target=getattr(download, f"download_{dataset}"),
                       args=(raw_path_dic[dataset],))
        p.start()
        processes.append(p)
        print(f"starting to download {dataset} ...")
    for p in processes:
        p.join()


if __name__ == "__main__":
    main()
