"""Dataset preparation walkthrough (reference parity: notebooks/
prepare_datasets.ipynb) — download -> convert -> canonical splits, as a script.

Run stages selectively:

    python examples/prepare_datasets.py --stage download --datasets kitti
    python examples/prepare_datasets.py --stage convert --datasets waymo
    python examples/prepare_datasets.py --stage splits
    python examples/prepare_datasets.py --stage multi_data
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", required=True,
                        choices=["download", "convert", "splits", "multi_data"])
    parser.add_argument("--datasets", type=str, default="kitti")
    args = parser.parse_args()

    from tpu3d.config.paths import dataset_paths, ensure_dirs, raw_path_dic

    ensure_dirs()
    if args.stage == "download":
        from tpu3d import download

        for name in args.datasets.split("+"):
            getattr(download, f"download_{name}")(raw_path_dic[name])
    elif args.stage == "convert":
        from tpu3d import convert

        for name in args.datasets.split("+"):
            getattr(convert, f"{name}_to_kitti")(
                raw_path_dic[name], raw_path_dic[f"{name}-in-kitti-format"])
    elif args.stage == "splits":
        from tpu3d.split import gen_car_splits, replace_split

        replace_split(raw_path_dic)
        gen_car_splits(dataset_paths)
    elif args.stage == "multi_data":
        from tpu3d.tools.generate_multi_data import gen_all_data

        gen_all_data()


if __name__ == "__main__":
    main()
