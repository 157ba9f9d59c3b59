"""Statistical-normalization walkthrough (reference parity: notebooks/
stat_norm.ipynb): compute per-dataset car-size stats, rescale one (src, dst)
pair, and render a before/after comparison of one frame.

    python examples/stat_norm_walkthrough.py --src kitti --dst waymo \
        [--frame 000000] [--out compare.png]

Works against the real dataset registry (TPU3D_DATASET_PATH) or --synthetic.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", default="kitti")
    parser.add_argument("--dst", default="waymo")
    parser.add_argument("--frame", default=None)
    parser.add_argument("--out", default="stat_norm_compare.png")
    parser.add_argument("--synthetic", action="store_true",
                        help="demo on generated data under /tmp")
    args = parser.parse_args()

    if args.synthetic:
        os.environ["TPU3D_DATASET_PATH"] = "/tmp/tpu3d_statnorm_demo"

    from tpu3d.config.paths import dataset_path, dataset_paths
    from tpu3d.stat_norm import convert, get_dataset_stats, print_stats

    if args.synthetic:
        import numpy as np

        from tpu3d.datasets.synthetic import create_synthetic_kitti

        for name, dims in ((args.src, (1.52, 1.63, 3.88)),
                           (args.dst, (1.75, 1.93, 5.15))):
            root = dataset_paths[name]
            if not os.path.exists(os.path.join(root, "train.txt")):
                create_synthetic_kitti(root, n_frames=4, image_files=True,
                                       car_dims_mean=dims)
                # flatten KITTI/object layout into the dataset-root layout
                # stat_norm expects ({root}/training/..., {root}/{split}.txt)
                obj = os.path.join(root, "KITTI", "object", "training")
                os.symlink(obj, os.path.join(root, "training"))
                for split in ("train", "val", "trainval"):
                    src_f = os.path.join(root, "KITTI", "ImageSets",
                                         f"{split}.txt")
                    dst_f = os.path.join(root, f"{split}.txt")
                    if not os.path.exists(dst_f):
                        import shutil

                        shutil.copyfile(src_f, dst_f)

    # 1. per-dataset car-size statistics (cached as label_stats_train.json)
    stats = {d: get_dataset_stats(dataset_paths[d])
             for d in (args.src, args.dst)}
    print_stats(stats)

    # 2. rescale src -> dst
    out_root = convert(args.src, args.dst,
                       dpath=os.path.join(dataset_path, "rescaled_datasets"),
                       image_size=(1242, 375))
    print(f"rescaled dataset at {out_root}")

    # 3. before/after render of one frame
    frame = args.frame
    if frame is None:
        with open(os.path.join(dataset_paths[args.src], "trainval.txt")) as f:
            frame = f.readline().strip()
    import matplotlib

    matplotlib.use("Agg")
    from tpu3d.kitti import Calibration, load_velo_scan, read_label
    from tpu3d.utils.viz import showvelo

    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(16, 6),
                             subplot_kw={"projection": "3d"})
    for ax, (tag, root) in zip(axes, (
            ("original", os.path.join(dataset_paths[args.src], "training")),
            ("rescaled", os.path.join(out_root, "training")))):
        velo = load_velo_scan(os.path.join(root, "velodyne", f"{frame}.bin"))
        calib = Calibration(os.path.join(root, "calib", f"{frame}.txt"))
        labels = read_label(os.path.join(root, "label_2", f"{frame}.txt"))
        rect = calib.project_velo_to_rect(velo[:, :3])
        from tpu3d.kitti.object3d import objs_to_boxes3d
        from tpu3d.kitti.boxes import corners_from_boxes3d
        from tpu3d.utils.viz import BOX_EDGES

        import numpy as np

        disp = np.stack([rect[:, 0], rect[:, 2], -rect[:, 1]], axis=1)
        ax.scatter(disp[:, 0], disp[:, 1], disp[:, 2], s=0.3)
        boxes = objs_to_boxes3d([o for o in labels if o.cls_type == "Car"])
        for corners in corners_from_boxes3d(boxes):
            d = np.stack([corners[:, 0], corners[:, 2], -corners[:, 1]], axis=1)
            for a, b in BOX_EDGES:
                ax.plot(*zip(d[a], d[b]), color="red", linewidth=1)
        ax.set_title(tag)
    fig.savefig(args.out, dpi=100)
    print(f"comparison figure saved to {args.out}")


if __name__ == "__main__":
    main()
