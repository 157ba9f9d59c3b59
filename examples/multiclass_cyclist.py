"""Multi-class learning evidence: train and score a Cyclist detector.

The class-swap configurations (reference: cfgs/default_cyclist.yaml /
default_people.yaml, lib/config.py class handling) previously had only a
train-step test; this study trains the joint model with CLASSES=Cyclist on
synthetic multi-class scenes (Cars + Pedestrians + Cyclists) at quickstart
scale and scores Cyclist AP with the standalone evaluator — demonstrating the
class machinery learns end to end, not just runs.

Parity note: the reference's default_cyclist.yaml keeps the CAR mean size as
CLS_MEAN_SIZE (its quirk, default_cyclist.yaml:27); pass --cyclist_anchor to
use the cyclist-sized anchor instead.

Usage:
  python examples/multiclass_cyclist.py --out output/multiclass_cyclist
Writes <out>/summary.json; the committed results table lives in
docs/MULTICLASS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from examples.statnorm_effect import run  # noqa: E402
from tpu3d.datasets.synthetic import create_synthetic_kitti  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/multiclass_cyclist")
    ap.add_argument("--cfg", default="configs/quickstart.yaml")
    ap.add_argument("--classes", default="Cyclist",
                    choices=("Cyclist", "Pedestrian", "People"))
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--cyclist_anchor", action="store_true",
                    help="use a cyclist-sized CLS_MEAN_SIZE instead of the "
                         "reference's car-sized quirk")
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()
    args.out = os.path.abspath(args.out)
    os.makedirs(args.out, exist_ok=True)

    root = os.path.join(args.out, "data")
    if not os.path.isdir(os.path.join(root, "KITTI")):
        create_synthetic_kitti(root, n_frames=args.frames, seed=21,
                               image_files=True,
                               extra_classes=("Pedestrian", "Cyclist"))

    overrides = ["CLASSES", args.classes]
    if args.cyclist_anchor:
        overrides += ["CLS_MEAN_SIZE", "[[1.74, 0.60, 1.76]]"]

    out_train = os.path.join(args.out, "train")
    ckpt = os.path.join(out_train, "ckpt")
    if not (args.skip_train and os.path.isdir(ckpt)):
        run([sys.executable, "-m", "tpu3d.tools.train_rcnn",
             "--cfg_file", args.cfg, "--train_mode", "joint",
             "--data_root", root, "--batch_size", str(args.batch_size),
             "--epochs", str(args.epochs), "--output_dir", out_train,
             "--ckpt_save_interval", str(args.epochs), "--workers", "2",
             "--set"] + overrides)

    out_eval = os.path.join(args.out, "eval")
    run([sys.executable, "-m", "tpu3d.tools.eval_rcnn",
         "--cfg_file", args.cfg, "--eval_mode", "joint",
         "--data_root", root, "--batch_size", str(args.batch_size),
         "--ckpt_dir", ckpt, "--output_dir", out_eval, "--workers", "2",
         "--set"] + overrides)

    from tpu3d.evaluate.evaluate import evaluate as ap_evaluate

    cls_idx = {"Car": 0, "Pedestrian": 1, "Cyclist": 2}
    current = cls_idx.get(args.classes, 2)
    _, ret = ap_evaluate(
        os.path.join(out_eval, "final_result", "data"),
        label_path=os.path.join(root, "KITTI", "object", "training",
                                "label_2"),
        label_split_file=os.path.join(root, "KITTI", "ImageSets", "val.txt"),
        metric="new", current_class=current)
    # the evaluator's ret_dict hardcodes "Car_" key names regardless of
    # current_class (reference parity quirk, eval2.py:711-719) — relabel with
    # the class actually evaluated for the study summary
    results = {k.replace("Car_", f"{args.classes}_"): float(v)
               for k, v in ret.items() if "3d" in k or "bev" in k}
    summary = {"classes": args.classes, "epochs": args.epochs,
               "cyclist_anchor": bool(args.cyclist_anchor),
               "results": results}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
