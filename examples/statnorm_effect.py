"""Statistical-normalization effect study — the paper's core claim, end to end.

Builds two synthetic domains with shifted car-size statistics (domain A =
KITTI-like cars, domain B = larger US-like cars — the paper's "train in
Germany, test in the USA" gap in miniature), then measures cross-domain
Car AP_3D with and without statistical normalization:

  1. train on A                -> eval on B   (domain gap: low AP)
  2. statnorm-convert A to B's stats (tpu3d.stat_norm.norm.convert, the
     method under test) -> train on A_scaledto_B -> eval on B (AP recovers)
  3. train on A -> eval on A   (in-domain ceiling, for context)

Reference: stat_norm/norm.py:186-244 (rescale), the paper's 5x5 matrix
validation (arXiv:2005.08139). Training/eval run as the real CLIs in
subprocesses (fresh config each), on whatever backend JAX picks (TPU here;
TPU3D_PLATFORM=cpu works but is slow).

Usage:
  python examples/statnorm_effect.py --out /tmp/statnorm_fx --epochs 120
Writes <out>/summary.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tpu3d.datasets.synthetic import create_synthetic_kitti  # noqa: E402
from tpu3d.stat_norm.norm import convert  # noqa: E402
from tpu3d.stat_norm.stat import get_dataset_stats  # noqa: E402

KITTI_CARS = (1.52, 1.63, 3.88)  # h, w, l — KITTI-like statistics
US_CARS = (1.80, 2.00, 5.00)  # larger cars, the paper's USA-style shift


def stat_layout(kitti_root: str, out_root: str) -> str:
    """Bridge a KITTI/object layout into the stat_norm interchange layout
    (<root>/{train,val,trainval}.txt + <root>/training -> object/training)."""
    os.makedirs(out_root, exist_ok=True)
    ids = {}
    for split in ("train", "val"):
        src = os.path.join(kitti_root, "KITTI", "ImageSets", f"{split}.txt")
        with open(src) as f:
            ids[split] = [x.strip() for x in f if x.strip()]
        shutil.copyfile(src, os.path.join(out_root, f"{split}.txt"))
    with open(os.path.join(out_root, "trainval.txt"), "w") as f:
        f.write("\n".join(ids["train"] + ids["val"]) + "\n")
    link = os.path.join(out_root, "training")
    if not (os.path.islink(link) or os.path.exists(link)):
        os.symlink(os.path.join(kitti_root, "KITTI", "object", "training"),
                   link)
    return out_root


def kitti_layout(stat_root: str, out_root: str) -> str:
    """Bridge back: stat_norm layout -> KITTI/object layout for the loaders."""
    obj = os.path.join(out_root, "KITTI", "object")
    imagesets = os.path.join(out_root, "KITTI", "ImageSets")
    os.makedirs(obj, exist_ok=True)
    os.makedirs(imagesets, exist_ok=True)
    link = os.path.join(obj, "training")
    if not (os.path.islink(link) or os.path.exists(link)):
        os.symlink(os.path.join(stat_root, "training"), link)
    for split in ("train", "val"):
        shutil.copyfile(os.path.join(stat_root, f"{split}.txt"),
                        os.path.join(imagesets, f"{split}.txt"))
    return out_root


def run(cmd: list[str]) -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, env=env)


def train_once(tag: str, train_root: str, args) -> str:
    """Train joint PointRCNN on train_root; returns the checkpoint dir."""
    out_train = os.path.join(args.out, f"train_{tag}")
    ckpt = os.path.join(out_train, "ckpt")
    if not (args.skip_train and os.path.isdir(ckpt)):
        run([sys.executable, "-m", "tpu3d.tools.train_rcnn",
             "--cfg_file", args.cfg, "--train_mode", "joint",
             "--data_root", train_root, "--batch_size", str(args.batch_size),
             "--epochs", str(args.epochs), "--output_dir", out_train,
             "--ckpt_save_interval", str(args.epochs), "--workers", "2"])
    return ckpt


def eval_and_score(tag: str, ckpt: str, eval_root: str, args) -> dict:
    """Eval a checkpoint on eval_root's val split, score with the standalone
    evaluator; returns the Car 3D/BEV AP summary."""
    out_eval = os.path.join(args.out, f"eval_{tag}")
    run([sys.executable, "-m", "tpu3d.tools.eval_rcnn",
         "--cfg_file", args.cfg, "--eval_mode", "joint",
         "--data_root", eval_root, "--batch_size", str(args.batch_size),
         "--ckpt_dir", ckpt, "--output_dir", out_eval, "--workers", "2"])

    from tpu3d.evaluate.evaluate import evaluate as ap_evaluate

    result_path = os.path.join(out_eval, "final_result", "data")
    _, ret = ap_evaluate(
        result_path,
        label_path=os.path.join(eval_root, "KITTI", "object", "training",
                                "label_2"),
        label_split_file=os.path.join(eval_root, "KITTI", "ImageSets",
                                      "val.txt"),
        metric="new", current_class=0)
    return {k: float(v) for k, v in ret.items() if "3d" in k or "bev" in k}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/statnorm_effect")
    ap.add_argument("--cfg", default="configs/quickstart.yaml")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse existing checkpoints when present")
    ap.add_argument("--reverse", action="store_true",
                    help="swap the domains (train on US-sized cars, test on "
                         "KITTI-sized): the method is symmetric")
    args = ap.parse_args()
    global KITTI_CARS, US_CARS
    if args.reverse:
        KITTI_CARS, US_CARS = US_CARS, KITTI_CARS
    args.out = os.path.abspath(args.out)
    os.makedirs(args.out, exist_ok=True)

    # refuse to mix directions/settings in one output dir: a stale forward
    # run's domains/stat caches/checkpoints would silently masquerade as the
    # new configuration
    marker_path = os.path.join(args.out, "domains.json")
    marker = {"a_dims": list(KITTI_CARS), "b_dims": list(US_CARS),
              "frames": args.frames}
    if os.path.exists(marker_path):
        with open(marker_path) as f:
            prior = json.load(f)
        if prior != marker:
            raise SystemExit(
                f"{args.out} holds a run with different domains/settings "
                f"({prior} vs {marker}); use a fresh --out")
    else:
        with open(marker_path, "w") as f:
            json.dump(marker, f)

    # 1. two domains with shifted car-size statistics
    dom_a = os.path.join(args.out, "domain_a")
    dom_b = os.path.join(args.out, "domain_b")
    if not os.path.isdir(os.path.join(dom_a, "KITTI")):
        create_synthetic_kitti(dom_a, n_frames=args.frames, seed=1,
                               image_files=True, car_dims_mean=KITTI_CARS)
    if not os.path.isdir(os.path.join(dom_b, "KITTI")):
        create_synthetic_kitti(dom_b, n_frames=args.frames, seed=2,
                               image_files=True, car_dims_mean=US_CARS)

    # 2. car-size statistics per domain (label_stats_train.json caches)
    stat_a = stat_layout(dom_a, os.path.join(args.out, "stat_a"))
    stat_b = stat_layout(dom_b, os.path.join(args.out, "stat_b"))
    sa = get_dataset_stats(stat_a)
    sb = get_dataset_stats(stat_b)
    print("domain A car stats:", json.dumps(sa))
    print("domain B car stats:", json.dumps(sb))

    # 3. statistical normalization: rescale A's cars to B's statistics
    rescaled_parent = os.path.join(args.out, "rescaled")
    converted = convert("syn_a", "syn_b", spath=stat_a, dpath=rescaled_parent,
                        dst_stats_path=stat_b, image_size=(1242, 375))
    a2b = kitti_layout(converted, os.path.join(args.out, "domain_a2b"))
    s_a2b = get_dataset_stats(stat_layout(
        a2b, os.path.join(args.out, "stat_a2b")), force=True)
    print("A_scaledto_B car stats:", json.dumps(s_a2b))

    # 4. the three runs (the A model is trained once, evaluated twice)
    ckpt_a = train_once("a", dom_a, args)
    ckpt_a2b = train_once("a2b", a2b, args)
    results = {
        "A->B (no adaptation)": eval_and_score("a_on_b", ckpt_a, dom_b, args),
        "A_scaledto_B->B (statnorm)": eval_and_score("a2b_on_b", ckpt_a2b,
                                                     dom_b, args),
        "A->A (in-domain ceiling)": eval_and_score("a_on_a", ckpt_a, dom_a,
                                                   args),
    }
    summary = {"stats": {"A": sa, "B": sb, "A_scaledto_B": s_a2b},
               "results": results}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    print("\n| run | " + " | ".join(
        next(iter(results.values())).keys()) + " |")
    for name, r in results.items():
        print(f"| {name} | " + " | ".join(f"{v:.2f}" for v in r.values())
              + " |")


if __name__ == "__main__":
    main()
