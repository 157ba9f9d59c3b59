"""Cross-domain source->target matrix — the paper's headline experiment shape,
driven end to end through the REAL batch-inference machinery.

Builds three synthetic domains with shifted car-size statistics
(S = small European-style cars, K = KITTI-like, L = large US-style cars),
trains one PointRCNN per domain, and produces the full 3x3 source->target
Car AP matrix by running `tpu3d.tools.batch_inference` (executed, not
dry-run) over models x domains — the miniature of the reference's 5x5 matrix
(reference: README.md:148-157, tools/batch_inference.py:19-110). Then the
statistical-normalization pass: for every ordered source!=target pair the
source data is rescaled to the target's car statistics
(stat_norm/norm.py:186-244), a model is trained on the rescaled data, and the
adapted matrix is produced by a second batch_inference run (one2one). All
results are scored with the standalone evaluator (new metric).

Usage:
  python examples/domain_matrix.py --out output/domain_matrix --epochs 300
Writes <out>/summary.json and prints the two matrices as markdown
(committed at docs/DOMAIN_MATRIX.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from examples.statnorm_effect import (kitti_layout, run,  # noqa: E402
                                      stat_layout)
from tpu3d.datasets.synthetic import create_synthetic_kitti  # noqa: E402
from tpu3d.stat_norm.norm import convert  # noqa: E402
from tpu3d.stat_norm.stat import get_dataset_stats  # noqa: E402

# h, w, l car-size means per domain — the "train in Germany, test in the
# USA" gap in miniature, three ways
DOMAINS = {
    "S": (1.45, 1.58, 3.60),  # small European-style cars
    "K": (1.52, 1.63, 3.88),  # KITTI-like
    "L": (1.80, 2.00, 5.00),  # large US-style cars
}


def train_model(tag: str, data_root: str, args) -> str:
    out_train = os.path.join(args.out, f"train_{tag}")
    ckpt = os.path.join(out_train, "ckpt")
    if not (args.skip_train and os.path.isdir(ckpt)):
        run([sys.executable, "-m", "tpu3d.tools.train_rcnn",
             "--cfg_file", args.cfg, "--train_mode", "joint",
             "--data_root", data_root, "--batch_size", str(args.batch_size),
             "--epochs", str(args.epochs), "--output_dir", out_train,
             "--ckpt_save_interval", str(args.epochs), "--workers", "2"])
    return ckpt


def score(result_dir: str, eval_root: str) -> dict:
    from tpu3d.evaluate.evaluate import evaluate as ap_evaluate

    _, ret = ap_evaluate(
        os.path.join(result_dir, "final_result", "data"),
        label_path=os.path.join(eval_root, "KITTI", "object", "training",
                                "label_2"),
        label_split_file=os.path.join(eval_root, "KITTI", "ImageSets",
                                      "val.txt"),
        metric="new", current_class=0)
    return {k: float(v) for k, v in ret.items() if "3d" in k or "bev" in k}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/domain_matrix")
    ap.add_argument("--cfg", default="configs/quickstart.yaml")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_adapted", action="store_true",
                    help="only the 3x3 unadapted matrix")
    args = ap.parse_args()
    args.out = os.path.abspath(args.out)
    os.makedirs(args.out, exist_ok=True)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]

    # 1. domains + per-domain car statistics
    roots, stats, stat_roots = {}, {}, {}
    dom_base = os.path.join(args.out, "domains")
    for i, (name, dims) in enumerate(DOMAINS.items()):
        root = os.path.join(dom_base, name)
        if not os.path.isdir(os.path.join(root, "KITTI")):
            create_synthetic_kitti(root, n_frames=args.frames, seed=10 + i,
                                   image_files=True, car_dims_mean=dims)
        roots[name] = root
        stat_roots[name] = stat_layout(
            root, os.path.join(args.out, f"stat_{name}"))
        stats[name] = get_dataset_stats(stat_roots[name])
        print(f"domain {name} car stats:", json.dumps(stats[name]))

    # 2. one base model per domain
    base_ckpts = {s: train_model(s, roots[s], args) for s in DOMAINS}

    # 3. statnorm: rescale every source to every other target's statistics
    #    and train the adapted models
    pairs = [(s, t) for s in DOMAINS for t in DOMAINS if s != t]
    adapted_ckpts = {}
    if not args.skip_adapted:
        for s, t in pairs:
            tag = f"{s}2{t}"
            converted = convert(
                f"syn_{s}", f"syn_{t}", spath=stat_roots[s],
                dpath=os.path.join(args.out, "rescaled", tag),
                dst_stats_path=stat_roots[t], image_size=(1242, 375))
            adapted_root = kitti_layout(
                converted, os.path.join(dom_base, tag))
            adapted_ckpts[tag] = train_model(tag, adapted_root, args)

    # 4. the 3x3 matrix through the real batch_inference CLI
    out_base = os.path.join(args.out, "matrix")
    run([sys.executable, "-m", "tpu3d.tools.batch_inference",
         "--cfg", cfg_name, "--eval_mode", "joint",
         "--models"] + [f"{s}={c}" for s, c in base_ckpts.items()]
        + ["--datasets"] + list(DOMAINS)
        + ["--data_root_base", dom_base, "--out_base", out_base])
    if adapted_ckpts:  # adapted models: each evaluates on its target only
        run([sys.executable, "-m", "tpu3d.tools.batch_inference",
             "--cfg", cfg_name, "--eval_mode", "joint", "--one2one",
             "--models"] + [f"{tag}={c}" for tag, c in adapted_ckpts.items()]
            + ["--datasets"] + [t for _, t in pairs]
            + ["--data_root_base", dom_base, "--out_base", out_base])

    # 5. score everything
    from tpu3d.tools.batch_inference import get_true_name

    fp = 4000
    matrix, adapted = {}, {}
    for s in DOMAINS:
        for t in DOMAINS:
            rd = os.path.join(out_base, get_true_name(s, t, fp, cfg_name))
            matrix[f"{s}->{t}"] = score(rd, roots[t])
    for s, t in pairs if adapted_ckpts else []:
        tag = f"{s}2{t}"
        rd = os.path.join(out_base, get_true_name(tag, t, fp, cfg_name))
        adapted[f"{s}->{t}"] = score(rd, roots[t])

    summary = {"stats": stats, "matrix": matrix, "adapted": adapted}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    def table(results, title):
        print(f"\n### {title} (Car AP_3D@0.7 moderate)\n")
        names = list(DOMAINS)
        print("| train\\test | " + " | ".join(names) + " |")
        print("|---|" + "---|" * len(names))
        for s in names:
            row = []
            for t in names:
                r = results.get(f"{s}->{t}")
                row.append(f"{r['Car_3d_moderate']:.2f}" if r else "—")
            print(f"| {s} | " + " | ".join(row) + " |")

    table(matrix, "No adaptation")
    if adapted:
        table({k: v for k, v in adapted.items()},
              "With statistical normalization (off-diagonal)")


if __name__ == "__main__":
    main()
