"""Input-pipeline throughput bench: BatchLoader scenes/s vs workers/mode.

Measures (a) the raw per-sample build cost, (b) BatchLoader throughput for
thread and process worker modes at several worker counts, against the
TRAIN-mode KittiRCNNDataset at default.yaml shapes (16384 pts, gt-aug off by
default to isolate loader mechanics; pass --gt_aug to include it).

The question this answers (VERDICT r2 weak #6): can the host feed a v5e-8
running ~8x one chip's eval throughput? See docs/LOADER_SCALING.md for the
measured numbers + the honest extrapolation from this 1-core box.

Usage: python -m tpu3d.tools.bench_loader [--scenes 64] [--workers 1,2,4]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--scenes", type=int, default=64,
                    help="scenes per measurement")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--workers", default="1,2,4",
                    help="comma-separated worker counts")
    ap.add_argument("--npoints", type=int, default=16384)
    ap.add_argument("--gt_aug", action="store_true")
    ap.add_argument("--modes", default="thread,process")
    args = ap.parse_args(argv)

    from tpu3d.config import fresh_cfg
    from tpu3d.datasets import (BatchLoader, KittiRCNNDataset,
                                create_synthetic_kitti)

    root = args.data_root
    if root is None:
        root = "/tmp/tpu3d_loader_bench"
        if not os.path.exists(os.path.join(root, "KITTI")):
            create_synthetic_kitti(root, n_frames=32, image_files=True)

    cfg = fresh_cfg()
    cfg.RPN.NUM_POINTS = args.npoints
    cfg.GT_AUG_ENABLED = bool(args.gt_aug)
    dataset = KittiRCNNDataset(root_dir=root, npoints=args.npoints,
                               split="train", mode="TRAIN", cfg=cfg, seed=0)

    results = {}

    # raw serial build cost (one core, no pipeline)
    n_raw = min(args.scenes, len(dataset) * 2)
    for i in range(4):
        dataset[i % len(dataset)]  # warm caches
    t0 = time.perf_counter()
    for i in range(n_raw):
        dataset[i % len(dataset)]
    dt = time.perf_counter() - t0
    results["serial_scenes_per_sec"] = n_raw / dt
    results["serial_ms_per_scene"] = 1e3 * dt / n_raw
    print(f"serial: {n_raw / dt:.1f} scenes/s "
          f"({1e3 * dt / n_raw:.2f} ms/scene)")

    worker_counts = [int(w) for w in args.workers.split(",")]
    n_batches = max(1, args.scenes // args.batch_size)
    for mode in args.modes.split(","):
        for w in worker_counts:
            loader = BatchLoader(dataset, args.batch_size, shuffle=False,
                                 num_workers=w, drop_last=False,
                                 worker_mode=mode)
            it = iter(loader)
            next(it)  # warm-up batch (forks the pool in process mode)
            t0 = time.perf_counter()
            seen = 1
            for _ in range(n_batches):
                try:
                    next(it)
                    seen += 1
                except StopIteration:
                    it = iter(loader)
                    next(it)
                    seen += 1
            dt = time.perf_counter() - t0
            rate = (seen - 1) * args.batch_size / dt
            results[f"{mode}_w{w}_scenes_per_sec"] = rate
            print(f"{mode:8s} workers={w}: {rate:.1f} scenes/s")
            loader.close()

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
