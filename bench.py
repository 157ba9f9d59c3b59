"""Headline benchmark: PointRCNN inference throughput (scenes/sec) on TPU.

Runs the full two-stage pipeline (16384-point PointNet++ MSG backbone, bin
decode, distance-stratified NMS, ROI pooling, RCNN refinement, final rotated
NMS) at the reference's eval configuration (default.yaml: batch 8 eval,
TEST proposals 9000->100) on synthetic KITTI-format scenes, and prints ONE JSON
line. ``vs_baseline`` compares against the reference CUDA PointRCNN's ~10
scenes/s eval throughput on its contemporary GPU (the BASELINE.md target is
>10x that on a v5e-8; single-chip numbers here scale ~linearly with DP chips).

The same line also carries the TRAINING step throughput
(``train_step_ms`` / ``train_scenes_per_sec``: joint RPN+RCNN forward +
backward + optax update at default.yaml batch 16 on synthetic loader batches
— the reference loop being replaced is tools/train_utils/train_utils.py:
128-138), and a ``pointrcnn_train_step_ms`` JSON line is printed to stderr.
Set TPU3D_BENCH_SKIP_TRAIN=1 to measure eval only.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SCENES_PER_SEC = 10.0

import os


def _enable_compilation_cache():
    """Persistent XLA compilation cache — first compile of the full model is
    minutes through this environment's TPU tunnel; subsequent processes reuse
    the cached executables."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass




def bench_train():
    """Train-step throughput at the TRAIN_PROFILE protocol: default.yaml,
    joint RPN+RCNN, batch 16, synthetic loader batches, GT_AUG off,
    8-step average after warmup. Returns (step_ms, scenes_per_sec)."""
    import sys

    import jax

    from tpu3d.config import cfg_from_file, fresh_cfg
    from tpu3d.datasets import (BatchLoader, KittiRCNNDataset,
                                create_synthetic_kitti)
    from tpu3d.models import PointRCNN
    from tpu3d.parallel import create_train_state, make_train_step

    cfg = fresh_cfg()
    cfg_from_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "configs", "default.yaml"), target=cfg)
    cfg.RPN.ENABLED = cfg.RCNN.ENABLED = True
    cfg.RPN.FIXED = False
    cfg.GT_AUG_ENABLED = False
    cfg.RPN.USE_INTENSITY = False

    batch_size = int(os.environ.get("TPU3D_BENCH_TRAIN_BATCH", 16))
    data_root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "output", "bench_synth")
    if not os.path.exists(os.path.join(data_root, "KITTI")):
        # the train split gets n_frames // 2 scenes; need >= one full batch
        create_synthetic_kitti(data_root, n_frames=2 * batch_size,
                               image_files=True)
    dataset = KittiRCNNDataset(
        root_dir=data_root, npoints=cfg.RPN.NUM_POINTS, split="train",
        mode="TRAIN", classes=cfg.CLASSES, cfg=cfg, seed=0)
    loader = BatchLoader(dataset, batch_size, shuffle=False, num_workers=2,
                         drop_last=True, seed=0)
    batch = next(iter(loader))
    batch = {k: v for k, v in batch.items()
             if k in ("pts_input", "gt_boxes3d", "rpn_cls_label",
                      "rpn_reg_label")}

    model = PointRCNN(cfg=cfg, mode="TRAIN")
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        cfg, model,
        {"pts_input": batch["pts_input"], "gt_boxes3d": batch["gt_boxes3d"]},
        rng, steps_per_epoch=100, total_epochs=200)
    train_step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
    step_rng = jax.random.PRNGKey(1)

    batch = jax.device_put(batch)
    print("train bench: compiling...", file=sys.stderr, flush=True)
    t_c = time.time()
    state, metrics = train_step(state, batch, step_rng, 0.9)
    float(metrics["loss"])
    print(f"train compile+first-step: {time.time() - t_c:.1f}s",
          file=sys.stderr, flush=True)
    for _ in range(2):  # warmup
        state, metrics = train_step(state, batch, step_rng, 0.9)
    float(metrics["loss"])

    n_iters = 8
    t0 = time.time()
    for _ in range(n_iters):
        state, metrics = train_step(state, batch, step_rng, 0.9)
    float(metrics["loss"])  # one sync at the end (steps chain via state)
    dt = time.time() - t0
    step_ms = dt / n_iters * 1000.0
    scenes_per_sec = batch_size * n_iters / dt
    print(f"train: {step_ms:.1f} ms/step (batch {batch_size}), "
          f"{scenes_per_sec:.1f} scenes/s", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "pointrcnn_train_step_ms",
        "value": round(step_ms, 2), "unit": "ms/step",
        "train_scenes_per_sec": round(scenes_per_sec, 2),
        "batch_size": batch_size,
    }), file=sys.stderr, flush=True)
    return step_ms, scenes_per_sec


def bench_train_e2e(n_steps: int = 100):
    """END-TO-END training throughput: the real process-worker BatchLoader
    (get_rpn_sample per scene on host cores) feeding jitted train steps,
    overlapped — the number the device-step figure must survive (the
    reference's baseline implicitly includes its DataLoader,
    tools/train_utils/train_utils.py:170-240). Returns
    (wall_ms_per_step, scenes_per_sec, n_steps)."""
    import sys

    import jax

    from tpu3d.config import cfg_from_file, fresh_cfg
    from tpu3d.datasets import (BatchLoader, KittiRCNNDataset,
                                create_synthetic_kitti)
    from tpu3d.models import PointRCNN
    from tpu3d.parallel import create_train_state, make_train_step

    cfg = fresh_cfg()
    cfg_from_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "configs", "default.yaml"), target=cfg)
    cfg.RPN.ENABLED = cfg.RCNN.ENABLED = True
    cfg.RPN.FIXED = False
    cfg.GT_AUG_ENABLED = False
    cfg.RPN.USE_INTENSITY = False

    batch_size = int(os.environ.get("TPU3D_BENCH_TRAIN_BATCH", 16))
    n_workers = int(os.environ.get("TPU3D_BENCH_LOADER_WORKERS", 6))
    data_root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "output", "bench_synth_e2e")
    n_frames = 2 * max(8 * batch_size, 128)  # train split gets half
    if not os.path.exists(os.path.join(data_root, "KITTI")):
        create_synthetic_kitti(data_root, n_frames=n_frames, image_files=True)
    # device_rpn_labels: the jitted step derives cls/reg labels from
    # gt_boxes3d on device (make_train_step), so the loader ships ~3 MB/step
    # (points + boxes) instead of ~11.5 MB — through this environment's
    # ~35 MB/s TPU tunnel that transfer was the dominant e2e overhead
    dataset = KittiRCNNDataset(
        root_dir=data_root, npoints=cfg.RPN.NUM_POINTS, split="train",
        mode="TRAIN", classes=cfg.CLASSES, cfg=cfg, seed=0,
        device_rpn_labels=True)
    # process workers MUST fork before the JAX/TPU client exists in them:
    # BatchLoader forks at construction from this (main) thread
    loader = BatchLoader(dataset, batch_size, shuffle=True,
                         num_workers=n_workers, drop_last=True, seed=0,
                         prefetch=4, worker_mode="process")

    keys = ("pts_input", "gt_boxes3d")
    first = next(iter(loader))
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    state = create_train_state(
        cfg, model,
        {"pts_input": first["pts_input"], "gt_boxes3d": first["gt_boxes3d"]},
        jax.random.PRNGKey(0), steps_per_epoch=100, total_epochs=200)
    train_step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
    step_rng = jax.random.PRNGKey(1)

    print("e2e train bench: compiling...", file=sys.stderr, flush=True)
    state, metrics = train_step(
        state, {k: first[k] for k in keys}, step_rng, 0.9)
    float(metrics["loss"])

    # overlapped steady state: host processes prefetch scenes, a staging
    # thread starts each batch's device transfer early (device_prefetch),
    # and the device executes the previous step (dispatch is async; the one
    # sync is the final loss pull)
    from tpu3d.datasets import device_prefetch

    done = 0
    t0 = time.time()
    epoch = 0
    while done < n_steps:
        epoch += 1
        loader.set_epoch(epoch)
        for batch in device_prefetch(loader, size=3, keys=keys):
            state, metrics = train_step(state, batch, step_rng, 0.9)
            done += 1
            if done >= n_steps:
                break
    float(metrics["loss"])
    dt = time.time() - t0
    loader.close()
    wall_ms = dt / done * 1000.0
    sps = batch_size * done / dt
    print(f"e2e train: {wall_ms:.1f} ms/step wall (batch {batch_size}, "
          f"{n_workers} loader workers, {done} steps), {sps:.1f} scenes/s",
          file=sys.stderr, flush=True)
    return wall_ms, sps, done


def main():
    _enable_compilation_cache()
    import jax

    from tpu3d.config import fresh_cfg
    from tpu3d.models import PointRCNN
    from tpu3d.tools.eval_rcnn import make_infer_step

    cfg = fresh_cfg()
    # the paper config (default.yaml) knobs that matter for inference
    cfg.RPN.USE_INTENSITY = False
    cfg.RPN.LOC_XZ_FINE = True
    cfg.RPN.LOSS_CLS = "SigmoidFocalLoss"
    cfg.RCNN.ENABLED = True
    cfg.TEST.RPN_PRE_NMS_TOP_N = 9000
    cfg.TEST.RPN_POST_NMS_TOP_N = 100
    cfg.TEST.RPN_NMS_THRESH = 0.8

    batch = 8
    # TPU3D_BENCH_CFG=configs/double.yaml re-benches an alternate config
    # through the same harness (double.yaml: 32768 pts, eval batch 4 — the
    # reference's batch_inference.py:32-33 halves the batch for `double`)
    cfg_path = os.environ.get("TPU3D_BENCH_CFG")
    if cfg_path:
        from tpu3d.config import cfg_from_file

        cfg_from_file(cfg_path, target=cfg)
        cfg.RPN.USE_INTENSITY = False
        if os.path.splitext(os.path.basename(cfg_path))[0] == "double":
            batch = 4
    batch = int(os.environ.get("TPU3D_BENCH_BATCH", batch))
    n = cfg.RPN.NUM_POINTS  # 16384
    model = PointRCNN(cfg=cfg, mode="TEST")
    rng = np.random.default_rng(0)
    pts = np.asarray(rng.uniform([-30, -1, 0], [30, 3, 70], size=(batch, n, 3)),
                     np.float32)
    # init under jit — eager init would execute the whole forward op-by-op
    # through the device tunnel (minutes), and every Pallas call site would
    # trigger its own eager Mosaic compile
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "target": jax.random.PRNGKey(2)},
        {"pts_input": pts[:1]})

    # reduce outputs to one scalar on device so each iteration syncs with a
    # 4-byte host pull (block_until_ready does not reliably block through the
    # axon tunnel, and pulling full outputs would measure tunnel bandwidth)
    import sys

    print("init done, compiling...", file=sys.stderr, flush=True)
    raw_infer = make_infer_step(model, cfg)
    infer = jax.jit(lambda v, p: raw_infer(v, p)["final_scores"].sum())
    t_c = time.time()
    float(infer(variables, pts))  # compile
    print(f"compile+first-run: {time.time() - t_c:.1f}s", file=sys.stderr,
          flush=True)

    # stage the input batch on device once: re-passing the numpy array
    # re-uploads 1.5 MB per call, which costs ~0.1 ms over a real host's PCIe
    # but ~20 ms through this environment's TPU tunnel — an environment
    # artifact that would mis-measure the model (a serving loop stages the
    # next batch's upload asynchronously anyway; that overlap is what the
    # pipelined number models)
    pts = jax.device_put(pts)

    n_iters = 12
    # single-stream: one batch at a time, sync every call (latency-bound —
    # still includes the tunnel's ~45 ms/iter dispatch+sync round trip)
    t0 = time.time()
    for _ in range(n_iters):
        float(infer(variables, pts))
    single_stream = batch * n_iters / (time.time() - t0)
    print(f"single-stream: {single_stream:.2f} scenes/s", file=sys.stderr,
          flush=True)

    # throughput measurement: dispatch all iterations asynchronously (as a
    # production serving loop would — the device queue stays full) and sync
    # once at the end; per-call sync would add ~50 ms of tunnel dispatch
    # latency to every batch
    # TPU3D_BENCH_PROFILE=<dir>: capture a jax profiler trace of the
    # pipelined loop (op table via tpu3d.tools.parse_xplane <dir>)
    profile_dir = os.environ.get("TPU3D_BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.time()
    results = [infer(variables, pts) for _ in range(n_iters)]
    s = sum(float(r) for r in results)
    dt = time.time() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}", file=sys.stderr)
    scenes_per_sec = batch * n_iters / dt

    line = {
        "metric": "pointrcnn_eval_scenes_per_sec",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 3),
    }
    if not os.environ.get("TPU3D_BENCH_SKIP_TRAIN"):
        try:
            train_ms, train_sps = bench_train()
            line["train_step_ms"] = round(train_ms, 2)
            line["train_scenes_per_sec"] = round(train_sps, 2)
        except Exception as e:  # train bench must never break the headline
            import sys
            import traceback

            traceback.print_exc(file=sys.stderr)
            line["train_bench_error"] = str(e)[:200]
    if not os.environ.get("TPU3D_BENCH_SKIP_E2E"):
        # end-to-end leg runs in a FRESH interpreter: the loader's process
        # pool must fork before any JAX/TPU client exists (forking after
        # would inherit live tunnel threads/locks into the workers)
        import subprocess
        import sys

        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--e2e-train"],
                capture_output=True, text=True, timeout=1800)
            print(r.stderr, file=sys.stderr, flush=True)
            e2e = json.loads(r.stdout.strip().splitlines()[-1])
            line["train_e2e_wall_ms_per_step"] = e2e["wall_ms_per_step"]
            line["train_e2e_scenes_per_sec"] = e2e["scenes_per_sec"]
        except Exception as e:
            line["train_e2e_error"] = str(e)[:200]
    print(json.dumps(line))


if __name__ == "__main__":
    import sys

    if "--e2e-train" in sys.argv:
        _enable_compilation_cache()
        wall_ms, sps, n = bench_train_e2e()
        print(json.dumps({"metric": "pointrcnn_train_e2e",
                          "wall_ms_per_step": round(wall_ms, 2),
                          "scenes_per_sec": round(sps, 2), "steps": n}))
    else:
        main()
