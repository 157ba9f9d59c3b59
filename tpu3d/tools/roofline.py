"""MFU / roofline accounting for the flagship programs (VERDICT r3 #5).

Computes, for the two headline programs (`bench.py`'s eval batch and train
step at default.yaml shapes):

- **analytic matmul FLOPs** — a walk over the config's layer specs
  (SA/FP/head conv towers, RCNN stack) mirroring the model's channel
  propagation exactly (`tpu3d/models/pointnet2.py:507-548`,
  `rcnn.py:28-96`). This is the standard MFU numerator: matmul FLOPs only,
  counted 1x for forward and 3x for a training step (backward's dx and dw
  matmuls each equal the forward). Counting is config-driven, so it tracks
  any YAML (default/double/...).
- **XLA-visible FLOPs / bytes** — the compiled executable's
  `cost_analysis()` (flops, bytes accessed). Pallas custom calls report
  zero flops there, so this is a cross-check for the XLA-scheduled part,
  not the numerator. `bytes accessed` is XLA's HBM-traffic estimate for
  the fused program; the Pallas kernels' own HBM traffic (operand/result
  buffers only — their slabs live in VMEM by design) is O(1 GB/step) vs
  the ~70 GB XLA total, so the HBM-utilization figure is a slight
  (<2%) underestimate and is reported without correction.
- **non-MXU analytic FLOPs** — the Pallas neighbor kernels (sequential FPS
  + 3NN ride-along, nearest-k sweeps) are VPU work: ~10 flops per
  (pick, point) for FPS and ~8 per (center, point) distance for nearest-k.
  Reported separately; they bound how far MFU can rise without touching
  the matmuls (the VPU time is not MXU time).

MFU = analytic matmul FLOPs / measured step time / chip peak.
Peak used: TPU v5e (v5 lite), 197 TFLOP/s bf16, 819 GB/s HBM.

Usage (on the TPU host; times come from bench.py's output — eval ms =
1000*batch/pipelined scenes_per_sec, train ms = train_step_ms):
    python -m tpu3d.tools.roofline --eval-ms 70.3 --train-ms 240.4

Reference envelope: BASELINE.md's throughput configuration; the reference
repo has no perf accounting of its own (its number is the ~10 scenes/s
eval loop, tools/eval_rcnn.py).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


# ---------------------------------------------------------------- analytic

def _tower(n_rows: int, chans: list[int]) -> float:
    """FLOPs of a pointwise Dense tower applied to n_rows rows:
    sum over consecutive (cin, cout) of 2 * n_rows * cin * cout."""
    return sum(2.0 * n_rows * a * b for a, b in zip(chans[:-1], chans[1:]))


def backbone_matmul_flops(cfg, batch: int) -> dict:
    """Matmul FLOPs (forward, one batch) of the RPN backbone + heads,
    mirroring Pointnet2MSG's channel propagation."""
    from tpu3d.models.bbox_codec import reg_channels

    r = cfg.RPN
    n_levels = len(r.SA_CONFIG.NPOINTS)
    counts = [cfg.RPN.NUM_POINTS] + list(r.SA_CONFIG.NPOINTS)
    c_in = 1 if r.USE_INTENSITY else 0
    feat_ch = [c_in]
    sa = 0.0
    for k in range(n_levels):
        m = r.SA_CONFIG.NPOINTS[k]
        out_ch = 0
        for j, spec in enumerate(r.SA_CONFIG.MLPS[k]):
            s = r.SA_CONFIG.NSAMPLE[k][j]
            chans = [feat_ch[k] + 3] + list(spec)  # use_xyz concat
            sa += batch * _tower(m * s, chans)
            out_ch += spec[-1]
        feat_ch.append(out_ch)

    fp = 0.0
    fp_out = {}
    for i in range(len(r.FP_MLPS) - 1, -1, -1):
        upper_ch = fp_out.get(i + 1, feat_ch[i + 1])
        skip_ch = feat_ch[i]
        chans = [upper_ch + skip_ch] + list(r.FP_MLPS[i])
        fp += batch * _tower(counts[i], chans)
        fp_out[i] = r.FP_MLPS[i][-1]

    n_pts = cfg.RPN.NUM_POINTS
    c0 = fp_out[0]
    n_reg = reg_channels(r.LOC_SCOPE, r.LOC_BIN_SIZE, r.NUM_HEAD_BIN,
                         r.LOC_XZ_FINE)
    heads = batch * (_tower(n_pts, [c0] + list(r.CLS_FC) + [1])
                     + _tower(n_pts, [c0] + list(r.REG_FC) + [n_reg]))
    return {"sa": sa, "fp": fp, "heads": heads, "backbone_out_ch": c0}


def rcnn_matmul_flops(cfg, batch: int, rois: int) -> dict:
    """Matmul FLOPs (forward) of the RCNN refinement stack for
    batch*rois ROIs of cfg.RCNN.NUM_POINTS canonical points."""
    from tpu3d.models.bbox_codec import reg_channels

    c = cfg.RCNN
    n = batch * rois
    k = c.NUM_POINTS
    n_ext = int(c.USE_INTENSITY) + int(c.USE_MASK) + int(c.USE_DEPTH)
    rpn_ch = cfg.RPN.FP_MLPS[0][-1]  # backbone per-point feature width
    up = 0.0
    if c.USE_RPN_FEATURES:
        up += _tower(n * k, [3 + n_ext] + list(c.XYZ_UP_LAYER))
        up += _tower(n * k, [c.XYZ_UP_LAYER[-1] + rpn_ch,
                             c.XYZ_UP_LAYER[-1]])
    feat_ch = c.XYZ_UP_LAYER[-1] if c.USE_RPN_FEATURES else n_ext
    sa = 0.0
    pts = k
    for i, spec in enumerate(c.SA_CONFIG.NPOINTS):
        m = spec if spec != -1 else 1
        s = c.SA_CONFIG.NSAMPLE[i] if spec != -1 else pts
        chans = [feat_ch + 3] + list(c.SA_CONFIG.MLPS[i])
        sa += _tower(n * m * s, chans)
        feat_ch = c.SA_CONFIG.MLPS[i][-1]
        pts = m
    n_reg = reg_channels(c.LOC_SCOPE, c.LOC_BIN_SIZE, c.NUM_HEAD_BIN,
                         True, c.LOC_Y_BY_BIN, c.LOC_Y_SCOPE,
                         c.LOC_Y_BIN_SIZE)
    heads = (_tower(n, [feat_ch] + list(c.CLS_FC) + [1])
             + _tower(n, [feat_ch] + list(c.REG_FC) + [n_reg]))
    return {"xyz_up": up, "sa": sa, "heads": heads}


def neighbor_vpu_flops(cfg, batch: int, rois: int) -> float:
    """Analytic VPU FLOPs of the Pallas neighbor kernels (not MXU work):
    FPS+3NN ~10 flops per (pick, point); nearest-k ~8 per (center, point)."""
    r = cfg.RPN
    total = 0.0
    n = cfg.RPN.NUM_POINTS
    for k, m in enumerate(r.SA_CONFIG.NPOINTS):
        total += batch * (10.0 * m * n + 8.0 * m * n)  # FPS+3NN, nearest-k
        n = m
    c = cfg.RCNN
    pts = c.NUM_POINTS
    for spec in c.SA_CONFIG.NPOINTS:
        m = spec if spec != -1 else 1
        total += batch * rois * (10.0 * m * pts + 8.0 * m * pts)
        pts = m
    return total


def program_flops(cfg, mode: str, batch: int) -> dict:
    """Total analytic matmul FLOPs for one eval batch or one train step."""
    rois = (cfg.RCNN.ROI_PER_IMAGE if mode == "train"
            else cfg.TEST.RPN_POST_NMS_TOP_N)
    bb = backbone_matmul_flops(cfg, batch)
    rc = (rcnn_matmul_flops(cfg, batch, rois)
          if cfg.RCNN.ENABLED else {"xyz_up": 0, "sa": 0, "heads": 0})
    fwd = bb["sa"] + bb["fp"] + bb["heads"] + rc["xyz_up"] + rc["sa"] \
        + rc["heads"]
    mult = 3.0 if mode == "train" else 1.0  # bwd: dx + dw each == fwd
    return {
        "fwd_matmul_flops": fwd,
        "total_matmul_flops": fwd * mult,
        # no train multiplier: the neighbor kernels have no backward pass
        "vpu_neighbor_flops": neighbor_vpu_flops(cfg, batch, rois),
        "breakdown_fwd": {"rpn_sa": bb["sa"], "rpn_fp": bb["fp"],
                          "rpn_heads": bb["heads"], "rcnn_xyz_up": rc["xyz_up"],
                          "rcnn_sa": rc["sa"], "rcnn_heads": rc["heads"]},
    }


# ------------------------------------------------------------ XLA-visible

def _cost(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"xla_flops": float(ca.get("flops", 0.0)),
            "xla_bytes_accessed": float(ca.get("bytes accessed", 0.0))}


def xla_cost_eval(cfg, batch: int) -> dict:
    import functools

    import jax

    from tpu3d.models import PointRCNN
    from tpu3d.tools.eval_rcnn import make_infer_step

    model = PointRCNN(cfg=cfg, mode="TEST")
    rng = np.random.default_rng(0)
    pts = np.asarray(rng.uniform([-30, -1, 0], [30, 3, 70],
                                 size=(batch, cfg.RPN.NUM_POINTS, 3)),
                     np.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "target": jax.random.PRNGKey(2)}, {"pts_input": pts[:1]})
    raw = make_infer_step(model, cfg)
    infer = jax.jit(lambda v, p: raw(v, p)["final_scores"].sum())
    return _cost(infer.lower(variables, pts).compile())


def xla_cost_train(cfg, batch: int) -> dict:
    import jax

    from tpu3d.models import PointRCNN
    from tpu3d.parallel import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    n = cfg.RPN.NUM_POINTS
    pts = np.asarray(rng.uniform([-30, -1, 0], [30, 3, 70],
                                 size=(batch, n, 3)), np.float32)
    gt = np.zeros((batch, 8, 7), np.float32)
    gt[:, 0] = [0, 1.6, 20, 1.5, 1.6, 3.9, 0.3]
    batch_d = {
        "pts_input": pts, "gt_boxes3d": gt,
        "rpn_cls_label": np.zeros((batch, n), np.int32),
        "rpn_reg_label": np.zeros((batch, n, 7), np.float32),
    }
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    state = create_train_state(
        cfg, model, {"pts_input": pts[:1], "gt_boxes3d": gt[:1]},
        jax.random.PRNGKey(0), steps_per_epoch=100, total_epochs=200)
    step = jax.jit(make_train_step(cfg, model))
    import jax.numpy as jnp

    return _cost(step.lower(state, batch_d, jax.random.PRNGKey(1),
                            jnp.float32(0.9)).compile())


# ----------------------------------------------------------------- report

def derived(name: str, step_ms: float, flops: dict, xla: dict) -> dict:
    t = step_ms / 1e3
    achieved_tflops = flops["total_matmul_flops"] / t / 1e12
    mfu = achieved_tflops / V5E_PEAK_BF16_TFLOPS
    hbm_gbs = xla["xla_bytes_accessed"] / t / 1e9
    return {
        "program": name,
        "step_ms": step_ms,
        "matmul_tflop_per_step": flops["total_matmul_flops"] / 1e12,
        "achieved_matmul_tflops": round(achieved_tflops, 2),
        "mfu_pct": round(100 * mfu, 2),
        "vpu_neighbor_gflop_per_step": round(
            flops["vpu_neighbor_flops"] / 1e9, 2),
        "xla_visible_tflop_per_step": round(xla["xla_flops"] / 1e12, 4),
        "xla_bytes_accessed_gb": round(xla["xla_bytes_accessed"] / 1e9, 2),
        "hbm_gbs_estimate": round(hbm_gbs, 1),
        "hbm_util_pct_estimate": round(100 * hbm_gbs / V5E_PEAK_HBM_GBS, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", default="configs/default.yaml")
    ap.add_argument("--eval-ms", type=float, required=True,
                    help="measured eval-batch ms from bench.py "
                         "(1000*batch/pipelined scenes_per_sec)")
    ap.add_argument("--train-ms", type=float, required=True,
                    help="measured train_step_ms from bench.py")
    ap.add_argument("--eval-batch", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=16)
    ap.add_argument("--skip-xla", action="store_true",
                    help="analytic FLOPs only (no TPU compile)")
    args = ap.parse_args(argv)

    from bench import _enable_compilation_cache

    _enable_compilation_cache()

    from tpu3d.config import cfg_from_file, fresh_cfg

    cfg = fresh_cfg()
    cfg_from_file(args.cfg_file, target=cfg)
    cfg.RPN.ENABLED = cfg.RCNN.ENABLED = True
    cfg.RPN.USE_INTENSITY = False
    cfg.RPN.FIXED = False
    cfg.GT_AUG_ENABLED = False
    cfg.TEST.RPN_PRE_NMS_TOP_N = 9000
    cfg.TEST.RPN_POST_NMS_TOP_N = 100
    cfg.TEST.RPN_NMS_THRESH = 0.8
    cfg.RPN.LOC_XZ_FINE = True
    cfg.RPN.LOSS_CLS = "SigmoidFocalLoss"

    out = []
    fl_e = program_flops(cfg, "eval", args.eval_batch)
    fl_t = program_flops(cfg, "train", args.train_batch)
    xla_e = xla_cost_eval(cfg, args.eval_batch) if not args.skip_xla else {
        "xla_flops": 0.0, "xla_bytes_accessed": 0.0}
    xla_t = xla_cost_train(cfg, args.train_batch) if not args.skip_xla else {
        "xla_flops": 0.0, "xla_bytes_accessed": 0.0}

    out.append(derived(f"eval_batch{args.eval_batch}", args.eval_ms,
                       fl_e, xla_e))
    out.append(derived(f"train_step_batch{args.train_batch}", args.train_ms,
                       fl_t, xla_t))
    for row in out:
        print(json.dumps(row))
    print(json.dumps({"breakdown_fwd_eval": fl_e["breakdown_fwd"],
                      "breakdown_fwd_train": fl_t["breakdown_fwd"]}))


if __name__ == "__main__":
    main()
