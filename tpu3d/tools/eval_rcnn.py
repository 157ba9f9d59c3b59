"""Inference/eval CLI for PointRCNN — KITTI-format detections + recall metrics.

Reference parity: pointrcnn/tools/eval_rcnn.py (eval_one_epoch_joint / _rpn):
same output layout (final_result/data/*.txt incl. empty files for undetected
frames, reference :638-649), same decode -> sigmoid score thresh -> per-scene
rotated NMS -> save_kitti_format pipeline (corner projection, >80%-of-image box
drop, alpha from beta + ry; reference :76-101), same recall@{0.1..0.9} tables.
The whole model + decode + NMS runs as one jitted device program per batch.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cfg, cfg_from_file, cfg_from_list
from ..datasets import BatchLoader, KittiRCNNDataset, create_synthetic_kitti
from ..kitti.boxes import corners_from_boxes3d
from ..models import PointRCNN, decode_bbox_target
from ..ops.nms import nms_bev
from ..ops.rotated_iou import boxes_iou3d, boxes3d_to_bev5
from ..parallel import make_mesh, shard_batch
from ..utils.checkpoint import latest_checkpoint, load_checkpoint
from ..utils.logging import create_logger
from .train_rcnn import configure_mode

THRESH_LIST = (0.1, 0.3, 0.5, 0.7, 0.9)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="evaluate PointRCNN (tpu)")
    parser.add_argument("--cfg_file", type=str, default=None)
    parser.add_argument("--eval_mode", type=str, default="rcnn",
                        choices=["rpn", "rcnn", "joint", "rcnn_offline"])
    parser.add_argument("--rcnn_eval_roi_dir", type=str, default=None,
                        help="saved RPN proposals (KITTI label files) for "
                             "rcnn_offline evaluation")
    parser.add_argument("--rcnn_eval_feature_dir", type=str, default=None,
                        help="dumped RPN backbone features for rcnn_offline "
                             "evaluation")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--dataset", type=str, default="kitti")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--test", action="store_true",
                        help="TEST split (no labels)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--seed", type=int, default=666)
    parser.add_argument("--save_rpn_feature", action="store_true",
                        help="dump per-scene backbone features/xyz/seg for "
                             "offline RCNN training")
    parser.add_argument("--save_result", action="store_true")
    parser.add_argument("--eval_all", action="store_true",
                        help="daemon: repeatedly evaluate new checkpoints in "
                             "--ckpt_dir (reference repeat_eval_ckpt)")
    parser.add_argument("--wait_seconds", type=int, default=30)
    parser.add_argument("--max_waitmins", type=int, default=30)
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    return parser.parse_args(argv)


def save_kitti_format(sample_id, calib, bbox3d, kitti_output_dir, scores,
                      img_shape, classes="Car"):
    """Write one frame's detections (reference: eval_rcnn.py:76-101)."""
    if len(bbox3d) == 0:
        with open(os.path.join(kitti_output_dir, "%06d.txt" % sample_id), "w"):
            pass
        return 0
    corners3d = corners_from_boxes3d(bbox3d)
    img_boxes, _ = calib.corners3d_to_img_boxes(corners3d)
    img_boxes[:, 0] = np.clip(img_boxes[:, 0], 0, img_shape[1] - 1)
    img_boxes[:, 1] = np.clip(img_boxes[:, 1], 0, img_shape[0] - 1)
    img_boxes[:, 2] = np.clip(img_boxes[:, 2], 0, img_shape[1] - 1)
    img_boxes[:, 3] = np.clip(img_boxes[:, 3], 0, img_shape[0] - 1)
    w = img_boxes[:, 2] - img_boxes[:, 0]
    h = img_boxes[:, 3] - img_boxes[:, 1]
    valid = (w < img_shape[1] * 0.8) & (h < img_shape[0] * 0.8)

    n = 0
    with open(os.path.join(kitti_output_dir, "%06d.txt" % sample_id), "w") as f:
        for k in range(bbox3d.shape[0]):
            if not valid[k]:
                continue
            x, z, ry = bbox3d[k, 0], bbox3d[k, 2], bbox3d[k, 6]
            beta = np.arctan2(z, x)
            alpha = -np.sign(beta) * np.pi / 2 + beta + ry
            print("%s -1 -1 %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f "
                  "%.4f %.4f %.4f"
                  % (classes, alpha, img_boxes[k, 0], img_boxes[k, 1],
                     img_boxes[k, 2], img_boxes[k, 3], bbox3d[k, 3],
                     bbox3d[k, 4], bbox3d[k, 5], bbox3d[k, 0], bbox3d[k, 1],
                     bbox3d[k, 2], bbox3d[k, 6], scores[k]), file=f)
            n += 1
    return n


def rcnn_decode_and_nms(eval_cfg, rois, rcnn_cls, rcnn_reg, roi_valid,
                        roi_size=None, max_final: int = 100):
    """Shared tail of every RCNN eval path: bin decode relative to the ROI ->
    sigmoid score thresh -> per-scene rotated NMS -> fixed-size final boxes
    (reference: eval_rcnn.py:311-324 decode, :393-407/:615-636 NMS)."""
    b, m = rois.shape[0], rois.shape[1]
    anchor = (roi_size.reshape(-1, 3) if (eval_cfg.RCNN.SIZE_RES_ON_ROI
                                          and roi_size is not None)
              else jnp.asarray(eval_cfg.CLS_MEAN_SIZE[0]))
    pred_boxes3d = decode_bbox_target(
        rois.reshape(-1, 7), rcnn_reg.reshape(b * m, -1),
        anchor_size=anchor, loc_scope=eval_cfg.RCNN.LOC_SCOPE,
        loc_bin_size=eval_cfg.RCNN.LOC_BIN_SIZE,
        num_head_bin=eval_cfg.RCNN.NUM_HEAD_BIN, get_xz_fine=True,
        get_y_by_bin=eval_cfg.RCNN.LOC_Y_BY_BIN,
        loc_y_scope=eval_cfg.RCNN.LOC_Y_SCOPE,
        loc_y_bin_size=eval_cfg.RCNN.LOC_Y_BIN_SIZE,
        get_ry_fine=True).reshape(b, m, 7)
    norm_scores = jax.nn.sigmoid(rcnn_cls)
    keep_scores = (norm_scores > eval_cfg.RCNN.SCORE_THRESH) & roi_valid

    def per_image(boxes, raw_scores, valid):
        bev = boxes3d_to_bev5(boxes)
        idx, mask = nms_bev(bev, raw_scores, eval_cfg.RCNN.NMS_THRESH,
                            max_final, valid=valid, rotated=True)
        return boxes[idx], raw_scores[idx], mask

    final_boxes, final_scores, final_mask = jax.vmap(per_image)(
        pred_boxes3d, rcnn_cls, keep_scores)
    return {"final_boxes": final_boxes, "final_scores": final_scores,
            "final_mask": final_mask, "pred_boxes3d": pred_boxes3d,
            "norm_scores": norm_scores, "raw_scores": rcnn_cls}


def make_infer_step(model, eval_cfg, max_final: int = 100):
    """One jitted program: forward -> RCNN decode -> score thresh -> rotated
    NMS -> fixed-size final boxes + validity."""

    def infer(variables, pts_input):
        out = model.apply(variables, {"pts_input": pts_input}, train=False)
        rois = out["rois"]  # (B, M, 7)
        b, m = rois.shape[0], rois.shape[1]
        result = rcnn_decode_and_nms(
            eval_cfg, rois, out["rcnn_cls"].reshape(b, m),
            out["rcnn_reg"].reshape(b, m, -1), out["roi_valid"],
            max_final=max_final)
        result.update({
            "rois": rois, "roi_scores_raw": out["roi_scores_raw"],
            "roi_valid": out["roi_valid"], "seg_result": out["seg_result"],
        })
        return result

    return infer


def make_offline_infer_step(model, eval_cfg, max_final: int = 100):
    """rcnn_offline eval: the RCNN head runs on loader-pooled canonical points;
    rois come from the saved proposal files (reference:
    eval_rcnn.py:263-460 eval_one_epoch_rcnn)."""

    def infer(variables, pts_input, roi_boxes3d, roi_valid, roi_size):
        b, m, k, c = pts_input.shape
        out = model.apply(variables, {"pts_input": pts_input.reshape(-1, k, c)},
                          train=False)
        return rcnn_decode_and_nms(
            eval_cfg, roi_boxes3d, out["rcnn_cls"].reshape(b, m),
            out["rcnn_reg"].reshape(b, m, -1), roi_valid, roi_size=roi_size,
            max_final=max_final)

    return infer


def _recall_counts(pred_boxes, gt_boxes, thresh_list=THRESH_LIST):
    """gt recall at IoU thresholds (reference: eval_rcnn.py:545-560)."""
    if len(gt_boxes) == 0:
        return np.zeros(len(thresh_list), np.int64), 0
    if len(pred_boxes) == 0:
        return np.zeros(len(thresh_list), np.int64), len(gt_boxes)
    iou = np.asarray(boxes_iou3d(jnp.asarray(pred_boxes, jnp.float32),
                                 jnp.asarray(gt_boxes, jnp.float32)))
    gt_max = iou.max(axis=0)
    return np.array([(gt_max > t).sum() for t in thresh_list]), len(gt_boxes)


def save_rpn_features(out, batch, k, features_dir, sample_id):
    """Dump backbone features for offline RCNN training (reference:
    eval_rcnn.py:104-117 save_rpn_features: %06d{,_xyz,_seg,_intensity,
    _rawscore}.npy)."""
    np.save(os.path.join(features_dir, "%06d.npy" % sample_id),
            out["backbone_features"][k])
    np.save(os.path.join(features_dir, "%06d_xyz.npy" % sample_id),
            out["backbone_xyz"][k])
    np.save(os.path.join(features_dir, "%06d_seg.npy" % sample_id),
            out["seg_result"][k])
    np.save(os.path.join(features_dir, "%06d_intensity.npy" % sample_id),
            batch["pts_features"][k][:, 0])
    np.save(os.path.join(features_dir, "%06d_rawscore.npy" % sample_id),
            out["rpn_scores_raw"][k])


def eval_one_epoch_rpn(args, model, variables, loader, result_dir, logger):
    """RPN-only eval: per-point seg IoU + proposal recall (+ feature dumps)
    (reference parity: eval_rcnn.py:120-260 eval_one_epoch_rpn)."""
    dataset = loader.dataset
    mesh = make_mesh(batch_size=args.batch_size)
    if args.save_rpn_feature:
        features_dir = os.path.join(result_dir, "features")
        os.makedirs(features_dir, exist_ok=True)
    if args.save_result or args.save_rpn_feature:
        # detections/data is the roi producer for offline-RCNN train/eval
        # (reference: eval_rcnn.py:128-132, 221-238)
        kitti_output_dir = os.path.join(result_dir, "detections", "data")
        seg_output_dir = os.path.join(result_dir, "seg_result")
        os.makedirs(kitti_output_dir, exist_ok=True)
        os.makedirs(seg_output_dir, exist_ok=True)

    def rpn_infer(variables, pts_input):
        # proposal generation + seg happen inside the model's RPN-eval branch
        # (point_rcnn.py), the same jitted path joint mode uses
        out = model.apply(variables, {"pts_input": pts_input}, train=False)
        out["rpn_scores_raw"] = out["rpn_cls"][:, :, 0]
        return {k: out[k] for k in (
            "rois", "roi_scores_raw", "roi_valid", "seg_result",
            "rpn_scores_raw", "backbone_xyz", "backbone_features")}

    infer = jax.jit(rpn_infer)
    total_recall = np.zeros(len(THRESH_LIST), np.int64)
    total_gt = 0
    rpn_iou_sum, n_scenes = 0.0, 0
    for batch in loader:
        batch_dev = shard_batch(mesh, {"pts_input": batch["pts_input"]})
        out = jax.device_get(infer(variables, batch_dev["pts_input"]))
        for k in range(len(batch["sample_id"])):
            if not batch["batch_valid"][k]:
                continue
            n_scenes += 1
            sample_id = int(batch["sample_id"][k])
            if args.save_rpn_feature:
                save_rpn_features(out, batch, k, features_dir, sample_id)
            if args.save_result or args.save_rpn_feature:
                # proposals as KITTI label files + per-point seg dump
                # (reference: eval_rcnn.py:221-238)
                pred_cls = out["seg_result"][k].astype(np.float32)
                pts_rect = batch["pts_rect"][k].reshape(-1, 3)
                cols = [pts_rect]
                if not args.test and "rpn_cls_label" in batch:
                    cols.append(
                        batch["rpn_cls_label"][k].reshape(-1, 1).astype(
                            np.float32))
                cols.append(pred_cls.reshape(-1, 1))
                np.save(os.path.join(seg_output_dir, "%06d.npy" % sample_id),
                        np.concatenate(cols, axis=1).astype(np.float16))
                rois_k = out["rois"][k][out["roi_valid"][k]]
                scores_k = out["roi_scores_raw"][k][out["roi_valid"][k]]
                save_kitti_format(
                    sample_id, dataset.get_calib(sample_id), rois_k,
                    kitti_output_dir, scores_k,
                    dataset.get_image_shape(sample_id), classes=cfg.CLASSES)
            if not args.test and "rpn_cls_label" in batch:
                seg = out["seg_result"][k].astype(bool)
                label = batch["rpn_cls_label"][k]
                fg = label > 0
                union = float(np.sum(seg | fg))
                inter = float(np.sum(seg & fg))
                rpn_iou_sum += inter / max(union, 1.0)
            if not args.test and "gt_boxes3d" in batch:
                gt = batch["gt_boxes3d"][k]
                gt = gt[np.abs(gt).sum(axis=1) > 0]
                rois_k = out["rois"][k][out["roi_valid"][k]]
                rec, n_gt = _recall_counts(rois_k, gt)
                total_recall += rec
                total_gt += n_gt
    if total_gt > 0:
        for i, t in enumerate(THRESH_LIST):
            logger.info(f"total roi recall(thresh={t:.3f}): "
                        f"{int(total_recall[i])} / {total_gt} = "
                        f"{total_recall[i] / total_gt:.6f}")
    avg_iou = rpn_iou_sum / max(n_scenes, 1)
    logger.info(f"average rpn seg iou: {avg_iou:.6f}")
    return {"rpn_iou": avg_iou,
            "recall": {t: float(total_recall[i] / max(total_gt, 1))
                       for i, t in enumerate(THRESH_LIST)}}


def eval_one_epoch_joint(args, model, variables, loader, result_dir, logger):
    dataset = loader.dataset
    final_output_dir = os.path.join(result_dir, "final_result", "data")
    os.makedirs(final_output_dir, exist_ok=True)
    if args.save_result:
        # pre-NMS roi + refined-box label dumps (reference:
        # eval_rcnn.py:474-480, 586-607): roi_result/data feeds offline-RCNN
        roi_output_dir = os.path.join(result_dir, "roi_result", "data")
        refine_output_dir = os.path.join(result_dir, "refine_result", "data")
        os.makedirs(roi_output_dir, exist_ok=True)
        os.makedirs(refine_output_dir, exist_ok=True)

    mesh = make_mesh(batch_size=args.batch_size)
    infer = jax.jit(make_infer_step(model, cfg))
    total_recall = np.zeros(len(THRESH_LIST), np.int64)
    total_roi_recall = np.zeros(len(THRESH_LIST), np.int64)
    total_gt = 0
    final_total = 0
    n_scenes = 0
    t_start = None
    for batch in loader:
        batch_dev = shard_batch(mesh, {"pts_input": batch["pts_input"]})
        out = infer(variables, batch_dev["pts_input"])
        out = jax.device_get(out)
        if t_start is None:  # skip compile in timing
            t_start = time.time()
            scenes_timed = 0
        for k in range(len(batch["sample_id"])):
            if not batch["batch_valid"][k]:
                continue
            n_scenes += 1
            scenes_timed += 1
            sample_id = int(batch["sample_id"][k])
            mask = out["final_mask"][k]
            boxes = out["final_boxes"][k][mask]
            scores = out["final_scores"][k][mask]
            calib = dataset.get_calib(sample_id)
            img_shape = dataset.get_image_shape(sample_id)
            if args.save_result:
                valid_k = out["roi_valid"][k]
                save_kitti_format(
                    sample_id, calib, out["rois"][k][valid_k], roi_output_dir,
                    out["roi_scores_raw"][k][valid_k], img_shape,
                    classes=cfg.CLASSES)
                save_kitti_format(
                    sample_id, calib, out["pred_boxes3d"][k][valid_k],
                    refine_output_dir, out["raw_scores"][k][valid_k],
                    img_shape, classes=cfg.CLASSES)
            final_total += save_kitti_format(
                sample_id, calib, boxes, final_output_dir, scores, img_shape,
                classes=cfg.CLASSES)
            if not args.test and "gt_boxes3d" in batch:
                gt = batch["gt_boxes3d"][k]
                gt = gt[np.abs(gt).sum(axis=1) > 0]
                rec, n_gt = _recall_counts(boxes, gt)
                total_recall += rec
                total_gt += n_gt
                rois_k = out["rois"][k][out["roi_valid"][k]]
                roi_rec, _ = _recall_counts(rois_k, gt)
                total_roi_recall += roi_rec
    elapsed = time.time() - (t_start or time.time())

    # dump empty files for frames with no detections (reference :638-649)
    empty_cnt = 0
    for sid in dataset.image_idx_list:
        cur = os.path.join(final_output_dir, f"{sid}.txt")
        if not os.path.exists(cur):
            open(cur, "w").close()
            empty_cnt += 1
    logger.info(f"final average detections: "
                f"{final_total / max(n_scenes, 1):.3f}")
    if total_gt > 0:
        for i, t in enumerate(THRESH_LIST):
            logger.info(f"total bbox recall(thresh={t:.3f}): "
                        f"{int(total_recall[i])} / {total_gt} = "
                        f"{total_recall[i] / total_gt:.6f}")
            logger.info(f"total roi  recall(thresh={t:.3f}): "
                        f"{int(total_roi_recall[i])} / {total_gt} = "
                        f"{total_roi_recall[i] / total_gt:.6f}")
    scenes_per_sec = (scenes_timed / elapsed) if elapsed > 0 else 0.0
    logger.info(f"inference throughput: {scenes_per_sec:.2f} scenes/s "
                f"({scenes_timed} scenes in {elapsed:.2f}s, post-compile)")
    return {
        "recall": {t: float(total_recall[i] / max(total_gt, 1))
                   for i, t in enumerate(THRESH_LIST)},
        "roi_recall": {t: float(total_roi_recall[i] / max(total_gt, 1))
                       for i, t in enumerate(THRESH_LIST)},
        "avg_detections": final_total / max(n_scenes, 1),
        "scenes_per_sec": scenes_per_sec,
        "final_output_dir": final_output_dir,
        "empty_cnt": empty_cnt,
    }


def eval_one_epoch_rcnn(args, model, variables, loader, result_dir, logger):
    """rcnn_offline eval: saved proposals + dumped features -> RCNN refinement
    -> KITTI dumps + recall/cls-acc tables (reference parity:
    eval_rcnn.py:263-460 eval_one_epoch_rcnn; batched + fixed-shape here)."""
    dataset = loader.dataset
    final_output_dir = os.path.join(result_dir, "final_result", "data")
    os.makedirs(final_output_dir, exist_ok=True)
    if args.save_result:
        roi_output_dir = os.path.join(result_dir, "roi_result", "data")
        refine_output_dir = os.path.join(result_dir, "refine_result", "data")
        os.makedirs(roi_output_dir, exist_ok=True)
        os.makedirs(refine_output_dir, exist_ok=True)

    mesh = make_mesh(batch_size=args.batch_size)
    infer = jax.jit(make_offline_infer_step(model, cfg))
    total_recall = np.zeros(len(THRESH_LIST), np.int64)
    total_roi_recall = np.zeros(len(THRESH_LIST), np.int64)
    total_gt = 0
    total_cls_acc, total_cls_acc_refined = 0.0, 0.0
    final_total, n_scenes = 0, 0
    for batch in loader:
        batch_dev = shard_batch(mesh, {
            k: batch[k] for k in ("pts_input", "roi_boxes3d", "roi_valid",
                                  "roi_size")})
        out = jax.device_get(infer(
            variables, batch_dev["pts_input"], batch_dev["roi_boxes3d"],
            batch_dev["roi_valid"], batch_dev["roi_size"]))
        for k in range(len(batch["sample_id"])):
            if not batch["batch_valid"][k]:
                continue
            n_scenes += 1
            sample_id = int(batch["sample_id"][k])
            valid_k = batch["roi_valid"][k]
            calib = dataset.get_calib(sample_id)
            img_shape = dataset.get_image_shape(sample_id)
            if args.save_result:
                save_kitti_format(
                    sample_id, calib, batch["roi_boxes3d"][k][valid_k],
                    roi_output_dir, batch["roi_scores"][k][valid_k],
                    img_shape, classes=cfg.CLASSES)
                save_kitti_format(
                    sample_id, calib, out["pred_boxes3d"][k][valid_k],
                    refine_output_dir, out["raw_scores"][k][valid_k],
                    img_shape, classes=cfg.CLASSES)
            mask = out["final_mask"][k]
            boxes = out["final_boxes"][k][mask]
            scores = out["final_scores"][k][mask]
            final_total += save_kitti_format(
                sample_id, calib, boxes, final_output_dir, scores, img_shape,
                classes=cfg.CLASSES)
            if not args.test and "gt_boxes3d" in batch:
                gt = batch["gt_boxes3d"][k]
                gt = gt[np.abs(gt).sum(axis=1) > 0]
                rec, n_gt = _recall_counts(out["pred_boxes3d"][k][valid_k], gt)
                total_recall += rec
                total_gt += n_gt
                roi_rec, _ = _recall_counts(batch["roi_boxes3d"][k][valid_k],
                                            gt)
                total_roi_recall += roi_rec
                # cls accuracy vs gt_iou (reference :361-372)
                gt_iou = batch["gt_iou"][k][valid_k]
                pred_cls = (out["norm_scores"][k][valid_k]
                            > cfg.RCNN.SCORE_THRESH)
                cls_label = gt_iou > cfg.RCNN.CLS_FG_THRESH
                cls_valid = ((gt_iou >= cfg.RCNN.CLS_FG_THRESH)
                             | (gt_iou <= cfg.RCNN.CLS_BG_THRESH))
                total_cls_acc += (float(((pred_cls == cls_label)
                                         & cls_valid).sum())
                                  / max(float(cls_valid.sum()), 1.0))
                iou_thresh = 0.7 if cfg.CLASSES == "Car" else 0.5
                refined_label = gt_iou >= iou_thresh
                total_cls_acc_refined += (
                    float((pred_cls == refined_label).sum())
                    / max(len(refined_label), 1.0))

    for sid in dataset.image_idx_list:
        cur = os.path.join(final_output_dir, f"{sid}.txt")
        if not os.path.exists(cur):
            open(cur, "w").close()
    logger.info(f"final average detections: "
                f"{final_total / max(n_scenes, 1):.3f}")
    logger.info(f"final average cls acc: "
                f"{total_cls_acc / max(n_scenes, 1):.3f}")
    logger.info(f"final average cls acc refined: "
                f"{total_cls_acc_refined / max(n_scenes, 1):.3f}")
    if total_gt > 0:
        for i, t in enumerate(THRESH_LIST):
            logger.info(f"total bbox recall(thresh={t:.3f}): "
                        f"{int(total_recall[i])} / {total_gt} = "
                        f"{total_recall[i] / total_gt:.6f}")
            logger.info(f"total roi  recall(thresh={t:.3f}): "
                        f"{int(total_roi_recall[i])} / {total_gt} = "
                        f"{total_roi_recall[i] / total_gt:.6f}")
    return {
        "recall": {t: float(total_recall[i] / max(total_gt, 1))
                   for i, t in enumerate(THRESH_LIST)},
        "roi_recall": {t: float(total_roi_recall[i] / max(total_gt, 1))
                       for i, t in enumerate(THRESH_LIST)},
        "rcnn_cls_acc": total_cls_acc / max(n_scenes, 1),
        "rcnn_cls_acc_refined": total_cls_acc_refined / max(n_scenes, 1),
        "avg_detections": final_total / max(n_scenes, 1),
        "final_output_dir": final_output_dir,
    }


def main(argv=None):
    import os as _os

    import jax as _jax

    # TPU3D_PLATFORM=cpu forces the CPU backend (the axon plugin
    # overrides JAX_PLATFORMS, so use jax.config)
    if _os.environ.get("TPU3D_PLATFORM"):
        _jax.config.update("jax_platforms",
                           _os.environ["TPU3D_PLATFORM"])
    # persistent XLA compilation cache (first full-model compile is minutes)
    try:
        _cache = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__)))), ".jax_cache")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    args = parse_args(argv)
    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    # eval modes mirror train modes (reference: eval_rcnn.py:878-895)
    if args.eval_mode == "rcnn_offline":
        assert args.rcnn_eval_roi_dir and args.rcnn_eval_feature_dir, \
            "rcnn_offline needs --rcnn_eval_roi_dir and " \
            "--rcnn_eval_feature_dir"
        configure_mode("rcnn_offline")
    else:
        configure_mode("joint" if args.eval_mode in ("rcnn", "joint")
                       else "rpn")
    if args.eval_mode == "rcnn":
        cfg.RPN.FIXED = True

    result_dir = args.output_dir or os.path.join(
        "output", "eval", cfg.TAG, f"eval_{args.dataset}")
    os.makedirs(result_dir, exist_ok=True)
    logger = create_logger(os.path.join(result_dir, "log_eval.txt"))

    if args.synthetic:
        data_root = os.path.join(result_dir, "synthetic_data")
        if not os.path.exists(os.path.join(data_root, "KITTI")):
            create_synthetic_kitti(data_root, n_frames=8, image_files=True)
        args.data_root = data_root
    data_root = args.data_root or os.path.join("multi_data", args.dataset)

    split = "test" if args.test else cfg.TEST.SPLIT
    dataset = KittiRCNNDataset(
        root_dir=data_root, npoints=cfg.RPN.NUM_POINTS, split=split,
        mode="TEST" if args.test else "EVAL", classes=cfg.CLASSES, cfg=cfg,
        random_select=True, logger=logger, seed=args.seed,
        rcnn_eval_roi_dir=args.rcnn_eval_roi_dir,
        rcnn_eval_feature_dir=args.rcnn_eval_feature_dir)
    loader = BatchLoader(dataset, args.batch_size, shuffle=False,
                         num_workers=args.workers)

    model = PointRCNN(cfg=cfg, mode="TEST")
    sample = next(iter(loader))
    from ..parallel import create_train_state

    init_pts = sample["pts_input"][:1]
    if args.eval_mode == "rcnn_offline":  # (1, M, K, C) -> (M, K, C)
        init_pts = init_pts.reshape(-1, init_pts.shape[-2],
                                    init_pts.shape[-1])
    state = create_train_state(cfg, model, {"pts_input": init_pts},
                               jax.random.PRNGKey(0), 1, 1, train=False)
    eval_fn = {"rpn": eval_one_epoch_rpn,
               "rcnn_offline": eval_one_epoch_rcnn}.get(args.eval_mode,
                                                        eval_one_epoch_joint)

    if args.eval_all and args.ckpt_dir:
        return repeat_eval_ckpt(args, model, state, loader, result_dir, logger,
                                eval_fn)

    ckpt = args.ckpt or (latest_checkpoint(args.ckpt_dir)
                         if args.ckpt_dir else None)
    if ckpt:
        state, epoch = load_checkpoint(ckpt, state)
        logger.info(f"loaded checkpoint {ckpt} (epoch {epoch})")
    else:
        logger.warning("no checkpoint given — evaluating random weights")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return eval_fn(args, model, variables, loader, result_dir, logger)


def repeat_eval_ckpt(args, model, state, loader, result_dir, logger, eval_fn):
    """Daemon: poll --ckpt_dir for new checkpoints, evaluate each once, record
    evaluated epochs (reference parity: eval_rcnn.py:775-848 repeat_eval_ckpt —
    30 s poll, skip-already-evaluated via a record file, give up after
    max_waitmins with nothing new)."""
    import re
    import time as _time

    record_file = os.path.join(result_dir, "eval_list_val.txt")
    evaluated = set()
    if os.path.isfile(record_file):
        with open(record_file) as f:
            evaluated = {int(x) for x in f.read().split() if x.strip()}
    idle_start = time.time()
    results = {}
    while True:
        candidates = []
        if os.path.isdir(args.ckpt_dir):
            for fname in os.listdir(args.ckpt_dir):
                m = re.match(r"checkpoint_epoch_(\d+)\.msgpack$", fname)
                if m and int(m.group(1)) not in evaluated:
                    candidates.append((int(m.group(1)),
                                       os.path.join(args.ckpt_dir, fname)))
        if not candidates:
            if time.time() - idle_start > args.max_waitmins * 60:
                logger.info("repeat_eval: no new checkpoints, exiting")
                return results
            _time.sleep(args.wait_seconds)
            continue
        idle_start = time.time()
        for epoch, path in sorted(candidates):
            logger.info(f"repeat_eval: evaluating epoch {epoch} ({path})")
            state, _ = load_checkpoint(path, state)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            epoch_dir = os.path.join(result_dir, f"epoch_{epoch}")
            os.makedirs(epoch_dir, exist_ok=True)
            results[epoch] = eval_fn(args, model, variables, loader, epoch_dir,
                                     logger)
            evaluated.add(epoch)
            with open(record_file, "w") as f:
                f.write("\n".join(str(e) for e in sorted(evaluated)))


if __name__ == "__main__":
    main()
