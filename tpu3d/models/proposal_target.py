"""RCNN train-time ROI sampling, pooling, and target assignment — fixed shapes.

Reference parity: lib/rpn/proposal_target_layer.py. The reference's data-dependent
constructs are recast for XLA:

- fg/bg sampling with variable pool sizes -> masked random ranking + clipped
  index arithmetic into fixed ROI_PER_IMAGE slots;
- the jitter-until-IoU `aug_roi_by_noise` while loop -> ROI_FG_AUG_TIMES
  candidates generated in parallel, first-above-threshold selected
  (SURVEY.md §7 "hard parts");
- all randomness comes from explicit jax.random keys (the reference mixes global
  numpy/torch RNG; exact sequence parity is impossible and unnecessary — the
  sampling *distributions* match).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box_geometry import rotate_points_along_y
from ..ops.roipool import roipool3d
from ..ops.rotated_iou import boxes_iou3d


def _random_aug_box3d(key, box3d, method: str):
    """One jittered box (reference: proposal_target_layer.py:242-283)."""
    if method == "single":
        k1, k2, k3 = jax.random.split(key, 3)
        pos_shift = jax.random.uniform(k1, (3,)) - 0.5
        hwl_scale = (jax.random.uniform(k2, (3,)) - 0.5) / (0.5 / 0.15) + 1.0
        angle_rot = (jax.random.uniform(k3, (1,)) - 0.5) / (0.5 / (np.pi / 12))
        return jnp.concatenate([box3d[0:3] + pos_shift, box3d[3:6] * hwl_scale,
                                box3d[6:7] + angle_rot])
    if method == "multiple":
        range_config = jnp.asarray([[0.2, 0.1, np.pi / 12],
                                    [0.3, 0.15, np.pi / 12],
                                    [0.5, 0.15, np.pi / 9],
                                    [0.8, 0.15, np.pi / 6],
                                    [1.0, 0.15, np.pi / 3]], jnp.float32)
        k0, k1, k2, k3 = jax.random.split(key, 4)
        idx = jax.random.randint(k0, (), 0, range_config.shape[0])
        cfg_row = range_config[idx]
        pos_shift = ((jax.random.uniform(k1, (3,)) - 0.5) / 0.5) * cfg_row[0]
        hwl_scale = ((jax.random.uniform(k2, (3,)) - 0.5) / 0.5) * cfg_row[1] + 1.0
        angle_rot = ((jax.random.uniform(k3, (1,)) - 0.5) / 0.5) * cfg_row[2]
        return jnp.concatenate([box3d[0:3] + pos_shift, box3d[3:6] * hwl_scale,
                                box3d[6:7] + angle_rot])
    if method == "normal":
        k1, k2 = jax.random.split(key)
        shifts = jax.random.normal(k1, (6,)) * jnp.asarray(
            [0.3, 0.2, 0.3, 0.25, 0.15, 0.5], jnp.float32)
        ry_shift = ((jax.random.uniform(k2, (1,)) - 0.5) / 0.5) * np.pi / 12
        return jnp.concatenate([box3d[0:6] + shifts, box3d[6:7] + ry_shift])
    raise NotImplementedError(method)


def _aug_rois_by_noise(key, rois, gts, iou_src, pos_thresh, aug_times: int,
                       method: str):
    """Parallel recast of aug_roi_by_noise (proposal_target_layer.py:213-240):
    generate aug_times candidates per ROI (each the original w.p. 0.2, else
    jittered), take the first whose IoU with its gt reaches pos_thresh, else the
    last candidate. rois (M, 7), gts (M, 7), iou_src (M,)."""
    if aug_times == 0:
        return rois, iou_src
    m = rois.shape[0]
    keys = jax.random.split(key, m * aug_times * 2).reshape(m, aug_times, 2, 2)

    def per_roi(roi, gt, src_iou, roi_keys):
        def make_cand(k2):
            keep = jax.random.uniform(k2[0]) < 0.2
            jittered = _random_aug_box3d(k2[1], roi, method)
            return jnp.where(keep, roi, jittered), keep

        cands, keeps = jax.vmap(make_cand)(roi_keys)  # (T, 7), (T,)
        ious = boxes_iou3d(cands, gt[None, :])[:, 0]  # (T,)
        ok = ious >= pos_thresh
        # first ok candidate, else the last one tried
        first_ok = jnp.argmax(ok)
        sel = jnp.where(jnp.any(ok), first_ok, aug_times - 1)
        out_box = cands[sel]
        # reference: iou recorded as src when the kept-original branch chose it
        out_iou = jnp.where(keeps[sel], src_iou, ious[sel])
        return out_box, out_iou

    return jax.vmap(per_roi)(rois, gts, iou_src, keys)


def _sample_roi_indices(key, max_overlaps, valid_roi, rcnn_cfg):
    """Fixed-size fg/easy-bg/hard-bg index sampling
    (reference: sample_rois_for_rcnn + sample_bg_inds,
    proposal_target_layer.py:89-211). Returns (roi_idx (R,), is_fg (R,))."""
    R = int(rcnn_cfg.ROI_PER_IMAGE)
    fg_per_image = int(np.round(rcnn_cfg.FG_RATIO * R))
    fg_thresh = min(rcnn_cfg.REG_FG_THRESH, rcnn_cfg.CLS_FG_THRESH)

    m = max_overlaps.shape[0]
    fg_mask = (max_overlaps >= fg_thresh) & valid_roi
    easy_mask = (max_overlaps < rcnn_cfg.CLS_BG_THRESH_LO) & valid_roi
    hard_mask = ((max_overlaps >= rcnn_cfg.CLS_BG_THRESH_LO)
                 & (max_overlaps < rcnn_cfg.CLS_BG_THRESH) & valid_roi)
    fg_num = jnp.sum(fg_mask)
    easy_num = jnp.sum(easy_mask)
    hard_num = jnp.sum(hard_mask)
    bg_num = easy_num + hard_num

    k_perm, k_fgfill, k_hard, k_easy = jax.random.split(key, 4)
    # random permutation within each group: rank by uniform key, masked
    u = jax.random.uniform(k_perm, (m,))
    fg_order = jnp.argsort(jnp.where(fg_mask, u, 2.0))    # fg first, shuffled
    hard_order = jnp.argsort(jnp.where(hard_mask, u, 2.0))
    easy_order = jnp.argsort(jnp.where(easy_mask, u, 2.0))

    # how many fg slots (reference three-way case split):
    #   fg>0, bg>0 -> min(fg_per_image, fg_num); fg>0, bg==0 -> all R from fg
    #   (with replacement); fg==0 -> 0
    fg_take = jnp.where(
        fg_num > 0,
        jnp.where(bg_num > 0, jnp.minimum(fg_per_image, fg_num), R),
        0).astype(jnp.int32)
    bg_take = R - fg_take

    slots = jnp.arange(R)
    # fg slots: when more slots than distinct fg (bg==0 case) sample w/ replacement
    fg_fill = jax.random.randint(k_fgfill, (R,), 0,
                                 jnp.maximum(fg_num, 1))
    fg_pos = jnp.where(slots < fg_num, slots, fg_fill)
    fg_idx = fg_order[jnp.clip(fg_pos, 0, m - 1)]

    # bg slots: HARD_BG_RATIO of bg_take from hard pool (with replacement),
    # remainder from easy pool; degrade to whichever pool is non-empty
    hard_cnt = jnp.where(
        (hard_num > 0) & (easy_num > 0),
        (bg_take.astype(jnp.float32) * rcnn_cfg.HARD_BG_RATIO).astype(jnp.int32),
        jnp.where(hard_num > 0, bg_take, 0))
    bg_slot = slots  # position within the bg block
    hard_pick = hard_order[jax.random.randint(k_hard, (R,), 0,
                                              jnp.maximum(hard_num, 1))]
    easy_pick = easy_order[jax.random.randint(k_easy, (R,), 0,
                                              jnp.maximum(easy_num, 1))]
    bg_idx = jnp.where(bg_slot < hard_cnt, hard_pick, easy_pick)

    is_fg = slots < fg_take
    roi_idx = jnp.where(is_fg, fg_idx, bg_idx[jnp.clip(slots - fg_take, 0, R - 1)])
    return roi_idx.astype(jnp.int32), is_fg


def _rotate_boxes7_along_y(boxes7, angle):
    """Rotate box centers (x, z) and keep dims; ry handled by caller."""
    return rotate_points_along_y(boxes7, angle)


def _roi_data_augmentation(key, pts, rois, gt_of_rois, aug_rot_range):
    """Per-ROI rotation/scale/flip augmentation in the canonical-prep frame
    (reference: proposal_target_layer.py:285-341). pts (M, K, 3); rois,
    gt_of_rois (M, 7)."""
    m = pts.shape[0]
    k_rot, k_scale, k_flip = jax.random.split(key, 3)

    # rotation (reference quirk preserved: angles ~ (U-0.5/0.5) * pi/range,
    # proposal_target_layer.py:295 — i.e. U(-1, 0.5)·pi/range, not symmetric)
    angles = (jax.random.uniform(k_rot, (m,)) - 0.5 / 0.5) * (np.pi / aug_rot_range)

    def alpha_of(boxes):
        beta = jnp.arctan2(boxes[:, 2], boxes[:, 0])
        return -jnp.sign(beta) * np.pi / 2 + beta + boxes[:, 6]

    gt_alpha = alpha_of(gt_of_rois)
    roi_alpha = alpha_of(rois)

    pts = rotate_points_along_y(pts, angles[:, None])
    gt_of_rois = _rotate_boxes7_along_y(gt_of_rois, angles)
    rois = _rotate_boxes7_along_y(rois, angles)

    def recompute_ry(boxes, alpha):
        beta = jnp.arctan2(boxes[:, 2], boxes[:, 0])
        return jnp.sign(beta) * np.pi / 2 + alpha - beta

    gt_of_rois = gt_of_rois.at[:, 6].set(recompute_ry(gt_of_rois, gt_alpha))
    rois = rois.at[:, 6].set(recompute_ry(rois, roi_alpha))

    # scaling
    scales = 1 + ((jax.random.uniform(k_scale, (m,)) - 0.5) / 0.5) * 0.05
    pts = pts * scales[:, None, None]
    gt_of_rois = gt_of_rois.at[:, 0:6].multiply(scales[:, None])
    rois = rois.at[:, 0:6].multiply(scales[:, None])

    # flip along x; ry -> sign(ry)*pi - ry
    flip = jnp.sign(jax.random.uniform(k_flip, (m,)) - 0.5)
    pts = pts.at[:, :, 0].multiply(flip[:, None])
    gt_of_rois = gt_of_rois.at[:, 0].multiply(flip)
    src_ry = gt_of_rois[:, 6]
    gt_of_rois = gt_of_rois.at[:, 6].set(
        jnp.where(flip == 1, src_ry, jnp.sign(src_ry) * np.pi - src_ry))
    rois = rois.at[:, 0].multiply(flip)
    src_ry = rois[:, 6]
    rois = rois.at[:, 6].set(
        jnp.where(flip == 1, src_ry, jnp.sign(src_ry) * np.pi - src_ry))
    return pts, rois, gt_of_rois


def canonicalize_rcnn_targets(sampled_pts, batch_rois, batch_gt_of_rois,
                              batch_roi_iou, empty_flag, rcnn_cfg):
    """Canonical transform + cls/reg label masks — the deterministic tail of
    the proposal-target layer (reference: proposal_target_layer.py:45-66).
    Shared by the layer and the reference-differential test. Shapes
    (B, R, K, 3) / (B, R, 7) / (B, R); returns (canonical pts,
    canonical gt_of_rois, cls_label, reg_valid_mask)."""
    roi_ry = batch_rois[..., 6] % (2 * np.pi)
    roi_center = batch_rois[..., 0:3]
    sampled_pts = sampled_pts - roi_center[:, :, None, :]
    batch_gt_of_rois = batch_gt_of_rois.at[..., 0:3].add(-roi_center)
    batch_gt_of_rois = batch_gt_of_rois.at[..., 6].add(-roi_ry)
    sampled_pts = rotate_points_along_y(sampled_pts,
                                        batch_rois[..., 6][..., None])
    batch_gt_of_rois = rotate_points_along_y(batch_gt_of_rois, roi_ry)

    valid_mask = ~empty_flag
    reg_valid_mask = ((batch_roi_iou > rcnn_cfg.REG_FG_THRESH)
                      & valid_mask).astype(jnp.int32)
    cls_label = (batch_roi_iou > rcnn_cfg.CLS_FG_THRESH).astype(jnp.int32)
    invalid = ((batch_roi_iou > rcnn_cfg.CLS_BG_THRESH)
               & (batch_roi_iou < rcnn_cfg.CLS_FG_THRESH))
    cls_label = jnp.where(valid_mask, cls_label, -1)
    cls_label = jnp.where(invalid, -1, cls_label)
    return sampled_pts, batch_gt_of_rois, cls_label, reg_valid_mask


def proposal_target_layer(key, roi_boxes3d, roi_valid, gt_boxes3d, rpn_xyz,
                          pts_feature, cfg, aug_data: bool = True):
    """Sample ROIs, pool their points, build canonical-frame RCNN targets.

    :param key: jax PRNG key
    :param roi_boxes3d: (B, M, 7) proposals
    :param roi_valid: (B, M) proposal validity
    :param gt_boxes3d: (B, G, 7) zero-padded gt boxes
    :param rpn_xyz: (B, N, 3)
    :param pts_feature: (B, N, C) extra+backbone features (already concatenated)
    :return: dict of fixed-shape tensors, flattened over (B·R):
        sampled_pts (B·R, K, 3), pts_feature (B·R, K, C), cls_label (B·R,),
        reg_valid_mask (B·R,), gt_of_rois (B·R, 7), roi_boxes3d (B·R, 7)
    """
    B = roi_boxes3d.shape[0]
    rcnn_cfg = cfg.RCNN
    R = int(rcnn_cfg.ROI_PER_IMAGE)
    fg_thresh = min(rcnn_cfg.REG_FG_THRESH, rcnn_cfg.CLS_FG_THRESH)

    def per_image(key, rois, valid, gts):
        gt_valid = jnp.sum(jnp.abs(gts), axis=1) > 0  # zero rows = padding
        iou3d = boxes_iou3d(rois, gts)  # (M, G)
        iou3d = jnp.where(gt_valid[None, :], iou3d, -1.0)
        max_overlaps = jnp.max(iou3d, axis=1)
        gt_assignment = jnp.argmax(iou3d, axis=1)
        max_overlaps = jnp.where(valid, jnp.clip(max_overlaps, 0.0, None), 0.0)

        k_sample, k_aug = jax.random.split(key)
        roi_idx, is_fg = _sample_roi_indices(k_sample, max_overlaps, valid,
                                             rcnn_cfg)
        sampled_rois = rois[roi_idx]
        sampled_gts = gts[gt_assignment[roi_idx]]
        sampled_iou = max_overlaps[roi_idx]

        # jitter: fg with ROI_FG_AUG_TIMES tries, bg with 1 (when fg aug on)
        aug_times = int(rcnn_cfg.ROI_FG_AUG_TIMES)
        if aug_times > 0:
            aug_rois, aug_iou = _aug_rois_by_noise(
                k_aug, sampled_rois, sampled_gts[:, 0:7], sampled_iou,
                fg_thresh, aug_times, rcnn_cfg.REG_AUG_METHOD)
            # bg rois get a single jitter try (aug_times=1) — approximated by
            # reusing the first candidate; semantics: bg jitter has no IoU bar
            sampled_rois = aug_rois
            sampled_iou = aug_iou
        return (sampled_rois, sampled_gts[:, 0:7], sampled_iou, is_fg)

    keys = jax.random.split(key, B + 2)
    batch_keys, k_pool_aug, k_top = keys[:B], keys[B], keys[B + 1]
    batch_rois, batch_gt_of_rois, batch_roi_iou, batch_is_fg = jax.vmap(
        per_image)(batch_keys, roi_boxes3d, roi_valid, gt_boxes3d)

    # pool points per sampled ROI
    if (jax.default_backend() == "tpu"
            and bool(cfg.TRAIN.get("BF16_ACTIVATIONS", True))):
        # ONE bf16 row gather for the whole pooled block, identical to the
        # eval path (point_rcnn.py): features cast to bf16 (the training
        # bf16-activation policy) and the f32 coordinates ride along as a
        # bf16 hi/lo pair summed back after the gather (~1e-3 m absolute,
        # tighter than the downstream activation rounding). Replaces the
        # separate f32[524288,3] xyz + bf16[524288,130] feature gathers
        # (12.5 ms/step in the round-5 train trace; random-row reads run
        # ~30x under HBM bandwidth, so fewer/wider rows win).
        hi = rpn_xyz.astype(jnp.bfloat16)
        lo = (rpn_xyz - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        table = jnp.concatenate(
            [hi, lo, pts_feature.astype(jnp.bfloat16)], -1)
        _, pooled, empty_flag = roipool3d(
            rpn_xyz, table, batch_rois, float(rcnn_cfg.POOL_EXTRA_WIDTH),
            int(rcnn_cfg.NUM_POINTS), split="features")
        sampled_pts = (pooled[..., 0:3].astype(jnp.float32)
                       + pooled[..., 3:6].astype(jnp.float32))
        sampled_feats = pooled[..., 6:]
    else:
        pooled, empty_flag = roipool3d(
            rpn_xyz, pts_feature, batch_rois, float(rcnn_cfg.POOL_EXTRA_WIDTH),
            int(rcnn_cfg.NUM_POINTS))
        sampled_pts = pooled[..., 0:3]
        sampled_feats = pooled[..., 3:]

    if aug_data:
        aug_keys = jax.random.split(k_pool_aug, B)
        sampled_pts, batch_rois, batch_gt_of_rois = jax.vmap(
            lambda k, p, r, g: _roi_data_augmentation(
                k, p, r, g, float(cfg.AUG_ROT_RANGE)))(
            aug_keys, sampled_pts, batch_rois, batch_gt_of_rois)

    sampled_pts, batch_gt_of_rois, cls_label, reg_valid_mask = (
        canonicalize_rcnn_targets(sampled_pts, batch_rois, batch_gt_of_rois,
                                  batch_roi_iou, empty_flag, rcnn_cfg))

    K = int(rcnn_cfg.NUM_POINTS)
    return {
        "sampled_pts": sampled_pts.reshape(-1, K, 3),
        "pts_feature": sampled_feats.reshape(-1, K, sampled_feats.shape[-1]),
        "cls_label": cls_label.reshape(-1),
        "reg_valid_mask": reg_valid_mask.reshape(-1),
        "gt_of_rois": batch_gt_of_rois.reshape(-1, 7),
        "gt_iou": batch_roi_iou.reshape(-1),
        "roi_boxes3d": batch_rois.reshape(-1, 7),
    }
