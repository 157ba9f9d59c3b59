"""Loss assembly for joint RPN+RCNN training.

Reference parity: lib/net/train_functions.py (model_joint_fn_decorator). Returns
(total_loss, tb_dict) from the model's output dict and the batch labels; every
reduction is mask-based so the whole thing jits with fixed shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.box_geometry import enlarge_box3d, points_in_boxes3d
from .losses import dice_loss, get_reg_loss, sigmoid_focal_loss


def generate_rpn_labels_device(pts_rect, gt_boxes3d):
    """Device twin of the host loader's RPN label generation
    (KittiRCNNDataset.generate_rpn_training_labels; reference:
    lib/datasets/kitti_rcnn_dataset.py:384-414): per-point foreground/ignore
    segmentation labels and box-regression targets, computed inside the
    jitted train step from the zero-padded gt boxes.

    Why on device: the host labels are (N,) int32 + (N, 7) f32 per scene —
    at batch 16 x 16384 points that is ~8 MB/step of host->device traffic
    carrying information derivable from the ~11 KB of gt boxes already in
    the batch. Computing them on device is pure fixed-shape geometry (two
    point-in-rotated-box tests on the MXU-friendly (N, M) grid).

    Exact last-write-wins semantics of the host's per-box loop: for box k in
    index order the host sets cls[in_box_k] = 1 then
    cls[xor(in_box_k, in_ext_k)] = -1 and reg[in_box_k] = targets_k, so the
    highest-index box touching a point decides its labels (a point touched
    by box k gets +1 iff it is in both the box and its extension).

    :param pts_rect: (N, 3) rect-frame points
    :param gt_boxes3d: (M, 7) zero-padded gt boxes
    :return: cls_label (N,) int32 in {-1, 0, 1}, reg_label (N, 7) f32
    """
    pts_rect = jnp.asarray(pts_rect)
    gt_boxes3d = jnp.asarray(gt_boxes3d)
    gt_valid = jnp.sum(jnp.abs(gt_boxes3d), axis=1) > 0  # zero rows = padding
    inside = points_in_boxes3d(pts_rect, gt_boxes3d) & gt_valid[None, :]
    extend = enlarge_box3d(gt_boxes3d, 0.2)
    inside_ext = points_in_boxes3d(pts_rect, extend) & gt_valid[None, :]

    idx = jnp.arange(gt_boxes3d.shape[0])
    touched = inside | inside_ext
    last_touch = jnp.max(jnp.where(touched, idx, -1), axis=1)  # (N,)
    pos_at_last = jnp.take_along_axis(
        inside & inside_ext, jnp.clip(last_touch, 0)[:, None], axis=1)[:, 0]
    cls_label = jnp.where(
        last_touch >= 0, jnp.where(pos_at_last, 1, -1), 0).astype(jnp.int32)

    last_fg = jnp.max(jnp.where(inside, idx, -1), axis=1)
    fg = last_fg >= 0
    box = gt_boxes3d[jnp.clip(last_fg, 0)]  # (N, 7)
    center3d = box[:, 0:3].at[:, 1].add(-box[:, 3] / 2.0)  # true box center
    reg_label = jnp.concatenate([center3d - pts_rect, box[:, 3:7]], axis=1)
    reg_label = jnp.where(fg[:, None], reg_label, 0.0)
    return cls_label, reg_label


def get_rpn_loss(cfg, rpn_cls, rpn_reg, rpn_cls_label, rpn_reg_label):
    """(B, N, 1) logits, (B, N, C) reg, (B, N) labels {-1, 0, 1}, (B, N, 7) reg
    targets -> (loss, tb_dict). Reference: train_functions.py:55-120."""
    tb = {}
    cls_label_flat = rpn_cls_label.reshape(-1)
    cls_flat = rpn_cls.reshape(-1)
    fg_mask = cls_label_flat > 0

    if cfg.RPN.LOSS_CLS == "DiceLoss":
        rpn_loss_cls = dice_loss(cls_flat, cls_label_flat, ignore_target=-1)
    elif cfg.RPN.LOSS_CLS == "SigmoidFocalLoss":
        cls_target = fg_mask.astype(cls_flat.dtype)
        pos = cls_target
        neg = (cls_label_flat == 0).astype(cls_flat.dtype)
        cls_weights = (pos + neg) / jnp.clip(jnp.sum(pos), 1.0, None)
        per_entry = sigmoid_focal_loss(
            cls_flat, cls_target, cls_weights,
            gamma=cfg.RPN.FOCAL_GAMMA, alpha=cfg.RPN.FOCAL_ALPHA[0])
        tb["rpn_loss_cls_pos"] = jnp.sum(per_entry * pos)
        tb["rpn_loss_cls_neg"] = jnp.sum(per_entry * neg)
        rpn_loss_cls = jnp.sum(per_entry)
    elif cfg.RPN.LOSS_CLS == "BinaryCrossEntropy":
        weight = jnp.where(fg_mask, float(cfg.RPN.FG_WEIGHT), 1.0)
        target = fg_mask.astype(cls_flat.dtype)
        probs = jax.nn.sigmoid(cls_flat)
        eps = 1e-7
        bce = -(target * jnp.log(jnp.clip(probs, eps, None))
                + (1 - target) * jnp.log(jnp.clip(1 - probs, eps, None)))
        bce = bce * weight
        valid = (cls_label_flat >= 0).astype(cls_flat.dtype)
        rpn_loss_cls = jnp.sum(bce * valid) / jnp.clip(jnp.sum(valid), 1.0, None)
    else:
        raise NotImplementedError(cfg.RPN.LOSS_CLS)

    fg = fg_mask.astype(rpn_reg.dtype)
    fg_sum = jnp.sum(fg)
    loss_loc, loss_angle, loss_size, reg_dict = get_reg_loss(
        rpn_reg.reshape(-1, rpn_reg.shape[-1]),
        rpn_reg_label.reshape(-1, 7), fg,
        loc_scope=cfg.RPN.LOC_SCOPE, loc_bin_size=cfg.RPN.LOC_BIN_SIZE,
        num_head_bin=cfg.RPN.NUM_HEAD_BIN,
        anchor_size=jnp.asarray(cfg.CLS_MEAN_SIZE[0]),
        get_xz_fine=cfg.RPN.LOC_XZ_FINE, get_y_by_bin=False, get_ry_fine=False)
    loss_size = 3 * loss_size  # reference: train_functions.py:109
    rpn_loss_reg = jnp.where(fg_sum > 0, loss_loc + loss_angle + loss_size, 0.0)

    rpn_loss = (rpn_loss_cls * cfg.RPN.LOSS_WEIGHT[0]
                + rpn_loss_reg * cfg.RPN.LOSS_WEIGHT[1])
    tb.update({"rpn_loss_cls": rpn_loss_cls, "rpn_loss_reg": rpn_loss_reg,
               "rpn_loss": rpn_loss, "rpn_fg_sum": fg_sum,
               "rpn_loss_loc": loss_loc, "rpn_loss_angle": loss_angle,
               "rpn_loss_size": loss_size})
    return rpn_loss, tb


def get_rcnn_loss(cfg, ret_dict):
    """RCNN cls + canonical-frame bin regression loss
    (reference: train_functions.py:122-213)."""
    tb = {}
    rcnn_cls = ret_dict["rcnn_cls"]
    rcnn_reg = ret_dict["rcnn_reg"]
    cls_label = ret_dict["cls_label"].astype(rcnn_cls.dtype)
    reg_valid_mask = ret_dict["reg_valid_mask"]
    roi_boxes3d = ret_dict["roi_boxes3d"]
    gt_boxes3d_ct = ret_dict["gt_of_rois"]

    cls_label_flat = cls_label.reshape(-1)
    if cfg.RCNN.LOSS_CLS == "SigmoidFocalLoss":
        cls_flat = rcnn_cls.reshape(-1)
        cls_target = (cls_label_flat > 0).astype(cls_flat.dtype)
        pos = cls_target
        neg = (cls_label_flat == 0).astype(cls_flat.dtype)
        weights = (pos + neg) / jnp.clip(jnp.sum(pos), 1.0, None)
        per_entry = sigmoid_focal_loss(cls_flat, cls_target, weights,
                                       gamma=cfg.RCNN.FOCAL_GAMMA,
                                       alpha=cfg.RCNN.FOCAL_ALPHA[0])
        rcnn_loss_cls = jnp.sum(per_entry)
    elif cfg.RCNN.LOSS_CLS == "BinaryCrossEntropy":
        cls_flat = rcnn_cls.reshape(-1)
        probs = jax.nn.sigmoid(cls_flat)
        eps = 1e-7
        target = jnp.clip(cls_label_flat, 0.0, 1.0)
        bce = -(target * jnp.log(jnp.clip(probs, eps, None))
                + (1 - target) * jnp.log(jnp.clip(1 - probs, eps, None)))
        valid = (cls_label_flat >= 0).astype(cls_flat.dtype)
        rcnn_loss_cls = jnp.sum(bce * valid) / jnp.clip(jnp.sum(valid), 1.0,
                                                        None)
    else:
        raise NotImplementedError(cfg.RCNN.LOSS_CLS)

    fg = (reg_valid_mask > 0).astype(rcnn_reg.dtype)
    fg_sum = jnp.sum(fg)
    anchor = (roi_boxes3d[:, 3:6] if cfg.RCNN.SIZE_RES_ON_ROI
              else jnp.asarray(cfg.CLS_MEAN_SIZE[0]))
    loss_loc, loss_angle, loss_size, _ = get_reg_loss(
        rcnn_reg.reshape(rcnn_reg.shape[0], -1), gt_boxes3d_ct.reshape(-1, 7),
        fg, loc_scope=cfg.RCNN.LOC_SCOPE, loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
        num_head_bin=cfg.RCNN.NUM_HEAD_BIN, anchor_size=anchor,
        get_xz_fine=True, get_y_by_bin=cfg.RCNN.LOC_Y_BY_BIN,
        loc_y_scope=cfg.RCNN.LOC_Y_SCOPE, loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE,
        get_ry_fine=True)
    loss_size = 3 * loss_size
    rcnn_loss_reg = jnp.where(fg_sum > 0, loss_loc + loss_angle + loss_size, 0.0)

    rcnn_loss = rcnn_loss_cls + rcnn_loss_reg
    tb.update({"rcnn_loss_cls": rcnn_loss_cls, "rcnn_loss_reg": rcnn_loss_reg,
               "rcnn_loss": rcnn_loss,
               "rcnn_loss_loc": loss_loc, "rcnn_loss_angle": loss_angle,
               "rcnn_loss_size": loss_size,
               "rcnn_cls_fg": jnp.sum(cls_label_flat > 0),
               "rcnn_cls_bg": jnp.sum(cls_label_flat == 0),
               "rcnn_reg_fg": jnp.sum(reg_valid_mask)})
    return rcnn_loss, tb


def model_loss(cfg, ret_dict, data):
    """Total joint loss (reference: train_functions.py:model_fn body)."""
    tb = {}
    loss = 0.0
    if cfg.RPN.ENABLED and not cfg.RPN.FIXED:
        rpn_loss, tb_rpn = get_rpn_loss(
            cfg, ret_dict["rpn_cls"], ret_dict["rpn_reg"],
            data["rpn_cls_label"], data["rpn_reg_label"])
        loss = loss + rpn_loss
        tb.update(tb_rpn)
    if cfg.RCNN.ENABLED:
        if "cls_label" not in ret_dict:
            # offline-RCNN mode: targets come from the loader, not from the
            # on-device ProposalTargetLayer (reference: train_functions.py
            # model_fn reads them from `data` when cfg.RCNN.ROI_SAMPLE_JIT off)
            ret_dict = dict(ret_dict)
            ret_dict["cls_label"] = data["cls_label"].reshape(-1)
            ret_dict["reg_valid_mask"] = data["reg_valid_mask"].reshape(-1)
            ret_dict["roi_boxes3d"] = data["roi_boxes3d"].reshape(-1, 7)
            ret_dict["gt_of_rois"] = data["gt_boxes3d_ct"].reshape(-1, 7)
        rcnn_loss, tb_rcnn = get_rcnn_loss(cfg, ret_dict)
        loss = loss + rcnn_loss
        tb.update(tb_rcnn)
    tb["loss"] = loss
    return loss, tb
