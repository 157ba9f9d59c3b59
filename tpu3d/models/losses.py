"""Loss functions: Dice / sigmoid-focal / weighted-BCE classification and the
bin-based box regression loss.

Reference parity: lib/utils/loss_utils.py. The fg-row boolean indexing of the
reference becomes mask-weighted means (fixed shapes under jit): every per-row
loss is computed for all rows and averaged over the foreground mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bbox_codec import _select_bin


def _masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sigmoid_cross_entropy_with_logits(logits, labels):
    """TF-compatible elementwise sigmoid CE (reference: loss_utils.py:76-84)."""
    return (jnp.clip(logits, 0, None) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def dice_loss(logits, target, ignore_target=-1):
    """1 − soft IoU between sigmoid(logits) and {0,1} targets, ignoring rows
    labeled ignore_target (reference: loss_utils.py:7-21)."""
    probs = jax.nn.sigmoid(logits.reshape(-1))
    target = target.reshape(-1).astype(probs.dtype)
    mask = (target != ignore_target).astype(probs.dtype)
    inter = jnp.sum(jnp.minimum(probs, target) * mask)
    union = jnp.clip(jnp.sum(jnp.maximum(probs, target) * mask), 1.0, None)
    return 1.0 - inter / union


def sigmoid_focal_loss(logits, target, weights, gamma=2.0, alpha=0.25):
    """Elementwise sigmoid focal CE × weights (reference: loss_utils.py:24-73)."""
    ce = sigmoid_cross_entropy_with_logits(logits, target)
    probs = jax.nn.sigmoid(logits)
    p_t = target * probs + (1 - target) * (1 - probs)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = (target * alpha + (1 - target) * (1 - alpha)
               if alpha is not None else 1.0)
    return modulating * alpha_w * ce * weights


def smooth_l1(pred, target):
    """Elementwise huber with beta=1 (torch F.smooth_l1_loss default)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def softmax_ce(logits, label_idx):
    """Per-row softmax cross entropy against integer labels (log-prob pick as
    a masked reduction — see bbox_codec._select_bin for why)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -_select_bin(logp, label_idx)


def get_reg_loss(pred_reg, reg_label, fg_mask, loc_scope, loc_bin_size,
                 num_head_bin, anchor_size, get_xz_fine=True,
                 get_y_by_bin=False, loc_y_scope=0.5, loc_y_bin_size=0.25,
                 get_ry_fine=False):
    """Bin-based box regression loss over foreground rows.

    :param pred_reg: (N, C) raw head output (all rows; fg selected by mask)
    :param reg_label: (N, 7) [dx, dy, dz, h, w, l, ry]
    :param fg_mask: (N,) float/bool — rows contributing to the loss
    :param anchor_size: (3,) or (N, 3)
    :return: (loc_loss, angle_loss, size_loss, dict of scalar components)
    Reference parity: lib/utils/loss_utils.py:87-233 (per-row losses identical;
    reduction = mean over fg rows, matching F.cross_entropy/smooth_l1 on the
    reference's boolean-indexed subsets).
    """
    fg = fg_mask.astype(pred_reg.dtype)
    per_loc_bin_num = int(loc_scope / loc_bin_size) * 2
    loc_y_bin_num = int(loc_y_scope / loc_y_bin_size) * 2
    reg_loss_dict = {}

    # xz bin classification + residual
    x_offset, y_offset, z_offset = (reg_label[:, 0], reg_label[:, 1],
                                    reg_label[:, 2])
    x_shift = jnp.clip(x_offset + loc_scope, 0, loc_scope * 2 - 1e-3)
    z_shift = jnp.clip(z_offset + loc_scope, 0, loc_scope * 2 - 1e-3)
    x_bin = jnp.floor(x_shift / loc_bin_size).astype(jnp.int32)
    z_bin = jnp.floor(z_shift / loc_bin_size).astype(jnp.int32)

    loss_x_bin = _masked_mean(softmax_ce(pred_reg[:, 0:per_loc_bin_num], x_bin),
                              fg)
    loss_z_bin = _masked_mean(
        softmax_ce(pred_reg[:, per_loc_bin_num: per_loc_bin_num * 2], z_bin), fg)
    reg_loss_dict["loss_x_bin"] = loss_x_bin
    reg_loss_dict["loss_z_bin"] = loss_z_bin
    loc_loss = loss_x_bin + loss_z_bin
    start = per_loc_bin_num * 2

    if get_xz_fine:
        x_res_label = (x_shift - (x_bin.astype(x_shift.dtype) * loc_bin_size
                                  + loc_bin_size / 2)) / loc_bin_size
        z_res_label = (z_shift - (z_bin.astype(z_shift.dtype) * loc_bin_size
                                  + loc_bin_size / 2)) / loc_bin_size
        x_res_pred = _select_bin(
            pred_reg[:, start: start + per_loc_bin_num], x_bin)
        z_res_pred = _select_bin(
            pred_reg[:, start + per_loc_bin_num: start + per_loc_bin_num * 2],
            z_bin)
        loss_x_res = _masked_mean(smooth_l1(x_res_pred, x_res_label), fg)
        loss_z_res = _masked_mean(smooth_l1(z_res_pred, z_res_label), fg)
        reg_loss_dict["loss_x_res"] = loss_x_res
        reg_loss_dict["loss_z_res"] = loss_z_res
        loc_loss = loc_loss + loss_x_res + loss_z_res
        start += per_loc_bin_num * 2

    # y localization
    if get_y_by_bin:
        y_shift = jnp.clip(y_offset + loc_y_scope, 0, loc_y_scope * 2 - 1e-3)
        y_bin = jnp.floor(y_shift / loc_y_bin_size).astype(jnp.int32)
        y_res_label = (y_shift - (y_bin.astype(y_shift.dtype) * loc_y_bin_size
                                  + loc_y_bin_size / 2)) / loc_y_bin_size
        loss_y_bin = _masked_mean(
            softmax_ce(pred_reg[:, start: start + loc_y_bin_num], y_bin), fg)
        y_res_pred = _select_bin(
            pred_reg[:, start + loc_y_bin_num: start + loc_y_bin_num * 2],
            y_bin)
        loss_y_res = _masked_mean(smooth_l1(y_res_pred, y_res_label), fg)
        reg_loss_dict["loss_y_bin"] = loss_y_bin
        reg_loss_dict["loss_y_res"] = loss_y_res
        loc_loss = loc_loss + loss_y_bin + loss_y_res
        start += loc_y_bin_num * 2
    else:
        loss_y_offset = _masked_mean(smooth_l1(pred_reg[:, start], y_offset), fg)
        reg_loss_dict["loss_y_offset"] = loss_y_offset
        loc_loss = loc_loss + loss_y_offset
        start += 1

    # heading
    ry_label = reg_label[:, 6]
    if get_ry_fine:
        angle_per_class = (np.pi / 2) / num_head_bin
        ry_l = ry_label % (2 * np.pi)
        opposite = (ry_l > np.pi * 0.5) & (ry_l < np.pi * 1.5)
        ry_l = jnp.where(opposite, (ry_l + np.pi) % (2 * np.pi), ry_l)
        shift_angle = (ry_l + np.pi * 0.5) % (2 * np.pi)
        shift_angle = jnp.clip(shift_angle - np.pi * 0.25, 1e-3,
                               np.pi * 0.5 - 1e-3)
    else:
        angle_per_class = (2 * np.pi) / num_head_bin
        heading = ry_label % (2 * np.pi)
        shift_angle = (heading + angle_per_class / 2) % (2 * np.pi)
    ry_bin = jnp.floor(shift_angle / angle_per_class).astype(jnp.int32)
    ry_res_label = (shift_angle
                    - (ry_bin.astype(shift_angle.dtype) * angle_per_class
                       + angle_per_class / 2)) / (angle_per_class / 2)

    loss_ry_bin = _masked_mean(
        softmax_ce(pred_reg[:, start: start + num_head_bin], ry_bin), fg)
    ry_res_pred = _select_bin(
        pred_reg[:, start + num_head_bin: start + num_head_bin * 2], ry_bin)
    loss_ry_res = _masked_mean(smooth_l1(ry_res_pred, ry_res_label), fg)
    reg_loss_dict["loss_ry_bin"] = loss_ry_bin
    reg_loss_dict["loss_ry_res"] = loss_ry_res
    angle_loss = loss_ry_bin + loss_ry_res
    start += num_head_bin * 2

    # size residual (vs anchor), mean over fg rows × 3 dims
    anchor_size = jnp.asarray(anchor_size)
    size_label = (reg_label[:, 3:6] - anchor_size) / anchor_size
    size_pred = pred_reg[:, start: start + 3]
    size_loss = (jnp.sum(smooth_l1(size_pred, size_label) * fg[:, None])
                 / jnp.maximum(jnp.sum(fg) * 3, 1.0))

    reg_loss_dict["loss_loc"] = loc_loss
    reg_loss_dict["loss_angle"] = angle_loss
    reg_loss_dict["loss_size"] = size_loss
    return loc_loss, angle_loss, size_loss, reg_loss_dict
