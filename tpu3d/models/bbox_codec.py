"""Bin-based 3D box codec — decode and target-encoding in one symmetric module.

The reference splits this logic across lib/utils/bbox_transform.py:24-121 (decode)
and lib/utils/loss_utils.py:87-233 (encode-inside-loss); here both directions share
the same layout helper so head channel counts can never drift out of sync.

Regression layout (per row of pred_reg), identical to the reference:
  [x_bin | z_bin | (x_res | z_res if xz_fine) | y_offset (or y_bin|y_res) |
   ry_bin | ry_res | size_res(3)]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box_geometry import rotate_points_along_y


def reg_channels(loc_scope, loc_bin_size, num_head_bin, get_xz_fine,
                 get_y_by_bin=False, loc_y_scope=0.5, loc_y_bin_size=0.25) -> int:
    """Total regression channels for a head (reference: lib/net/rpn.py:31-38,
    rcnn_net.py:91-95)."""
    per_loc_bin_num = int(loc_scope / loc_bin_size) * 2
    loc_y_bin_num = int(loc_y_scope / loc_y_bin_size) * 2
    n = per_loc_bin_num * (4 if get_xz_fine else 2) + num_head_bin * 2 + 3
    n += loc_y_bin_num * 2 if get_y_by_bin else 1
    return n



def _select_bin(values, bin_idx):
    """Per-row pick of values[i, bin_idx[i]] as a masked reduction. On TPU the
    (N, ~12) take_along_axis lowers to a slow 1D-layout gather (~1.3 ms per
    call at the 8x16384 proposal decode); an iota-compare + sum is pure VPU
    and bit-exact (single selected lane)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, values.shape, 1)
    sel = cols == bin_idx[:, None].astype(jnp.int32)
    return jnp.sum(jnp.where(sel, values, 0), axis=1)


def decode_bbox_target(roi_box3d, pred_reg, loc_scope, loc_bin_size,
                       num_head_bin, anchor_size, get_xz_fine=True,
                       get_y_by_bin=False, loc_y_scope=0.5, loc_y_bin_size=0.25,
                       get_ry_fine=False):
    """Decode per-row bin predictions into boxes (N, 7) [x, y, z, h, w, l, ry].

    :param roi_box3d: (N, 3) point anchors or (N, 7) ROI boxes (canonical frame)
    :param pred_reg: (N, C) raw head output
    Reference parity: lib/utils/bbox_transform.py:24-121.
    """
    anchor_size = jnp.asarray(anchor_size)
    per_loc_bin_num = int(loc_scope / loc_bin_size) * 2
    loc_y_bin_num = int(loc_y_scope / loc_y_bin_size) * 2

    x_bin = jnp.argmax(pred_reg[:, 0:per_loc_bin_num], axis=1)
    z_bin = jnp.argmax(
        pred_reg[:, per_loc_bin_num: per_loc_bin_num * 2], axis=1)
    start = per_loc_bin_num * 2

    pos_x = x_bin.astype(pred_reg.dtype) * loc_bin_size + loc_bin_size / 2 - loc_scope
    pos_z = z_bin.astype(pred_reg.dtype) * loc_bin_size + loc_bin_size / 2 - loc_scope

    if get_xz_fine:
        x_res = _select_bin(
            pred_reg[:, start: start + per_loc_bin_num], x_bin) * loc_bin_size
        z_res = _select_bin(
            pred_reg[:, start + per_loc_bin_num: start + per_loc_bin_num * 2],
            z_bin) * loc_bin_size
        pos_x = pos_x + x_res
        pos_z = pos_z + z_res
        start += per_loc_bin_num * 2

    if get_y_by_bin:
        y_bin = jnp.argmax(pred_reg[:, start: start + loc_y_bin_num], axis=1)
        y_res = _select_bin(
            pred_reg[:, start + loc_y_bin_num: start + loc_y_bin_num * 2],
            y_bin) * loc_y_bin_size
        pos_y = (y_bin.astype(pred_reg.dtype) * loc_y_bin_size
                 + loc_y_bin_size / 2 - loc_y_scope + y_res)
        pos_y = pos_y + roi_box3d[:, 1]
        start += loc_y_bin_num * 2
    else:
        pos_y = roi_box3d[:, 1] + pred_reg[:, start]
        start += 1

    ry_bin = jnp.argmax(pred_reg[:, start: start + num_head_bin], axis=1)
    ry_res_norm = _select_bin(
        pred_reg[:, start + num_head_bin: start + num_head_bin * 2], ry_bin)
    if get_ry_fine:
        angle_per_class = (np.pi / 2) / num_head_bin
        ry = (ry_bin.astype(pred_reg.dtype) * angle_per_class
              + angle_per_class / 2
              + ry_res_norm * (angle_per_class / 2) - np.pi / 4)
    else:
        angle_per_class = (2 * np.pi) / num_head_bin
        ry = (ry_bin.astype(pred_reg.dtype) * angle_per_class
              + ry_res_norm * (angle_per_class / 2)) % (2 * np.pi)
        ry = jnp.where(ry > np.pi, ry - 2 * np.pi, ry)
    start += num_head_bin * 2

    size_res_norm = pred_reg[:, start: start + 3]
    hwl = size_res_norm * anchor_size + anchor_size

    shift_box = jnp.concatenate(
        [pos_x[:, None], pos_y[:, None], pos_z[:, None], hwl, ry[:, None]],
        axis=1)
    if roi_box3d.shape[1] == 7:
        # un-rotate out of the ROI's canonical frame
        roi_ry = roi_box3d[:, 6]
        shift_box = rotate_points_along_y(shift_box, -roi_ry)
        shift_box = shift_box.at[:, 6].add(roi_ry)
    shift_box = shift_box.at[:, 0].add(roi_box3d[:, 0])
    shift_box = shift_box.at[:, 2].add(roi_box3d[:, 2])
    return shift_box
