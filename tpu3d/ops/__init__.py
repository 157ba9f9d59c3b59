"""tpu3d.ops — point-cloud compute primitives as jittable JAX/Pallas programs.

TPU-native replacements for the reference's three CUDA extensions
(pointnet2_cuda, iou3d_cuda, roipool3d_cuda) and its numba-CUDA evaluator kernel
(evaluate/rotate_iou.py). Every op is fixed-shape, differentiable where training
needs it, and ships a host numpy oracle for testing.
"""

from .box_geometry import (
    bev_corners_from_boxes3d,
    corners_from_boxes3d,
    enlarge_box3d,
    points_in_boxes3d,
    rotate_points_along_y,
)
from .rotated_iou import (
    boxes3d_to_bev5,
    boxes_iou3d,
    boxes_iou3d_numpy,
    boxes_iou_bev,
    rotated_iou_bev_numpy,
    rotated_overlap_bev,
)
from .nms import (nms_bev, nms_blocked_sorted, nms_normal, nms_numpy,
                  nms_rotated, nms_streaming_sorted)
from .sampling import (furthest_point_sample, furthest_point_sample_numpy,
                       furthest_point_sample_with_3nn, gather_points)
from .grouping import ball_query, ball_query_numpy, group_points
from .interpolate import (
    interpolation_weights,
    nn_dist_from_idx,
    three_interpolate,
    three_nn,
    three_nn_numpy,
)
from .roipool import roipool3d, roipool3d_numpy

__all__ = [
    "bev_corners_from_boxes3d", "corners_from_boxes3d", "enlarge_box3d",
    "points_in_boxes3d", "rotate_points_along_y", "boxes3d_to_bev5", "boxes_iou3d",
    "boxes_iou3d_numpy", "boxes_iou_bev", "rotated_iou_bev_numpy",
    "rotated_overlap_bev", "nms_bev", "nms_blocked_sorted", "nms_normal",
    "nms_numpy", "nms_rotated", "nms_streaming_sorted",
    "furthest_point_sample", "furthest_point_sample_numpy",
    "furthest_point_sample_with_3nn", "nn_dist_from_idx", "gather_points",
    "ball_query", "ball_query_numpy", "group_points", "interpolation_weights",
    "three_interpolate", "three_nn", "three_nn_numpy", "roipool3d",
    "roipool3d_numpy",
]
