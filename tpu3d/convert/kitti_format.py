"""Shared KITTI-interchange-format writers used by all dataset converters.

Consolidates what the reference duplicates across convert/{waymo,nusc,lyft,
argo}2kitti.py: output directory layout, calib serialization, the clip-to-image
truncation estimate (waymo2kitti.py:163-180 / nusc2kitti.py:66-100), the
depth-ordered 2D paint-over occlusion estimate (waymo2kitti.py:272-284 /
nusc2kitti.py:51-64), and the '%.2f' label line format (waymo2kitti.py:287-298).
"""

from __future__ import annotations

import os

import numpy as np

# KITTI's own Tr_imu_to_velo, used as the placeholder in synthesized calibs
# (reference: waymo2kitti.py convert_calib)
KITTI_IMU_TO_VELO = (
    "9.999976000000e-01 7.553071000000e-04 -2.035826000000e-03 "
    "-8.086759000000e-01 -7.854027000000e-04 9.998898000000e-01 "
    "-1.482298000000e-02 3.195559000000e-01 2.024406000000e-03 "
    "1.482454000000e-02 9.998881000000e-01 -7.997231000000e-01")


def build_kitti_dirs(kitti_root: str, split: str = "training") -> dict:
    """Create training/{image_2,velodyne,calib,label_2} and return the paths."""
    base = os.path.join(kitti_root, split)
    paths = {
        "left": os.path.join(base, "image_2"),
        "lidar": os.path.join(base, "velodyne"),
        "calib": os.path.join(base, "calib"),
        "label": os.path.join(base, "label_2"),
    }
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    return paths


def calib_string(p2: np.ndarray, velo_to_cam: np.ndarray,
                 r0_rect: np.ndarray | None = None,
                 p0=None, p1=None, p3=None,
                 imu_to_velo: str = KITTI_IMU_TO_VELO) -> str:
    """KITTI calib file text from a (3,4) projection and (3,4) extrinsic."""
    r0 = np.eye(3) if r0_rect is None else np.asarray(r0_rect)

    def fmt(mat):
        return " ".join(str(x) for x in np.asarray(mat).reshape(-1).tolist())

    p0 = p2 if p0 is None else p0
    p1 = p2 if p1 is None else p1
    p3 = p2 if p3 is None else p3
    return (f"P0: {fmt(p0)}\nP1: {fmt(p1)}\nP2: {fmt(p2)}\nP3: {fmt(p3)}\n"
            f"R0_rect: {fmt(r0)}\nTr_velo_to_cam: {fmt(velo_to_cam[:3, :])}\n"
            f"Tr_imu_to_velo: {imu_to_velo}\n")


def clip_bbox_truncation(uv: np.ndarray, width: int, height: int,
                         depths: np.ndarray | None = None):
    """2D bbox from projected corners, clipped to the image, with a truncation
    estimate = fraction of bbox area clipped away. Returns None when no part of
    the box is visible. (reference parity: waymo2kitti.py:163-180.)"""
    bbox = [float(np.min(uv[:, 0])), float(np.min(uv[:, 1])),
            float(np.max(uv[:, 0])), float(np.max(uv[:, 1]))]
    depth_ok = True if depths is None else bool(np.min(depths) > 0)
    inside = (0 <= bbox[1] < height and 0 < bbox[3] <= height
              and 0 <= bbox[0] < width and 0 < bbox[2] <= width and depth_ok)
    valid = ((0 <= bbox[1] < height or 0 < bbox[3] <= height)
             and (0 <= bbox[0] < width or 0 < bbox[2] <= width) and depth_ok)
    if not valid:
        return None
    if inside:
        return bbox, 0.0
    clipped = [max(0.0, bbox[0]), max(0.0, bbox[1]),
               min(float(width), bbox[2]), min(float(height), bbox[3])]
    area = (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])
    clipped_area = (clipped[2] - clipped[0]) * (clipped[3] - clipped[1])
    truncation = 1.0 - clipped_area / area if area > 0 else 1.0
    return clipped, float(truncation)


def paintover_occlusion(objs: list[dict], height: int, width: int) -> list[dict]:
    """Estimate per-object occlusion tiers by painting 2D boxes far-to-near and
    measuring each box's surviving visible fraction (reference parity:
    waymo2kitti.py:272-284). Each obj needs 'bbox' and 'depth'; sets 'occluded'
    and returns the depth-sorted list."""
    canvas = np.full((height, width), -1, dtype=np.int64)
    objs = sorted(objs, key=lambda o: o["depth"], reverse=True)
    for i, obj in enumerate(objs):
        b = obj["bbox"]
        canvas[int(round(b[1])): int(round(b[3])),
               int(round(b[0])): int(round(b[2]))] = i
    unique, counts = np.unique(canvas, return_counts=True)
    visible = dict(zip(unique.tolist(), counts.tolist()))
    for i, obj in enumerate(objs):
        b = obj["bbox"]
        area = (b[3] - b[1]) * (b[2] - b[0])
        frac = 1.0 - visible.get(i, 0) / area if area > 0 else 1.0
        obj["occluded"] = int(np.clip(frac * 4, 0, 3))
    return objs


def label_line(obj: dict) -> str:
    """One KITTI label line from an obj dict with keys type/truncated/occluded/
    alpha/bbox/dimensions(hwl)/location/rotation_y ('%.2f' formatting,
    reference parity: waymo2kitti.py save_label_file)."""
    parts = [obj["type"], "%.2f" % obj["truncated"], str(obj["occluded"]),
             "%.2f" % obj["alpha"]]
    parts += ["%.2f" % x for x in obj["bbox"]]
    parts += ["%.2f" % x for x in obj["dimensions"]]
    parts += ["%.2f" % x for x in obj["location"]]
    parts.append("%.2f" % obj["rotation_y"])
    return " ".join(parts)


def save_label_file(objs: list[dict], path: str) -> None:
    with open(path, "w") as f:
        f.write("\n".join(label_line(o) for o in objs))


def save_point_cloud_bin(points_xyzi: np.ndarray, path: str) -> None:
    np.asarray(points_xyzi, dtype=np.float32).reshape(-1).tofile(path)
