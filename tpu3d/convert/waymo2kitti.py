"""Waymo Open Dataset -> KITTI format converter.

Reference parity: convert/waymo2kitti.py — one process per .tfrecord shard
(sequentially started so frame counts assign contiguous id ranges); per frame:
FRONT camera jpeg -> png, 1st+2nd-return lidar merged to velodyne .bin with
reflectance forced to 1.0, synthesized calib (identity R0, extrinsic computed
from the FRONT camera's ego pose with the axis permutation to the KITTI camera
frame), labels with clip-truncation and paint-over occlusion; failed shards are
logged to /tmp/waymo_missing.txt and skipped.

Requires waymo_open_dataset + TensorFlow (lazy-imported; see
scripts/convert_requirements in the reference for the original pins).
"""

from __future__ import annotations

import glob
import multiprocessing as _mp
import os
import time

import numpy as np

from .kitti_format import (
    build_kitti_dirs,
    calib_string,
    clip_bbox_truncation,
    paintover_occlusion,
    save_label_file,
    save_point_cloud_bin,
)

mp = _mp.get_context("spawn")

CLASS_MAP = {0: "UNKNOWN", 1: "Car", 2: "Pedestrian", 3: "SIGN", 4: "Cyclist"}

# ego -> KITTI-camera axis permutation: x_cam = -y_ego, y_cam = -z_ego,
# z_cam = x_ego (reference: waymo2kitti.py compute_extrinsic 'norm')
_EGO_TO_CAM_AXES = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=np.float64)


def _require_waymo():
    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2 as open_dataset
        from waymo_open_dataset.utils import frame_utils

        return tf, open_dataset, frame_utils
    except ImportError as e:  # pragma: no cover - SDK not in this image
        raise ImportError(
            "waymo conversion needs tensorflow + waymo_open_dataset "
            "(see the reference's scripts/convert_requirements.txt pins)"
        ) from e


def compute_extrinsic(camera_calib) -> np.ndarray:
    """4x4 ego->KITTI-camera extrinsic from the camera's vehicle-frame pose
    (reference: waymo2kitti.py:115-124)."""
    vehicle_to_cam = np.linalg.inv(
        np.reshape(np.array(camera_calib.extrinsic.transform), (4, 4)))
    vehicle_to_cam[:3, 3] = vehicle_to_cam[:3, 3].reshape(1, 3) @ _EGO_TO_CAM_AXES
    axes4 = np.eye(4)
    axes4[:3, :3] = _EGO_TO_CAM_AXES.T
    return vehicle_to_cam @ axes4


def intrinsic_matrix(intrinsic) -> np.ndarray:
    """(3, 4) pinhole P from waymo's [f_u, f_v, c_u, c_v, ...] vector."""
    k = np.zeros((3, 4))
    k[0, 0], k[1, 1] = intrinsic[0], intrinsic[1]
    k[0, 2], k[1, 2] = intrinsic[2], intrinsic[3]
    k[2, 2] = 1.0
    return k


def _ego_to_cam(pts_ego: np.ndarray, extrinsic: np.ndarray) -> np.ndarray:
    hom = np.hstack([pts_ego, np.ones((len(pts_ego), 1))])
    return (extrinsic @ hom.T).T[:, 0:3]


def _cam_to_image(pts_cam: np.ndarray, intrinsic: np.ndarray) -> np.ndarray:
    hom = np.hstack([pts_cam, np.ones((len(pts_cam), 1))])
    uv = hom @ intrinsic.T
    return uv[:, :2] / uv[:, 2:3]


def _box_corners_ego(box) -> np.ndarray:
    """(8, 3) ego-frame corners of a waymo laser box
    (reference: waymo2kitti.py:92-112 gen_obj_box_ptc)."""
    h, w, l = box.height, box.width, box.length
    c, s = np.cos(box.heading), np.sin(box.heading)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    x_c = np.array([w / 2, -w / 2, -w / 2, w / 2] * 2)
    y_c = np.array([l / 2, l / 2, -l / 2, -l / 2] * 2)
    z_c = np.array([h / 2] * 4 + [-h / 2] * 4)
    corners = rot @ np.vstack([x_c, y_c, z_c])
    return (corners + np.array([[box.center_x], [box.center_y],
                                [box.center_z]])).T


def form_kitti_label(label, extrinsic, intrinsic, height, width):
    """One laser label -> KITTI obj dict, or None when behind/out of view
    (reference parity: waymo2kitti.py:150-196, including the |x| >= |z| cull)."""
    center_ego = np.array([[label.box.center_x, label.box.center_y,
                            label.box.center_z]])
    center_cam = _ego_to_cam(center_ego, extrinsic)
    if (center_cam[0, 2] <= 0 or label.type in (0, 3)
            or np.abs(center_cam[0, 0]) >= np.abs(center_cam[0, 2])):
        return None
    corners_cam = _ego_to_cam(_box_corners_ego(label.box), extrinsic)
    uv = _cam_to_image(corners_cam, intrinsic)
    clipped = clip_bbox_truncation(uv, width, height,
                                   depths=corners_cam[:, 2])
    if clipped is None:
        return None
    bbox, truncated = clipped
    rot_y = -np.pi / 2.0 - label.box.heading
    rot_y = float(np.arctan2(np.sin(rot_y), np.cos(rot_y)))
    alpha = -np.arctan2(center_cam[0, 0], center_cam[0, 2]) + rot_y
    location = center_cam.reshape(-1).copy()
    location[1] += label.box.height / 2.0  # bottom-center convention
    return {
        "type": CLASS_MAP[label.type],
        "truncated": truncated,
        "occluded": 0,
        "alpha": float(alpha),
        "bbox": bbox,
        "dimensions": [label.box.height, label.box.width, label.box.length],
        "location": location,
        "rotation_y": rot_y,
        "depth": float(np.linalg.norm(center_cam)),
    }


def read_file(tfrecord_path, paths, start_idx, signal, done, target):
    """Convert one tfrecord shard (worker process; reference:
    waymo2kitti.py:226-269). Communicates its frame count through ``signal``."""
    tf, open_dataset, frame_utils = _require_waymo()
    try:
        dataset = tf.data.TFRecordDataset(tfrecord_path, compression_type="")
        count = sum(1 for _ in dataset)
    except Exception:
        signal.value = 0
        with open("/tmp/waymo_missing.txt", "a") as f:
            f.write(f"{tfrecord_path}\n")
        return
    # update the shared total BEFORE releasing the parent via `signal` (the
    # reference does it after, so a sibling launched meanwhile races the
    # unlocked +=, waymo2kitti.py:230-237) and take the Value's lock — the
    # += itself is not atomic
    with target.get_lock():
        target.value += count
    signal.value = count

    idx = start_idx
    for data in dataset:
        name = "%06d" % idx
        idx += 1
        frame = open_dataset.Frame()
        frame.ParseFromString(bytearray(data.numpy()))

        # FRONT image
        for image in frame.images:
            if image.name == open_dataset.CameraName.FRONT:
                decoded = tf.image.decode_jpeg(image.image).numpy()
                tf.io.write_file(
                    os.path.join(paths["left"], f"{name}.png"),
                    tf.image.encode_png(decoded))
                break

        # merged 1st+2nd-return lidar, reflectance forced to 1.0
        (range_images, camera_projections, _,
         range_image_top_pose) = frame_utils.parse_range_image_and_camera_projection(frame)
        points, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose)
        points_ri2, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose,
            ri_index=1)
        pts = np.concatenate(
            [np.concatenate(points), np.concatenate(points_ri2)], axis=0)
        xyzi = np.hstack([pts, np.ones((len(pts), 1), np.float32)])
        save_point_cloud_bin(xyzi, os.path.join(paths["lidar"], f"{name}.bin"))

        # calib + labels from the FRONT camera
        front = [c for c in frame.context.camera_calibrations
                 if c.name == open_dataset.CameraName.FRONT]
        assert len(front) == 1
        front = front[0]
        extrinsic = compute_extrinsic(front)
        intrinsic = intrinsic_matrix(front.intrinsic)
        with open(os.path.join(paths["calib"], f"{name}.txt"), "w") as f:
            f.write(calib_string(intrinsic, extrinsic[:3, :]))
        objs = [form_kitti_label(x, extrinsic, intrinsic, front.height,
                                 front.width) for x in frame.laser_labels]
        objs = paintover_occlusion([o for o in objs if o is not None],
                                   front.height, front.width)
        save_label_file(objs, os.path.join(paths["label"], f"{name}.txt"))
        with done.get_lock():  # cross-process progress counter
            done.value += 1


def waymo_to_kitti(waymo_path: str, kitti_path: str, seed: int = 19260817):
    """Convert all training/testing tfrecords (reference:
    waymo2kitti.py:301-355). Shards start sequentially so id ranges stay
    contiguous, then run in parallel."""
    np.random.seed(seed)
    assert os.path.isdir(waymo_path)
    if os.path.isdir(kitti_path):
        return
    paths = {"train": build_kitti_dirs(kitti_path, "training"),
             "test": build_kitti_dirs(kitti_path, "testing")}

    signal = mp.Value("i", 0)
    done = mp.Value("i", 0)
    target = mp.Value("i", 0)
    processes = []
    start_idx = 0
    for split, key in (("training", "train"), ("testing", "test")):
        for tfrecord in sorted(glob.glob(
                os.path.join(waymo_path, split, "*.tfrecord"))):
            signal.value = -1
            p = mp.Process(target=read_file,
                           args=(tfrecord, paths[key], start_idx, signal,
                                 done, target))
            p.start()
            processes.append(p)
            while signal.value == -1:
                if not p.is_alive():
                    # crashed before the handshake (import failure, OOM kill)
                    # — without this check the parent spins forever
                    raise RuntimeError(
                        f"waymo worker for {tfrecord} died before reporting "
                        f"its frame count (exitcode {p.exitcode})")
                time.sleep(1)
            start_idx += signal.value
    for p in processes:
        p.join()
