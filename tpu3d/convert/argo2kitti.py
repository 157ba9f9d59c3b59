"""Argoverse 3D tracking -> KITTI format converter.

Reference parity: convert/argo2kitti.py — loads the full tracking dataset into
memory, shuffles each split with seed 19260817, chunks frames across 16 worker
processes; performs cv2 stereo rectification of the front stereo pair (the
stereo calib becomes the KITTI P2/P3 pair), exports all 7 ring cameras with
per-camera calibs, oxts-style poses, lidar .bin with reflectance 1.0, and
labels against both the ring-front-center and rectified-stereo calibrations.

Requires argoverse-api (lazy-imported).
"""

from __future__ import annotations

import copy
import multiprocessing as _mp
import os
import shutil

import numpy as np

from .kitti_format import (
    clip_bbox_truncation,
    label_line,
    paintover_occlusion,
    save_point_cloud_bin,
)

mp = _mp.get_context("spawn")

CLASS_MAP = {
    "VEHICLE": "Car",
    "PEDESTRIAN": "Pedestrian",
    "BICYCLIST": "Cyclist",
    "BUS": "Truck",
    "LARGE_VEHICLE": "Truck",
    "TRAILER": "Truck",
    "MOTORCYCLIST": "Misc",
}


def _require_argo():
    try:
        import argoverse
        from argoverse.data_loading.argoverse_tracking_loader import (
            ArgoverseTrackingLoader,
        )
        from argoverse.utils.camera_stats import (
            RING_CAMERA_LIST,
            RING_IMG_HEIGHT,
            RING_IMG_WIDTH,
            STEREO_CAMERA_LIST,
            STEREO_IMG_HEIGHT,
            STEREO_IMG_WIDTH,
        )
        from scipy.spatial.transform import Rotation

        return (argoverse, ArgoverseTrackingLoader, RING_CAMERA_LIST,
                RING_IMG_HEIGHT, RING_IMG_WIDTH, STEREO_CAMERA_LIST,
                STEREO_IMG_HEIGHT, STEREO_IMG_WIDTH, Rotation)
    except ImportError as e:  # pragma: no cover
        raise ImportError("Argoverse conversion needs argoverse-api") from e


def form_kitti_label(label, calib, img_size):
    """One tracking label -> KITTI obj dict, or None when invisible
    (reference parity: argo2kitti.py:226-282 form_kitty_label)."""
    import argoverse
    from scipy.spatial.transform import Rotation

    width, height = img_size
    if label.label_class not in CLASS_MAP:
        return None
    corners_ego = label.as_3d_bbox()
    uv = calib.project_ego_to_image(corners_ego)[:, :2]
    uv_cam = calib.project_ego_to_cam(corners_ego)
    if label.translation[0] <= 0:  # behind the ego's forward axis
        return None
    clipped = clip_bbox_truncation(uv, width, height, depths=uv_cam[:, 2])
    if clipped is None:
        return None
    bbox, truncated = clipped

    dcm_lidar = argoverse.utils.transform.quat2rotmat(label.quaternion)
    dcm_cam = calib.R @ dcm_lidar @ calib.R.T
    rot_y = -np.pi * 0.5 + Rotation.from_matrix(dcm_cam).as_rotvec()[1]
    rot_y = float(np.arctan2(np.sin(rot_y), np.cos(rot_y)))
    t_cam = calib.project_ego_to_cam(label.translation.reshape(1, 3))
    alpha = -np.arctan2(t_cam[0, 0], t_cam[0, 2]) + rot_y
    location = t_cam.reshape(-1).copy()
    location[1] += label.height / 2.0
    return {
        "original_type": label.label_class,
        "type": CLASS_MAP[label.label_class],
        "truncated": truncated,
        "occluded": 0,
        "alpha": float(alpha),
        "bbox": bbox,
        "dimensions": [label.height, label.width, label.length],
        "location": location,
        "rotation_y": rot_y,
        "depth": float(t_cam[0, 2]),
        "track_id": label.track_id,
    }


def rectify_stereo_pair(left_src, right_src, calib_l, calib_r, left_dst,
                        right_dst, img_size):
    """cv2 stereo rectification of the front stereo pair; returns the rectified
    calibrations (reference parity: argo2kitti.py:317-364 rectify_image)."""
    import cv2

    left_img, right_img = cv2.imread(left_src), cv2.imread(right_src)
    calib_l, calib_r = copy.deepcopy(calib_l), copy.deepcopy(calib_r)
    extrinsic = calib_r.extrinsic @ np.linalg.inv(calib_l.extrinsic)
    R, T = extrinsic[:3, :3], extrinsic[:3, 3].reshape(3, 1)
    dist = np.zeros(4)
    R1, R2, P1, P2, *_ = cv2.stereoRectify(
        cameraMatrix1=calib_l.K[:3, :3], distCoeffs1=dist,
        cameraMatrix2=calib_r.K[:3, :3], distCoeffs2=dist,
        imageSize=img_size, R=R, T=T, flags=cv2.CALIB_ZERO_DISPARITY, alpha=0)
    map1 = cv2.initUndistortRectifyMap(calib_l.K[:3, :3], dist, R1, P1,
                                       img_size, cv2.CV_32FC1)
    map2 = cv2.initUndistortRectifyMap(calib_r.K[:3, :3], dist, R2, P2,
                                       img_size, cv2.CV_32FC1)
    calib_l.K, calib_r.K = P1, P2
    calib_l.extrinsic[:3, :] = R1 @ calib_l.extrinsic[:3, :]
    calib_r.extrinsic = calib_l.extrinsic
    cv2.imwrite(left_dst, cv2.remap(left_img, *map1, cv2.INTER_LINEAR,
                                    cv2.BORDER_CONSTANT))
    cv2.imwrite(right_dst, cv2.remap(right_img, *map2, cv2.INTER_LINEAR,
                                     cv2.BORDER_CONSTANT))
    return calib_l, calib_r


def _calib_text(calib_l, calib_r=None):
    """KITTI calib text from argoverse calibration(s): P2 (and P3 for stereo)
    from K, Tr_velo_to_cam from the ego extrinsic."""
    from .kitti_format import calib_string

    p2 = np.asarray(calib_l.K)[:3, :4]
    p3 = np.asarray(calib_r.K)[:3, :4] if calib_r is not None else None
    velo_to_cam = np.asarray(calib_l.extrinsic)[:3, :]
    return calib_string(p2, velo_to_cam, p3=p3,
                        imu_to_velo=" ".join(["0"] * 12))


def extract_datapoints(root_dir, test_set=False):
    """Load every (lidar frame, closest camera images, calibs, pose, labels)
    tuple into memory (reference: argo2kitti.py:95-134)."""
    (argoverse, ArgoverseTrackingLoader, RING_CAMERA_LIST, *_rest,
     Rotation) = _require_argo()
    STEREO_CAMERA_LIST = _rest[2]

    loader = ArgoverseTrackingLoader(root_dir=root_dir)
    data = []
    for log_id in loader.log_list:
        log_data = loader.get(log_id=log_id)
        calibs = {cam: log_data.get_calibration(camera=cam, log_id=log_id)
                  for cam in STEREO_CAMERA_LIST + RING_CAMERA_LIST}
        for frame_id, lidar_ts in enumerate(log_data.lidar_timestamp_list):
            dp = {"log_id": log_id, "frame_id": frame_id,
                  "timestamp": lidar_ts, "calibs": calibs,
                  "lidar": loader.timestamp_lidar_dict[lidar_ts]}
            for cam in STEREO_CAMERA_LIST + RING_CAMERA_LIST:
                cam_ts = loader.sync.get_closest_cam_channel_timestamp(
                    lidar_timestamp=lidar_ts, camera_name=cam, log_id=log_id)
                dp[cam] = (loader.get_image_at_timestamp(
                    timestamp=cam_ts, camera=cam, log_id=log_id, load=False)
                    if cam_ts is not None else None)
            pose = log_data.get_pose(log_data.get_idx_from_timestamp(lidar_ts))
            dp["pose"] = (pose.translation,
                          Rotation.from_matrix(pose.rotation).as_euler("xyz"))
            if not test_set:
                dp["labels"] = loader.get_label_object(
                    idx=log_data.lidar_timestamp_list.index(lidar_ts),
                    log_id=log_id)
            data.append(dp)
    return data


def build_kitti_paths(kitti_root: str):
    """Directory layout incl. per-ring-camera image/calib dirs and poses
    (reference: argo2kitti.py build_kitti_path)."""
    (_a, _l, RING_CAMERA_LIST, *_r) = _require_argo()
    out = {}
    for split, sub in (("train", "training"), ("val", "training"),
                       ("test", "testing")):
        base = os.path.join(kitti_root, sub)
        paths = {
            "left": os.path.join(base, "image_2"),
            "right": os.path.join(base, "image_3"),
            "lidar": os.path.join(base, "velodyne"),
            "calib": os.path.join(base, "calib"),
            "label": os.path.join(base, "label_2"),
            "label_front": os.path.join(base, "label_front"),
            "pose": os.path.join(base, "oxts"),
            "list": os.path.join(kitti_root, f"{split}.txt"),
        }
        for cam in RING_CAMERA_LIST:
            paths[cam] = os.path.join(base, f"image_{cam}")
            paths[f"calib_{cam}"] = os.path.join(base, f"calib_{cam}")
        out[split] = paths
    return out


def process(index, lst, path, signal, target):
    """Worker over a chunk of frames (reference: argo2kitti.py:366-421)."""
    (_argoverse, _loader, RING_CAMERA_LIST, RING_IMG_HEIGHT, RING_IMG_WIDTH,
     _stereo_list, STEREO_IMG_HEIGHT, STEREO_IMG_WIDTH,
     _Rotation) = _require_argo()

    for name, dp in zip(index, lst):
        if name is None or dp is None:
            continue
        for cam in RING_CAMERA_LIST:
            if dp[cam] is not None:
                shutil.copyfile(dp[cam], os.path.join(path[cam], f"{name}.png"))

        calib_l = None
        if (dp.get("stereo_front_left") is not None
                and dp.get("stereo_front_right") is not None):
            calib_l, calib_r = rectify_stereo_pair(
                dp["stereo_front_left"], dp["stereo_front_right"],
                dp["calibs"]["stereo_front_left"],
                dp["calibs"]["stereo_front_right"],
                os.path.join(path["left"], f"{name}.png"),
                os.path.join(path["right"], f"{name}.png"),
                (STEREO_IMG_WIDTH, STEREO_IMG_HEIGHT))
            with open(os.path.join(path["calib"], f"{name}.txt"), "w") as f:
                f.write(_calib_text(calib_l, calib_r))
        for cam in RING_CAMERA_LIST:
            with open(os.path.join(path[f"calib_{cam}"], f"{name}.txt"),
                      "w") as f:
                f.write(_calib_text(dp["calibs"][cam]))

        lidar = np.asarray(dp["lidar"]) if not isinstance(
            dp["lidar"], str) else _load_ply(dp["lidar"])
        xyzi = np.hstack([lidar[:, :3],
                          np.ones((len(lidar), 1), np.float32)])
        save_point_cloud_bin(xyzi, os.path.join(path["lidar"], f"{name}.bin"))

        if "labels" in dp:
            objs = [form_kitti_label(x, dp["calibs"]["ring_front_center"],
                                     (RING_IMG_WIDTH, RING_IMG_HEIGHT))
                    for x in copy.deepcopy(dp["labels"])]
            objs = paintover_occlusion([o for o in objs if o is not None],
                                       RING_IMG_HEIGHT, RING_IMG_WIDTH)
            with open(os.path.join(path["label_front"], f"{name}.txt"),
                      "w") as f:
                f.write("\n".join(label_line(o) for o in objs))
            if calib_l is not None:
                objs = [form_kitti_label(x, calib_l,
                                         (STEREO_IMG_WIDTH, STEREO_IMG_HEIGHT))
                        for x in copy.deepcopy(dp["labels"])]
                objs = paintover_occlusion([o for o in objs if o is not None],
                                           STEREO_IMG_HEIGHT, STEREO_IMG_WIDTH)
                with open(os.path.join(path["label"], f"{name}.txt"),
                          "w") as f:
                    f.write("\n".join(label_line(o) for o in objs))

        with open(os.path.join(path["pose"], f"{name}.txt"), "w") as f:
            f.write(" ".join(f"{v:.8f}" for v in
                             np.concatenate([dp["pose"][0], dp["pose"][1]])))
        with signal.get_lock():  # shared across workers; += is not atomic
            signal.value += 1


def _load_ply(path):
    from argoverse.utils.ply_loader import load_ply

    return load_ply(path)


def _grouper(n, iterable):
    args = [iter(iterable)] * n
    from itertools import zip_longest

    return zip_longest(*args, fillvalue=None)


def format_data(data, path, start_idx, num_workers):
    """Chunk frames across worker processes (reference: argo2kitti.py:423-445)."""
    for p in path.values():
        if "." not in os.path.basename(p):
            os.makedirs(p, exist_ok=True)
    index = ["%06d" % i for i in range(start_idx, start_idx + len(data))]
    chunk = (len(data) - 1) // num_workers + 1
    signal = mp.Value("i", 0)
    procs = []
    for idx, lst in zip(_grouper(chunk, index), _grouper(chunk, data)):
        p = mp.Process(target=process, args=(idx, lst, path, signal,
                                             len(data)))
        p.start()
        procs.append(p)
    for p in procs:
        p.join()
    with open(path["list"], "w") as f:
        f.write("\n".join(index))


def argo_to_kitti(argo_path: str, kitti_path: str, worker: int = 16,
                  seed: int = 19260817) -> None:
    """Full conversion (reference: argo2kitti.py:446-500)."""
    argo_path = os.path.join(argo_path, "argoverse-tracking")
    np.random.seed(seed)
    assert os.path.isdir(argo_path)
    if os.path.isdir(kitti_path):
        return
    data = {split: extract_datapoints(os.path.join(argo_path, sub),
                                      test_set=(split == "test"))
            for split, sub in (("train", "train1"), ("val", "val"),
                               ("test", "test"))}
    for v in data.values():
        np.random.shuffle(v)
    paths = build_kitti_paths(kitti_path)
    format_data(data["train"], paths["train"], 0, worker)
    format_data(data["val"], paths["val"], len(data["train"]), worker)
    format_data(data["test"], paths["test"], 0, worker)
    with open(os.path.join(kitti_path, "trainval.txt"), "w") as f:
        for split in ("train", "val"):
            with open(os.path.join(kitti_path, f"{split}.txt")) as g:
                f.write(g.read().rstrip("\n") + "\n")
