"""Lyft Level-5 -> KITTI format converter.

Reference parity: convert/lyft2kitti.py — lyft-devkit based, 16-way threaded;
the velo->cam chain is the 4-step lid->ego->world->ego->cam composition
(reference :223-235) because Lyft's lidar and camera records carry different
ego poses; otherwise identical structure to the nuScenes converter.
"""

from __future__ import annotations

import os

import numpy as np

from .kitti_format import (
    build_kitti_dirs,
    calib_string,
    clip_bbox_truncation,
    label_line,
    paintover_occlusion,
)

CLASS_MAP = {
    "bicycle": "Misc", "bus": "Truck", "car": "Car", "emergency_vehicle": "Car",
    "motorcycle": "Misc", "other_vehicle": "Truck", "pedestrian": "Pedestrian",
    "truck": "Truck", "animal": "Misc",
}

EXPECTED_KITTI_ROT = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]])


def _require_lyft():
    try:
        from lyft_dataset_sdk.lyftdataset import LyftDataset
        from lyft_dataset_sdk.utils.data_classes import LidarPointCloud
        from lyft_dataset_sdk.utils.geometry_utils import transform_matrix
        from lyft_dataset_sdk.utils.kitti import KittiDB
        from pyquaternion import Quaternion

        return LyftDataset, LidarPointCloud, transform_matrix, KittiDB, Quaternion
    except ImportError as e:  # pragma: no cover
        raise ImportError("Lyft conversion needs lyft_dataset_sdk") from e


class KittiConverter:
    def __init__(self, lyft_dataroot: str, table_folder: str, store_dir: str,
                 cam_name: str = "CAM_FRONT", lidar_name: str = "LIDAR_TOP",
                 parallel_n_jobs: int = 16):
        LyftDataset, *_ = _require_lyft()
        self.store_dir = os.path.expanduser(store_dir)
        self.cam_name = cam_name
        self.lidar_name = lidar_name
        self.parallel_n_jobs = parallel_n_jobs
        self.lyft_ds = LyftDataset(data_path=lyft_dataroot,
                                   json_path=table_folder)
        self.paths = build_kitti_dirs(self.store_dir, "training")
        self.tokens = [s["token"] for s in self.lyft_ds.sample]

    def process_token_to_kitti(self, sample_token: str) -> None:
        (_LyftDataset, LidarPointCloud, transform_matrix, KittiDB,
         Quaternion) = _require_lyft()
        kitti_to_nu_lidar = Quaternion(axis=(0, 0, 1), angle=np.pi / 2)

        sample = self.lyft_ds.get("sample", sample_token)
        lidar_token = sample["data"][self.lidar_name]
        sd_lid = self.lyft_ds.get("sample_data", lidar_token)
        cs_lid = self.lyft_ds.get("calibrated_sensor",
                                  sd_lid["calibrated_sensor_token"])
        ego_lid = self.lyft_ds.get("ego_pose", sd_lid["ego_pose_token"])

        cam_token = sample["data"][self.cam_name]
        name = "%06d" % self.tokens.index(sample_token)
        sd_cam = self.lyft_ds.get("sample_data", cam_token)
        cs_cam = self.lyft_ds.get("calibrated_sensor",
                                  sd_cam["calibrated_sensor_token"])
        ego_cam = self.lyft_ds.get("ego_pose", sd_cam["ego_pose_token"])
        imsize = (sd_cam["width"], sd_cam["height"])

        # 4-step chain: lidar -> lidar-ego -> world -> camera-ego -> camera
        # (reference: lyft2kitti.py:223-235)
        lid_to_ego = transform_matrix(cs_lid["translation"],
                                      Quaternion(cs_lid["rotation"]),
                                      inverse=False)
        lid_ego_to_world = transform_matrix(ego_lid["translation"],
                                            Quaternion(ego_lid["rotation"]),
                                            inverse=False)
        world_to_cam_ego = transform_matrix(ego_cam["translation"],
                                            Quaternion(ego_cam["rotation"]),
                                            inverse=True)
        ego_to_cam = transform_matrix(cs_cam["translation"],
                                      Quaternion(cs_cam["rotation"]),
                                      inverse=True)
        velo_to_cam = (ego_to_cam @ world_to_cam_ego
                       @ lid_ego_to_world @ lid_to_ego)
        velo_to_cam_kitti = velo_to_cam @ kitti_to_nu_lidar.transformation_matrix
        velo_to_cam_rot = velo_to_cam_kitti[:3, :3]
        velo_to_cam_trans = velo_to_cam_kitti[:3, 3]
        if self.lyft_ds.get("sensor",
                            cs_cam["sensor_token"])["channel"] == "CAM_FRONT":
            assert (velo_to_cam_rot.round(0) == EXPECTED_KITTI_ROT).all()

        p_left = np.zeros((3, 4))
        p_left[:3, :3] = cs_cam["camera_intrinsic"]

        from PIL import Image

        dst_im = os.path.join(self.paths["left"], f"{name}.png")
        if not os.path.exists(dst_im):
            with Image.open(
                    self.lyft_ds.data_path / sd_cam["filename"]) as im:
                im.save(dst_im, "PNG")

        pcl = LidarPointCloud.from_file(
            self.lyft_ds.data_path / sd_lid["filename"])
        pcl.rotate(kitti_to_nu_lidar.inverse.rotation_matrix)
        pcl.points.T.astype(np.float32).tofile(
            os.path.join(self.paths["lidar"], f"{name}.bin"))

        with open(os.path.join(self.paths["calib"], f"{name}.txt"), "w") as f:
            f.write(calib_string(
                p_left,
                np.hstack([velo_to_cam_rot, velo_to_cam_trans.reshape(3, 1)]),
                p0=np.zeros((3, 4)), p1=np.zeros((3, 4)), p3=np.zeros((3, 4)),
                imu_to_velo=" ".join(["0"] * 12)))

        label_path = os.path.join(self.paths["label"], f"{name}.txt")
        if os.path.exists(label_path):
            return
        from pyquaternion import Quaternion as Q

        objects = []
        r0 = Q(axis=[1, 0, 0], angle=0)
        for ann_token in sample["anns"]:
            ann = self.lyft_ds.get("sample_annotation", ann_token)
            _, boxes, _ = self.lyft_ds.get_sample_data(
                lidar_token, selected_anntokens=[ann_token])
            box_lidar = boxes[0]
            det_name = ann["category_name"] if isinstance(
                ann["category_name"], str) else None
            if det_name not in CLASS_MAP:
                continue
            box_cam = KittiDB.box_nuscenes_to_kitti(
                box_lidar, Q(matrix=velo_to_cam_rot), velo_to_cam_trans, r0)
            box = box_cam.copy()
            box.translate(np.array([0, -box.wlh[2] / 2, 0]))
            corners = box.corners().T
            corners = corners[corners[:, 2] > 0]
            if len(corners) == 0:
                continue
            hom = corners @ p_left[:3, :3].T
            uv = hom[:, :2] / hom[:, 2:3]
            proj = clip_bbox_truncation(uv, imsize[0], imsize[1])
            if proj is None:
                continue
            bbox_2d, truncated = proj
            v = box_cam.rotation_matrix @ np.array([1, 0, 0])
            rot_y = -np.arctan2(v[2], v[0])
            alpha = -np.arctan2(box_cam.center[0], box_cam.center[2]) + rot_y
            objects.append({
                "type": CLASS_MAP[det_name],
                "truncated": truncated,
                "occluded": 0,
                "alpha": float(alpha),
                "bbox": bbox_2d,
                "dimensions": [box_cam.wlh[2], box_cam.wlh[0], box_cam.wlh[1]],
                "location": list(box_cam.center[:3]),
                "rotation_y": float(rot_y),
                "depth": float(np.linalg.norm(box_cam.center[:3])),
            })
        objects = paintover_occlusion(objects, imsize[1], imsize[0])
        with open(label_path, "w") as f:
            f.write("\n".join(label_line(o) for o in objects))

    def nuscenes_gt_to_kitti(self) -> None:
        from joblib import Parallel, delayed, parallel_backend

        with open(os.path.join(self.store_dir, "train.txt"), "w") as f:
            f.write("\n".join("%06d" % i for i in range(len(self.tokens))))
        with parallel_backend("threading", n_jobs=self.parallel_n_jobs):
            Parallel()(delayed(self.process_token_to_kitti)(t)
                       for t in self.tokens)


def lyft_to_kitti(raw_path: str, kitti_path: str) -> None:
    KittiConverter(
        lyft_dataroot=raw_path,
        table_folder=os.path.join(raw_path, "train_data"),
        store_dir=kitti_path).nuscenes_gt_to_kitti()
