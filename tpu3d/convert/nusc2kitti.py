"""nuScenes -> KITTI format converter (+ KITTI-result -> nuScenes back-conversion).

Reference parity: convert/nusc2kitti.py — uses the nuscenes-devkit; the
velo->cam chain comes from the calibrated-sensor records with the
kitti<->nuScenes lidar quarter-turn; the KITTI rotation convention is asserted
(reference :243-244); the train/val split is by scene with the last 150 scenes
as val (reference :182-197); labels get clip-truncation + paint-over occlusion.

SDK is lazy-imported (nuscenes-devkit is not in this image).
"""

from __future__ import annotations

import json
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
    "bicycle": "Misc", "bus": "Truck", "car": "Car",
    "construction_vehicle": "Truck", "motorcycle": "Misc",
    "pedestrian": "Pedestrian", "trailer": "Truck", "truck": "Truck",
}

EXPECTED_KITTI_ROT = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]])


def _require_nusc():
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils.data_classes import LidarPointCloud
        from nuscenes.utils.geometry_utils import BoxVisibility, transform_matrix
        from nuscenes.utils.kitti import KittiDB
        from nuscenes.utils.splits import create_splits_logs
        from nuscenes.eval.detection.utils import category_to_detection_name
        from pyquaternion import Quaternion

        return (NuScenes, LidarPointCloud, BoxVisibility, transform_matrix,
                KittiDB, create_splits_logs, category_to_detection_name,
                Quaternion)
    except ImportError as e:  # pragma: no cover
        raise ImportError("nuScenes conversion needs nuscenes-devkit "
                          "+ pyquaternion") from e


class KittiConverter:
    """nuScenes GT -> KITTI directory (reference: nusc2kitti.py:103-354)."""

    def __init__(self, dataroot: str, nusc_kitti_dir: str,
                 cam_name: str = "CAM_FRONT", lidar_name: str = "LIDAR_TOP",
                 nusc_version: str = "v1.0-trainval", split: str = "train",
                 val_scene_count: int = 150):
        (NuScenes, *_rest) = _require_nusc()
        self.nusc_kitti_dir = os.path.expanduser(nusc_kitti_dir)
        self.cam_name = cam_name
        self.lidar_name = lidar_name
        self.split = split
        self.val_scene_count = val_scene_count
        os.makedirs(self.nusc_kitti_dir, exist_ok=True)
        self.nusc = NuScenes(version=nusc_version, dataroot=dataroot)

    def _split_to_samples(self, split_logs):
        samples = []
        for sample in self.nusc.sample:
            scene = self.nusc.get("scene", sample["scene_token"])
            logfile = self.nusc.get("log", scene["log_token"])["logfile"]
            if logfile in split_logs:
                samples.append((scene["name"], sample["token"]))
        return samples

    def nuscenes_gt_to_kitti(self) -> None:
        (_NuScenes, LidarPointCloud, BoxVisibility, transform_matrix, KittiDB,
         create_splits_logs, category_to_detection_name,
         Quaternion) = _require_nusc()

        kitti_to_nu_lidar = Quaternion(axis=(0, 0, 1), angle=np.pi / 2)
        kitti_to_nu_lidar_inv = kitti_to_nu_lidar.inverse
        imsize = (1600, 900)

        split_mapping = {"train": "training", "val": "testing"}
        paths = build_kitti_dirs(self.nusc_kitti_dir,
                                 split_mapping[self.split])

        split_logs = create_splits_logs(self.split, self.nusc)
        scene_samples = self._split_to_samples(split_logs)

        # per-scene id grouping; last val_scene_count scenes -> val
        # (reference: nusc2kitti.py:182-197)
        sequence_mapping: dict[str, list[int]] = {}
        for idx, (scene_name, _token) in enumerate(scene_samples):
            sequence_mapping.setdefault(scene_name, []).append(idx)
        if self.split == "train":
            scenes = list(sequence_mapping.keys())
            for fname, keys in (("train.txt", scenes[:-self.val_scene_count]),
                                ("val.txt", scenes[-self.val_scene_count:])):
                with open(os.path.join(self.nusc_kitti_dir, fname), "w") as f:
                    for s in keys:
                        f.write("".join("%06d\n" % t
                                        for t in sequence_mapping[s]))
        else:
            with open(os.path.join(self.nusc_kitti_dir, "test.txt"), "w") as f:
                for s in sequence_mapping:
                    f.write("".join("%06d\n" % t for t in sequence_mapping[s]))

        for idx, (_scene, sample_token) in enumerate(scene_samples):
            sample = self.nusc.get("sample", sample_token)
            cam_token = sample["data"][self.cam_name]
            lidar_token = sample["data"][self.lidar_name]
            name = "%06d" % idx

            sd_cam = self.nusc.get("sample_data", cam_token)
            sd_lid = self.nusc.get("sample_data", lidar_token)
            cs_cam = self.nusc.get("calibrated_sensor",
                                   sd_cam["calibrated_sensor_token"])
            cs_lid = self.nusc.get("calibrated_sensor",
                                   sd_lid["calibrated_sensor_token"])

            lid_to_ego = transform_matrix(
                cs_lid["translation"], Quaternion(cs_lid["rotation"]),
                inverse=False)
            ego_to_cam = transform_matrix(
                cs_cam["translation"], Quaternion(cs_cam["rotation"]),
                inverse=True)
            velo_to_cam = ego_to_cam @ lid_to_ego
            velo_to_cam_kitti = velo_to_cam @ kitti_to_nu_lidar.transformation_matrix
            velo_to_cam_rot = velo_to_cam_kitti[:3, :3]
            velo_to_cam_trans = velo_to_cam_kitti[:3, 3]
            # KITTI rotation-convention invariant (reference :243-244)
            assert (velo_to_cam_rot.round(0) == EXPECTED_KITTI_ROT).all()
            assert (velo_to_cam_trans[1:3] < 0).all()

            p_left = np.zeros((3, 4))
            p_left[:3, :3] = cs_cam["camera_intrinsic"]

            # image (jpg -> png)
            from PIL import Image

            dst_im = os.path.join(paths["left"], name + ".png")
            if not os.path.exists(dst_im):
                with Image.open(os.path.join(self.nusc.dataroot,
                                             sd_cam["filename"])) as im:
                    im.save(dst_im, "PNG")

            # lidar (single sweep, rotated into the KITTI lidar frame)
            pcl = LidarPointCloud.from_file(
                os.path.join(self.nusc.dataroot, sd_lid["filename"]))
            pcl.rotate(kitti_to_nu_lidar_inv.rotation_matrix)
            pcl.points.T.astype(np.float32).tofile(
                os.path.join(paths["lidar"], name + ".bin"))

            with open(os.path.join(paths["calib"], name + ".txt"), "w") as f:
                f.write(calib_string(
                    p_left,
                    np.hstack([velo_to_cam_rot,
                               velo_to_cam_trans.reshape(3, 1)]),
                    p0=np.zeros((3, 4)), p1=np.zeros((3, 4)),
                    p3=np.zeros((3, 4)),
                    imu_to_velo=" ".join(["0"] * 12)))

            label_path = os.path.join(paths["label"], name + ".txt")
            if os.path.exists(label_path):
                continue
            objects = []
            r0 = Quaternion(axis=[1, 0, 0], angle=0)
            for ann_token in sample["anns"]:
                ann = self.nusc.get("sample_annotation", ann_token)
                _, boxes, _ = self.nusc.get_sample_data(
                    lidar_token, box_vis_level=BoxVisibility.NONE,
                    selected_anntokens=[ann_token])
                box_lidar = boxes[0]
                det_name = category_to_detection_name(ann["category_name"])
                if det_name is None or det_name not in CLASS_MAP:
                    continue
                box_cam = KittiDB.box_nuscenes_to_kitti(
                    box_lidar, Quaternion(matrix=velo_to_cam_rot),
                    velo_to_cam_trans, r0)
                proj = self._project_box(box_cam, p_left, imsize)
                if proj is None:
                    continue
                bbox_2d, truncated = proj
                v = box_cam.rotation_matrix @ np.array([1, 0, 0])
                rot_y = -np.arctan2(v[2], v[0])
                alpha = (-np.arctan2(box_cam.center[0], box_cam.center[2])
                         + rot_y)
                objects.append({
                    "type": CLASS_MAP[det_name],
                    "truncated": truncated,
                    "occluded": 0,
                    "alpha": float(alpha),
                    "bbox": bbox_2d,
                    # wlh -> KITTI hwl
                    "dimensions": [box_cam.wlh[2], box_cam.wlh[0],
                                   box_cam.wlh[1]],
                    "location": list(box_cam.center[:3]),
                    "rotation_y": float(rot_y),
                    "depth": float(np.linalg.norm(box_cam.center[:3])),
                })
            objects = paintover_occlusion(objects, imsize[1], imsize[0])
            with open(label_path, "w") as f:
                f.write("\n".join(label_line(o) for o in objects))

    @staticmethod
    def _project_box(box_cam, p_left, imsize):
        """Project the 3D box to a clipped 2D bbox + truncation
        (reference: nusc2kitti.py:66-100 project_to_2d — bottom-center shift,
        only corners in front of the camera)."""
        box = box_cam.copy()
        box.translate(np.array([0, -box.wlh[2] / 2, 0]))
        corners = box.corners().T
        corners = corners[corners[:, 2] > 0]
        if len(corners) == 0:
            return None
        hom = corners @ p_left[:3, :3].T
        uv = hom[:, :2] / hom[:, 2:3]
        return clip_bbox_truncation(uv, imsize[0], imsize[1])

    def render_kitti(self, render_2d: bool = False, max_frames: int = 10,
                     split_dir: str = "training") -> str:
        """Render converted frames for eyeballing — camera view (image +
        projected 3D wireframes, or 2D boxes with render_2d) and a lidar BEV
        view — into <out>/render (reference: nusc2kitti.py:357-381
        render_kitti; devkit-free here: our own Calibration/read_label +
        matplotlib do the drawing, so it also works for any KITTI dir)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..kitti.boxes import corners_from_boxes3d
        from ..kitti.calibration import Calibration
        from ..kitti.object3d import read_label

        base = os.path.join(self.nusc_kitti_dir, split_dir)
        render_dir = os.path.join(self.nusc_kitti_dir, "render")
        os.makedirs(render_dir, exist_ok=True)
        ids = sorted(f[:-4] for f in os.listdir(os.path.join(base, "label_2"))
                     if f.endswith(".txt"))[:max_frames]
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for name in ids:
            calib = Calibration(os.path.join(base, "calib", f"{name}.txt"))
            objs = read_label(os.path.join(base, "label_2", f"{name}.txt"))
            # camera view
            fig, ax = plt.subplots(figsize=(8, 5))
            img_path = os.path.join(base, "image_2", f"{name}.png")
            if os.path.exists(img_path):
                try:
                    from PIL import Image

                    ax.imshow(np.asarray(Image.open(img_path)))
                except Exception:
                    pass
            for o in objs:
                if render_2d:
                    x1, y1, x2, y2 = o.box2d
                    ax.add_patch(plt.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                               fill=False, color="lime"))
                    continue
                box7 = np.array([[*o.pos, o.h, o.w, o.l, o.ry]], np.float32)
                corners = corners_from_boxes3d(box7)[0]
                pts2, _ = calib.rect_to_img(corners)
                for a, b in edges:
                    ax.plot([pts2[a, 0], pts2[b, 0]], [pts2[a, 1], pts2[b, 1]],
                            color="lime", linewidth=1)
            ax.set_title(f"{name} camera")
            fig.savefig(os.path.join(render_dir, f"{name}_camera.png"))
            plt.close(fig)
            # lidar BEV view
            fig, ax = plt.subplots(figsize=(6, 6))
            velo_path = os.path.join(base, "velodyne", f"{name}.bin")
            if os.path.exists(velo_path):
                pts = np.fromfile(velo_path, np.float32).reshape(-1, 4)
                rect = calib.project_velo_to_rect(pts[:, :3])
                ax.scatter(rect[:, 0], rect[:, 2], s=0.5, c="gray")
            for o in objs:
                box7 = np.array([[*o.pos, o.h, o.w, o.l, o.ry]], np.float32)
                c = corners_from_boxes3d(box7)[0]
                loop = [0, 1, 2, 3, 0]
                ax.plot(c[loop, 0], c[loop, 2], color="red", linewidth=1)
            ax.set_xlabel("x (m)")
            ax.set_ylabel("z (m)")
            ax.set_title(f"{name} lidar BEV")
            fig.savefig(os.path.join(render_dir, f"{name}_lidar.png"))
            plt.close(fig)
        return render_dir

    def kitti_res_to_nuscenes(self, result_root: str, out_json: str,
                              meta: dict | None = None) -> None:
        """Back-convert KITTI result label files to a nuScenes submission json
        (reference: nusc2kitti.py:383+ kitti_res_to_nuscenes)."""
        from ..kitti import annos as kitti_annos

        results = {}
        ids = sorted(int(f[:-4]) for f in os.listdir(result_root)
                     if f.endswith(".txt"))
        split_logs_samples = self._split_to_samples(
            _require_nusc()[5](self.split, self.nusc))
        for idx in ids:
            anno = kitti_annos.get_label_anno(
                os.path.join(result_root, "%06d.txt" % idx))
            token = split_logs_samples[idx][1]
            results[token] = [{
                "sample_token": token,
                "translation": anno["location"][k].tolist(),
                # anno dimensions are lhw; nuScenes submissions want wlh
                "size": anno["dimensions"][k][[2, 0, 1]].tolist(),
                "rotation_y": float(anno["rotation_y"][k]),
                "detection_name": str(anno["name"][k]).lower(),
                "detection_score": float(anno["score"][k]),
            } for k in range(len(anno["name"]))]
        with open(out_json, "w") as f:
            json.dump({"meta": meta or {"use_lidar": True},
                       "results": results}, f)


def nusc_to_kitti(raw_path: str, kitti_path: str,
                  nusc_version: str = "v1.0-trainval") -> None:
    """CLI-level entry (reference: convert/__init__.py)."""
    for split in ("train",):
        KittiConverter(dataroot=raw_path, nusc_kitti_dir=kitti_path,
                       nusc_version=nusc_version,
                       split=split).nuscenes_gt_to_kitti()
