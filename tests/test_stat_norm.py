"""stat_norm tests: stats caching + end-to-end rescaling on a synthetic dataset."""

import json
import os

import numpy as np
import pytest

from tpu3d.kitti import Calibration, load_velo_scan, read_label
from tpu3d.kitti.boxes import points_in_boxes3d
from tpu3d.kitti.object3d import objs_to_boxes3d
from tpu3d.stat_norm import convert, get_dataset_stats, get_scale_map, rescale_ptc

CALIB = """P2: 707.0493 0 604.0814 0 0 707.0493 180.5066 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
"""


def _label_line(cls, x, y, z, h, w, l, ry, occ=0):
    return (f"{cls} 0.00 {occ} 0.00 500.00 150.00 600.00 250.00 "
            f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}")


def _make_dataset(root, car_dims=(1.5, 1.6, 3.9), n_frames=3, seed=0):
    """KITTI-format dir with cars containing synthetic interior points."""
    rng = np.random.default_rng(seed)
    os.makedirs(root / "training" / "velodyne", exist_ok=True)
    os.makedirs(root / "training" / "label_2", exist_ok=True)
    os.makedirs(root / "training" / "calib", exist_ok=True)
    names = ["%06d" % i for i in range(n_frames)]
    for split in ("train", "val", "trainval"):
        (root / f"{split}.txt").write_text("\n".join(names))
    h, w, l = car_dims
    calib_obj = None
    for i, name in enumerate(names):
        (root / "training" / "calib" / f"{name}.txt").write_text(CALIB)
        calib_obj = Calibration(str(root / "training" / "calib" / f"{name}.txt"))
        # two cars per frame at different spots + background points
        cars = [(-2.0, 1.6, 10.0 + i, 0.3), (3.0, 1.6, 25.0 + i, -1.2)]
        lines = [_label_line("Car", *c[:3], h, w, l, c[3]) for c in cars]
        lines.append(_label_line("DontCare", 0, 0, 5, 1, 1, 1, 0))
        (root / "training" / "label_2" / f"{name}.txt").write_text(
            "\n".join(lines))
        pts_rect = [rng.uniform([-20, -1, 3], [20, 2.5, 60], size=(400, 3))]
        for cx, cy, cz, ry in cars:
            # interior points in the box frame (strictly inside)
            local = rng.uniform([-l / 2 * 0.9, -h * 0.9, -w / 2 * 0.9],
                                [l / 2 * 0.9, -h * 0.1, w / 2 * 0.9],
                                size=(100, 3))
            c, s = np.cos(ry), np.sin(ry)
            world = np.stack([c * local[:, 0] + s * local[:, 2],
                              local[:, 1] + cy,
                              -s * local[:, 0] + c * local[:, 2] + 0 * cz],
                             axis=1)
            world[:, 0] += cx
            world[:, 2] += cz
            pts_rect.append(world)
        pts_rect = np.concatenate(pts_rect)
        velo = calib_obj.project_rect_to_velo(pts_rect).astype(np.float32)
        scan = np.concatenate(
            [velo, np.ones((len(velo), 1), np.float32)], axis=1)
        scan.tofile(root / "training" / "velodyne" / f"{name}.bin")
    return names, calib_obj


def test_get_dataset_stats(tmp_path):
    _make_dataset(tmp_path, car_dims=(1.5, 1.6, 3.9))
    stats = get_dataset_stats(str(tmp_path), "train")
    assert stats["height"]["mean"] == pytest.approx(1.5, abs=1e-6)
    assert stats["width"]["mean"] == pytest.approx(1.6, abs=1e-6)
    assert stats["length"]["mean"] == pytest.approx(3.9, abs=1e-6)
    assert stats["length"]["std"] == pytest.approx(0.0, abs=1e-6)
    # cache file written and reused
    assert (tmp_path / "label_stats_train.json").exists()
    stats2 = get_dataset_stats(str(tmp_path), "train")
    assert stats2 == stats


def test_rescale_ptc_scales_interior_points(tmp_path):
    names, calib = _make_dataset(tmp_path)
    velo = load_velo_scan(str(tmp_path / "training" / "velodyne"
                              / f"{names[0]}.bin"))
    labels = [o for o in read_label(str(tmp_path / "training" / "label_2"
                                        / f"{names[0]}.txt"))
              if o.cls_type != "DontCare"]
    src = {"length": {"mean": 3.9}, "height": {"mean": 1.5},
           "width": {"mean": 1.6}}
    dst = {"length": {"mean": 4.9}, "height": {"mean": 1.8},
           "width": {"mean": 1.9}}
    mapping = get_scale_map(src, dst)
    new_velo, ratios = rescale_ptc(mapping, velo, labels, calib)
    assert ratios == [1.0, 1.0]
    assert len(new_velo) == len(velo)  # no overlap -> counts preserved
    # interior points now fill the scaled boxes
    new_rect = calib.project_velo_to_rect(new_velo[:, :3])
    boxes = objs_to_boxes3d(labels)
    scaled_boxes = boxes.copy()
    scaled_boxes[:, 3] += 0.3  # h
    scaled_boxes[:, 4] += 0.3  # w
    scaled_boxes[:, 5] += 1.0  # l
    inside_scaled = points_in_boxes3d(new_rect, scaled_boxes)
    assert inside_scaled[:, 0].sum() >= 100 and inside_scaled[:, 1].sum() >= 100
    # a patch point scaled beyond the ORIGINAL box bound exists (length grew)
    inside_orig = points_in_boxes3d(new_rect, boxes)
    assert inside_orig.sum() < inside_scaled.sum()


def test_convert_end_to_end(tmp_path):
    src_root = tmp_path / "kittiA"
    dst_root = tmp_path / "kittiB"
    _make_dataset(src_root, car_dims=(1.5, 1.6, 3.9))
    _make_dataset(dst_root, car_dims=(1.8, 1.9, 4.9), seed=1)
    get_dataset_stats(str(src_root), "train")
    get_dataset_stats(str(dst_root), "train")
    out = convert("kitti", "waymo", spath=str(src_root),
                  dpath=str(tmp_path / "rescaled"), image_size=(1242, 375),
                  dst_stats_path=str(dst_root))
    out_root = tmp_path / "rescaled" / "kitti_scaledto_waymo"
    assert (out_root / "train.txt").exists()
    assert (out_root / "training" / "image_2").is_symlink()
    # rescaled labels carry dst-size cars
    objs = read_label(str(out_root / "training" / "label_2" / "000000.txt"))
    cars = [o for o in objs if o.cls_type == "Car"]
    assert len(cars) == 2
    for o in cars:
        assert o.l == pytest.approx(4.9, abs=0.01)
        assert o.h == pytest.approx(1.8, abs=0.01)
        assert o.w == pytest.approx(1.9, abs=0.01)
    # DontCare dropped
    assert all(o.cls_type != "DontCare" for o in objs)
    # velodyne written with reflectance 1.0, point count preserved
    scan = load_velo_scan(str(out_root / "training" / "velodyne" / "000000.bin"))
    assert scan.shape == (600, 4)
    np.testing.assert_allclose(scan[:, 3], 1.0)
    # rescaled points sit inside the rescaled boxes
    calib = Calibration(str(out_root / "training" / "calib" / "000000.txt"))
    rect = calib.project_velo_to_rect(scan[:, :3])
    inside = points_in_boxes3d(rect, objs_to_boxes3d(cars))
    assert inside[:, 0].sum() >= 99 and inside[:, 1].sum() >= 99
    # 2D boxes regenerated (not the original 500..600 template)
    assert not np.allclose(cars[0].box2d, [500, 150, 600, 250])


def test_avoid_conflict_backs_off(tmp_path):
    """A wall of env points right next to the car forces ratio < 1."""
    rng = np.random.default_rng(3)
    calib_file = tmp_path / "c.txt"
    calib_file.write_text(CALIB)
    calib = Calibration(str(calib_file))
    from tpu3d.kitti.object3d import Object3d

    obj = Object3d(_label_line("Car", 0.0, 1.6, 10.0, 1.5, 1.6, 3.9, 0.0))
    interior = rng.uniform([-1.9, 0.25, -0.75], [1.9, 1.55, 0.75], (200, 3))
    interior_rect = np.stack([interior[:, 0], 1.6 - interior[:, 1],
                              interior[:, 2] + 10.0], axis=1)
    # dense wall hugging the +x face of the box, at mid-height (y < -0.5 rel)
    wall = rng.uniform([2.0, 0.6, -0.8], [2.2, 1.5, 0.8], (500, 3))
    wall_rect = np.stack([wall[:, 0], 1.6 - wall[:, 1], wall[:, 2] + 10.0],
                         axis=1)
    rect = np.concatenate([interior_rect, wall_rect])
    velo = np.concatenate(
        [calib.project_rect_to_velo(rect),
         np.ones((len(rect), 1))], axis=1).astype(np.float32)
    src = {"length": {"mean": 3.9}, "height": {"mean": 1.5},
           "width": {"mean": 1.6}}
    dst = {"length": {"mean": 5.9}, "height": {"mean": 1.5},
           "width": {"mean": 1.6}}
    mapping = get_scale_map(src, dst)
    _, ratios_free = rescale_ptc(mapping, velo, [obj], calib,
                                 avoid_conflict=False)
    _, ratios_safe = rescale_ptc(mapping, velo, [obj], calib,
                                 avoid_conflict=True)
    assert ratios_free == [1.0]
    assert ratios_safe[0] < 1.0
