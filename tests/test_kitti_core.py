"""Golden tests for the KITTI data model (tpu3d.kitti)."""

import math

import numpy as np
import pytest

from tpu3d.kitti import (
    Calibration,
    Object3d,
    annos,
    boxes3d_to_bev,
    corners_from_boxes3d,
    enlarge_box3d,
    get_level,
    inverse_rigid_trans,
    objs_to_boxes3d,
    points_in_boxes3d,
    read_label,
    rotate_points_along_y,
)

LABEL_LINE = (
    "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59"
)
LABEL_LINE_SCORE = LABEL_LINE + " 0.9741"


def test_object3d_parse_roundtrip():
    obj = Object3d(LABEL_LINE)
    assert obj.cls_type == "Car" and obj.cls_id == 1
    assert obj.h == 1.65 and obj.w == 1.67 and obj.l == 3.64
    np.testing.assert_allclose(obj.t, [-0.65, 1.71, 46.70], rtol=1e-6)
    assert obj.ry == -1.59
    assert obj.score is None
    # round-trip formatting is bit-compatible
    assert obj.to_kitti_format() == LABEL_LINE

    obj2 = Object3d(LABEL_LINE_SCORE)
    assert obj2.score == pytest.approx(0.9741)
    assert obj2.to_kitti_format() == LABEL_LINE + " 0.97"


def test_difficulty_levels():
    # height = y2 - y1 + 1
    assert get_level(41, 0.10, 0) == 1  # Easy
    assert get_level(30, 0.10, 1) == 2  # Moderate
    assert get_level(26, 0.45, 2) == 3  # Hard
    assert get_level(20, 0.0, 0) == 4  # Unknown
    obj = Object3d(LABEL_LINE)  # height = 200.12-173.33+1 = 27.79, trunc 0, occ 0
    assert obj.level == 2


def test_corners_identity_rotation():
    # Box at origin, ry=0: corners should be +-l/2 in x, +-w/2 in z, y in {0,-h}
    box = np.array([[0, 0, 0, 2.0, 1.0, 4.0, 0.0]], dtype=np.float32)
    corners = corners_from_boxes3d(box)[0]
    np.testing.assert_allclose(corners[0], [2.0, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(corners[1], [2.0, 0.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(corners[2], [-2.0, 0.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(corners[3], [-2.0, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(corners[4], [2.0, -2.0, 0.5], atol=1e-6)


def test_corners_match_object3d():
    obj = Object3d(LABEL_LINE)
    corners = obj.generate_corners3d()
    # replicate the reference formula directly (utils/object_3d.py:58-76)
    l, h, w, ry = obj.l, obj.h, obj.w, obj.ry
    x_c = np.array([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2])
    y_c = np.array([0, 0, 0, 0, -h, -h, -h, -h])
    z_c = np.array([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2])
    R = np.array(
        [
            [np.cos(ry), 0, np.sin(ry)],
            [0, 1, 0],
            [-np.sin(ry), 0, np.cos(ry)],
        ]
    )
    expected = (R @ np.vstack([x_c, y_c, z_c])).T + obj.t
    np.testing.assert_allclose(corners, expected, atol=1e-5)


def test_rotate_points_inverse_of_corner_rotation():
    # rotate_points_along_y(pts - center, ry) must map corners to the box frame
    rng = np.random.default_rng(0)
    box = np.array([[1.5, 0.5, 10.0, 1.5, 1.6, 3.9, 0.7]], dtype=np.float32)
    corners = corners_from_boxes3d(box)[0]
    local = rotate_points_along_y(corners - box[0, :3], box[0, 6])
    np.testing.assert_allclose(local[0], [3.9 / 2, 0, 1.6 / 2], atol=1e-5)
    np.testing.assert_allclose(local[2], [-3.9 / 2, 0, -1.6 / 2], atol=1e-5)
    # rotating by -ry undoes rotating by +ry
    pts = rng.normal(size=(32, 3)).astype(np.float32)
    back = rotate_points_along_y(rotate_points_along_y(pts, 0.7), -0.7)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_points_in_boxes3d():
    box = np.array([[0, 0, 0, 2.0, 1.0, 4.0, math.pi / 2]], dtype=np.float32)
    # after ry=pi/2 rotation the length axis lies along z
    pts = np.array(
        [
            [0.0, -0.5, 0.0],   # center-ish -> in
            [0.45, -0.5, 1.9],  # within w/2=0.5 (x) and l/2=2 (z) -> in
            [0.55, -0.5, 0.0],  # outside w/2 -> out
            [0.0, 0.5, 0.0],    # below bottom face (y>y_c) -> out
            [0.0, -2.5, 0.0],   # above top face -> out
            [0.0, -0.5, 2.2],   # outside l/2 -> out
        ],
        dtype=np.float32,
    )
    mask = points_in_boxes3d(pts, box)[:, 0]
    np.testing.assert_array_equal(mask, [True, True, False, False, False, False])


def test_enlarge_and_bev():
    box = np.array([[1.0, 2.0, 3.0, 1.5, 1.6, 3.9, 0.3]], dtype=np.float32)
    large = enlarge_box3d(box, 0.2)
    np.testing.assert_allclose(large[0, 3:6], [1.9, 2.0, 4.3], atol=1e-6)
    assert large[0, 1] == pytest.approx(2.2)
    bev = boxes3d_to_bev(box)
    np.testing.assert_allclose(bev[0], [1.0 - 1.95, 3.0 - 0.8, 1.0 + 1.95, 3.0 + 0.8, 0.3], atol=1e-6)


KITTI_CALIB = """P0: 707.0493 0 604.0814 0 0 707.0493 180.5066 0 0 0 1 0
P1: 707.0493 0 604.0814 -379.7842 0 707.0493 180.5066 0 0 0 1 0
P2: 707.0493 0 604.0814 45.75831 0 707.0493 180.5066 -0.3454157 0 0 1 0.004981016
P3: 707.0493 0 604.0814 -334.1081 0 707.0493 180.5066 2.33966 0 0 1 0.003201153
R0_rect: 0.9999128 0.01009263 -0.008511932 -0.01012729 0.9999406 -0.004037671 0.008470675 0.004080907 0.9999558
Tr_velo_to_cam: 0.006927964 -0.9999722 -0.002757829 -0.02457729 -0.001162982 0.002749836 -0.9999955 -0.06127237 0.9999753 0.006931141 -0.001143899 -0.3321029
Tr_imu_to_velo: 0.9999976 0.0007553071 -0.002035826 -0.8086759 -0.0007854027 0.9998898 -0.01482298 0.3195559 0.002024406 0.01482454 0.9998881 -0.7997231
"""


def test_calibration_projections(tmp_path):
    calib_file = tmp_path / "000000.txt"
    calib_file.write_text(KITTI_CALIB)
    calib = Calibration(str(calib_file))
    assert calib.f_u == pytest.approx(707.0493)
    # velo->rect->velo roundtrip
    rng = np.random.default_rng(1)
    pts = rng.uniform(-20, 20, size=(64, 3))
    pts[:, 0] = np.abs(pts[:, 0]) + 5  # in front
    rect = calib.project_velo_to_rect(pts)
    back = calib.project_rect_to_velo(rect)
    np.testing.assert_allclose(back, pts, atol=1e-9)
    # image projection roundtrip through depth
    uv = calib.project_rect_to_image(rect)
    uvd = np.concatenate([uv, rect[:, 2:3]], axis=1)
    # project_image_to_rect uses the b_x/b_y first-order approx of the reference
    # (kitti_util.py:234-246) — exact only when P2[0:2,3] corrections are linear
    rect_back = calib.project_image_to_rect(uvd)
    np.testing.assert_allclose(rect_back[:, 2], rect[:, 2], atol=1e-9)
    np.testing.assert_allclose(rect_back[:, 0:2], rect[:, 0:2], atol=0.05)
    # rect_to_img depth correction recovers the true rect depth
    _, depth = calib.rect_to_img(rect)
    np.testing.assert_allclose(depth, rect[:, 2], atol=1e-9)
    # inverse rigid transform identity
    tr = calib.V2C
    eye = np.eye(3)
    composed = tr[:, :3] @ inverse_rigid_trans(tr)[:, :3]
    np.testing.assert_allclose(composed, eye, atol=1e-9)
    # calib file round trip
    out = tmp_path / "rt.txt"
    calib.write_calib_file(str(out))
    calib2 = Calibration(str(out))
    np.testing.assert_allclose(calib2.P, calib.P, rtol=1e-12)
    np.testing.assert_allclose(calib2.V2C, calib.V2C, rtol=1e-12)


def test_corners3d_to_img_boxes(tmp_path):
    calib_file = tmp_path / "c.txt"
    calib_file.write_text(KITTI_CALIB)
    calib = Calibration(str(calib_file))
    box = np.array([[0.0, 1.7, 20.0, 1.5, 1.6, 3.9, 0.5]], dtype=np.float32)
    corners = corners_from_boxes3d(box)
    boxes2d, boxes_corner = calib.corners3d_to_img_boxes(corners)
    assert boxes2d.shape == (1, 4) and boxes_corner.shape == (1, 8, 2)
    assert boxes2d[0, 0] < boxes2d[0, 2] and boxes2d[0, 1] < boxes2d[0, 3]
    # manual projection of corner 0
    uv = calib.project_rect_to_image(corners[0])
    np.testing.assert_allclose(boxes2d[0, 0], uv[:, 0].min(), atol=1e-6)


def test_anno_dict_roundtrip(tmp_path):
    label = tmp_path / "000000.txt"
    label.write_text(LABEL_LINE_SCORE + "\n")
    anno = annos.get_label_anno(str(label))
    assert anno["name"][0] == "Car"
    # dimensions stored lhw
    np.testing.assert_allclose(anno["dimensions"][0], [3.64, 1.65, 1.67])
    assert anno["score"][0] == pytest.approx(0.9741)
    annos.add_difficulty_to_annos_dict(anno)
    assert anno["difficulty"][0] == 1  # height 26.79 (no +1 in anno path) -> moderate
    out = tmp_path / "out.txt"
    annos.to_kitti_format(anno, str(out))
    reparsed = annos.get_label_anno(str(out))
    np.testing.assert_allclose(reparsed["dimensions"], anno["dimensions"], atol=1e-2)
    np.testing.assert_allclose(reparsed["location"], anno["location"], atol=1e-2)


def test_kitti_result_line():
    line = annos.kitti_result_line(
        {
            "name": "Car",
            "alpha": -1.5,
            "bbox": [500.0, 150.0, 600.0, 200.0],
            "dimensions": [3.9, 1.5, 1.6],  # lhw
            "location": [1.0, 1.7, 20.0],
            "rotation_y": 0.5,
            "score": 0.9,
        }
    )
    parts = line.split(" ")
    assert parts[0] == "Car"
    assert parts[1] == "-1" and parts[2] == "-1"  # defaults
    assert parts[3] == "-1.5000"
    assert len(parts) == 16


def test_iou_2d():
    a = np.array([[0, 0, 10, 10]], dtype=np.float64)
    b = np.array([[5, 5, 15, 15], [20, 20, 30, 30]], dtype=np.float64)
    got = annos.iou_2d(a, b)
    assert got[0, 0] == pytest.approx(25.0 / 175.0)
    assert got[0, 1] == 0.0


def test_objs_to_boxes3d_and_read_label(tmp_path):
    label = tmp_path / "l.txt"
    label.write_text(LABEL_LINE + "\n" + LABEL_LINE_SCORE + "\n")
    objs = read_label(str(label))
    assert len(objs) == 2
    boxes = objs_to_boxes3d(objs)
    assert boxes.shape == (2, 7)
    np.testing.assert_allclose(boxes[0], [-0.65, 1.71, 46.70, 1.65, 1.67, 3.64, -1.59], atol=1e-5)
