"""Differential test vs the REFERENCE's own calibration code (pure numpy).

Executes pointrcnn/lib/utils/calibration.py from source against a synthetic
KITTI calib file (realistic P2/P3/R0/Tr_velo_to_cam values) and compares
every projection our tpu3d.kitti.Calibration implements: velo->rect,
rect->img (incl. the P2[2,3] homogeneous depth correction), img->rect,
corners->2D boxes, and the distance-based camera_dis_to_rect (used by the
pseudo-lidar workflows).
"""

import importlib.util
import os

import numpy as np
import pytest

from tpu3d.kitti.calibration import Calibration

REF_CALIB = "/root/reference/pointrcnn/lib/utils/calibration.py"

CALIB_TEXT = """P0: 707.0493 0.0 604.0814 0.0 0.0 707.0493 180.5066 0.0 0.0 0.0 1.0 0.0
P1: 707.0493 0.0 604.0814 -379.7842 0.0 707.0493 180.5066 0.0 0.0 0.0 1.0 0.0
P2: 707.0493 0.0 604.0814 45.75831 0.0 707.0493 180.5066 -0.3454157 0.0 0.0 1.0 0.004981016
P3: 707.0493 0.0 604.0814 -334.1081 0.0 707.0493 180.5066 2.33066 0.0 0.0 1.0 0.003201153
R0_rect: 0.9999128 0.01009263 -0.008511932 -0.01012729 0.9999406 -0.004037671 0.008470675 0.004123522 0.9999556
Tr_velo_to_cam: 0.006927964 -0.9999722 -0.002757829 -0.02457729 -0.001162982 0.002749836 -0.9999955 -0.06127237 0.9999753 0.006931141 -0.001143899 -0.3321029
Tr_imu_to_velo: 0.9999976 0.0007553071 -0.002035826 -0.8086759 -0.0007854027 0.9998898 -0.01482298 0.3195559 0.002024406 0.01482454 0.9998881 -0.7997231
"""


@pytest.fixture(scope="module")
def calibs(tmp_path_factory):
    if not os.path.isfile(REF_CALIB):
        pytest.skip("reference repo not available")
    path = tmp_path_factory.mktemp("calib") / "000000.txt"
    path.write_text(CALIB_TEXT)
    spec = importlib.util.spec_from_file_location("ref_calibration", REF_CALIB)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.Calibration(str(path)), Calibration(str(path))


def test_calib_matrices_match(calibs):
    ref, ours = calibs
    np.testing.assert_allclose(np.asarray(ours.P2, np.float32), ref.P2,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.R0, np.float32), ref.R0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.V2C, np.float32),
                               ref.V2C, rtol=1e-6)
    for a, b in ((ours.c_u, ref.cu), (ours.c_v, ref.cv), (ours.f_u, ref.fu),
                 (ours.f_v, ref.fv), (ours.b_x, ref.tx), (ours.b_y, ref.ty)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_velo_to_rect_and_img_match(calibs):
    ref, ours = calibs
    rng = np.random.default_rng(0)
    # velodyne x (forward) >= 2 m: points at/behind the camera plane make the
    # u = fx/z projection ill-conditioned and amplify the reference's f32
    # matrix parsing vs our f64 into pixel-scale noise
    pts_velo = rng.uniform([2, -40, -2], [70, 40, 2], size=(256, 3))
    ref_rect = ref.lidar_to_rect(pts_velo)
    got_rect = ours.project_velo_to_rect(pts_velo)
    np.testing.assert_allclose(got_rect, ref_rect, rtol=1e-5, atol=1e-5)

    # identical (f64) rect input to both, so this leg tests only rect->img
    ref_img, ref_depth = ref.rect_to_img(ref_rect)
    got_img, got_depth = ours.rect_to_img(ref_rect)
    np.testing.assert_allclose(got_img, ref_img, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(got_depth, ref_depth, rtol=1e-5, atol=1e-5)

    ref_li, ref_ld = ref.lidar_to_img(pts_velo)
    got_li, got_ld = ours.rect_to_img(ours.project_velo_to_rect(pts_velo))
    np.testing.assert_allclose(got_li, ref_li, rtol=1e-4, atol=2e-2)
    np.testing.assert_allclose(got_ld, ref_ld, rtol=1e-5, atol=1e-5)


def test_img_to_rect_matches(calibs):
    ref, ours = calibs
    rng = np.random.default_rng(1)
    u = rng.uniform(0, 1200, 128)
    v = rng.uniform(0, 370, 128)
    depth = rng.uniform(1, 70, 128)
    np.testing.assert_allclose(ours.img_to_rect(u, v, depth),
                               ref.img_to_rect(u, v, depth),
                               rtol=1e-6, atol=1e-6)


def test_corners3d_to_img_boxes_matches(calibs):
    ref, ours = calibs
    rng = np.random.default_rng(2)
    corners = rng.uniform([-20, -2, 5], [20, 3, 70], size=(32, 8, 3))
    ref_boxes, ref_corners = ref.corners3d_to_img_boxes(corners)
    got_boxes, got_corners = ours.corners3d_to_img_boxes(corners)
    np.testing.assert_allclose(got_boxes, ref_boxes, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got_corners, ref_corners, rtol=1e-5, atol=1e-4)


def test_camera_dis_to_rect_matches(calibs):
    ref, ours = calibs
    rng = np.random.default_rng(3)
    u = rng.uniform(200, 1000, 64)
    v = rng.uniform(50, 350, 64)
    d = rng.uniform(5, 70, 64)
    np.testing.assert_allclose(ours.camera_dis_to_rect(u, v, d),
                               ref.camera_dis_to_rect(u, v, d),
                               rtol=1e-6, atol=1e-6)
