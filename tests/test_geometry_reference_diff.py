"""Differential tests vs the REFERENCE's own geometry + label-parsing code.

Executes pointrcnn/lib/utils/kitti_utils.py and lib/utils/object3d.py with
the baked-in CPU torch + scipy (only the `torch.cuda.FloatTensor` factory in
boxes3d_to_corners3d_torch needs a CPU shim; `get_iou3d` needs shapely and is
excluded — the rotated-IoU leg is reference-diffed separately in
test_rotated_iou_reference_diff.py). Every numpy/jax geometry helper in
tpu3d.kitti.boxes / tpu3d.ops.box_geometry is fuzzed against the reference's
actual code, including the scipy-Delaunay `in_hull` that our analytic
point-in-rotated-box test replaces.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tpu3d.kitti import boxes as kboxes
from tpu3d.kitti import object3d as kobj
from tpu3d.ops import box_geometry as jgeo

REF_PRCNN = "/root/reference/pointrcnn"


@pytest.fixture(scope="module")
def ref_ku(request):
    """The reference's kitti_utils module, executed from source."""
    path = os.path.join(REF_PRCNN, "lib", "utils", "kitti_utils.py")
    if not os.path.isfile(path):
        pytest.skip("reference repo not available")
    # kitti_utils does `import lib.utils.object3d` (namespace package)
    sys.path.insert(0, REF_PRCNN)
    request.addfinalizer(lambda: sys.path.remove(REF_PRCNN))
    spec = importlib.util.spec_from_file_location("ref_kitti_utils", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # CPU shim for the torch.cuda.FloatTensor zeros/ones factories
    from _ref_shims import torch_cpu_shims

    shim = torch_cpu_shims(torch, cuda_method=False, float_tensor=True)
    shim.__enter__()
    request.addfinalizer(lambda: shim.__exit__(None, None, None))
    return mod


def _rand_boxes(rng, n):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(-30, 30, n)   # x
    boxes[:, 1] = rng.uniform(-1, 3, n)     # y (bottom face)
    boxes[:, 2] = rng.uniform(0, 70, n)     # z
    boxes[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))  # h, w, l
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)    # ry
    return boxes


def test_rotate_pc_along_y_matches_reference(ref_ku):
    rng = np.random.default_rng(0)
    pc = rng.normal(size=(128, 5)).astype(np.float32)
    angle = 0.73
    ref = ref_ku.rotate_pc_along_y(pc.copy(), angle)  # reference mutates
    got = kboxes.rotate_points_along_y(pc, angle)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    got_j = np.asarray(jgeo.rotate_points_along_y(jnp.asarray(pc), angle))
    np.testing.assert_allclose(got_j, ref, rtol=1e-5, atol=1e-5)


def test_rotate_pc_along_y_torch_batched_matches_reference(ref_ku):
    rng = np.random.default_rng(1)
    pc = rng.normal(size=(6, 32, 4)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 6).astype(np.float32)
    ref = ref_ku.rotate_pc_along_y_torch(
        torch.from_numpy(pc.copy()), torch.from_numpy(ang)).numpy()
    got = kboxes.rotate_points_along_y(pc, ang[:, None])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_corners_from_boxes3d_matches_reference(ref_ku):
    rng = np.random.default_rng(2)
    boxes = _rand_boxes(rng, 64)
    ref = ref_ku.boxes3d_to_corners3d(boxes)
    got = kboxes.corners_from_boxes3d(boxes)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    got_j = np.asarray(jgeo.corners_from_boxes3d(jnp.asarray(boxes)))
    np.testing.assert_allclose(got_j, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("flip", [False, True])
def test_corners3d_torch_variant_matches_ours(ref_ku, flip):
    """The torch corner builder (used by the reference's target assignment)
    agrees with ours once its flip=ry+pi convention is applied."""
    rng = np.random.default_rng(3)
    boxes = _rand_boxes(rng, 32)
    ref = ref_ku.boxes3d_to_corners3d_torch(
        torch.from_numpy(boxes.copy()), flip=flip).numpy()
    ours_in = boxes.copy()
    if flip:
        ours_in[:, 6] += np.pi
    got = kboxes.corners_from_boxes3d(ours_in)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_boxes3d_to_bev_matches_reference(ref_ku):
    rng = np.random.default_rng(4)
    boxes = _rand_boxes(rng, 64)
    ref = ref_ku.boxes3d_to_bev_torch(torch.from_numpy(boxes)).numpy()
    got = kboxes.boxes3d_to_bev(boxes)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_enlarge_box3d_matches_reference(ref_ku):
    rng = np.random.default_rng(5)
    boxes = _rand_boxes(rng, 64)
    ref = ref_ku.enlarge_box3d(boxes.copy(), 0.2)
    got = kboxes.enlarge_box3d(boxes, 0.2)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    got_j = np.asarray(jgeo.enlarge_box3d(jnp.asarray(boxes), 0.2))
    np.testing.assert_allclose(got_j, ref, rtol=1e-6, atol=1e-6)


def test_points_in_box_matches_reference_in_hull(ref_ku):
    """Our analytic point-in-rotated-box test vs the reference's
    scipy-Delaunay in_hull over the same corner set (kitti_utils.py:163-177).
    Random continuous points are never exactly on a face, so the two must
    agree everywhere."""
    rng = np.random.default_rng(6)
    boxes = _rand_boxes(rng, 8)
    corners = ref_ku.boxes3d_to_corners3d(boxes)
    pts = np.concatenate([
        rng.uniform([-35, -3, -5], [35, 6, 75], size=(512, 3)),
        # points concentrated around the boxes so plenty land inside
        boxes[rng.integers(0, 8, 256), 0:3]
        + rng.normal(scale=1.5, size=(256, 3)),
    ]).astype(np.float32)
    got = kboxes.points_in_boxes3d(pts, boxes)
    got_j = np.asarray(jgeo.points_in_boxes3d(jnp.asarray(pts),
                                              jnp.asarray(boxes)))
    n_inside = 0
    for i in range(boxes.shape[0]):
        ref = ref_ku.in_hull(pts, corners[i])
        np.testing.assert_array_equal(got[:, i], ref, err_msg=f"box {i}")
        np.testing.assert_array_equal(got_j[:, i], ref, err_msg=f"box {i} jax")
        n_inside += int(ref.sum())
    assert n_inside > 20  # the agreement is not vacuous


def test_dist_to_plane_matches_reference(ref_ku):
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(64, 3)).astype(np.float64)
    plane = (0.1, -0.98, 0.05, 1.65)
    ref = ref_ku.dist_to_plane(plane, pts)
    got = kboxes.dist_to_plane(plane, pts)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_object3d_parse_matches_reference(ref_ku):
    """Label-line parsing: every field the reference extracts, its difficulty
    level assignment, and the objs_to_boxes3d/objs_to_scores arrays."""
    import lib.utils.object3d as ref_obj

    lines = [
        "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59",
        "Car 0.20 1 1.85 387.63 181.54 423.81 203.12 1.67 1.87 3.69 -16.53 2.39 58.49 1.57",
        "Pedestrian 0.50 2 -2.52 1077.42 152.04 1126.90 277.09 1.89 0.48 1.20 3.51 1.70 14.75 -2.30",
        "Cyclist 0.00 3 -1.65 676.60 163.95 688.98 193.93 1.86 0.60 2.02 4.59 1.32 45.84 -1.55",
        "DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 -1000 -1000 -10",
        "Car 0.00 0 1.55 614.24 181.78 727.31 284.77 1.57 1.73 4.15 1.00 1.75 13.22 1.62 0.93",
    ]
    for line in lines:
        r = ref_obj.Object3d(line)
        o = kobj.Object3d(line)
        assert o.cls_type == r.cls_type
        assert o.cls_id == r.cls_id
        assert o.truncation == r.trucation  # reference's own field typo
        assert o.occlusion == r.occlusion
        assert o.alpha == r.alpha
        np.testing.assert_array_equal(o.box2d, r.box2d)
        assert (o.h, o.w, o.l) == (r.h, r.w, r.l)
        np.testing.assert_array_equal(o.pos, r.pos)
        assert o.ry == r.ry
        assert o.level == r.level
        assert o.level_str == r.level_str
        if o.score is not None:
            assert o.score == r.score
        else:
            assert r.score == -1.0  # reference encodes "no score" as -1

    refs = [ref_obj.Object3d(l) for l in lines]
    ours = [kobj.Object3d(l) for l in lines]
    np.testing.assert_array_equal(kobj.objs_to_boxes3d(ours),
                                  ref_ku.objs_to_boxes3d(refs))
