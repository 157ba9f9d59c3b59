"""Differential tests vs the REFERENCE's own statistical-normalization code.

Executes stat_norm/norm.py and stat_norm/stat.py from /root/reference (their
`config_path` import is replaced by an inert stub so no dataset directories
are touched) and drives the paper's core method — per-car anisotropic point
rescaling + label regeneration — on a synthetic scene through BOTH
implementations: get_scale_map/single_scale, rescale_ptc (plain,
avoid_conflict backoff, align_front), scale_labels -> refine ->
postprocessing, and stat.py's get_stats. The reference pipeline is
deterministic here, so outputs must agree to float tolerance.
"""

import copy
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from _ref_shims import modules_swapped

from tpu3d.kitti.calibration import Calibration
from tpu3d.kitti.object3d import Object3d
from tpu3d.stat_norm import norm as our_norm
from tpu3d.stat_norm import stat as our_stat

REF_ROOT = "/root/reference"

CALIB_TEXT = """P0: 707.0493 0.0 604.0814 0.0 0.0 707.0493 180.5066 0.0 0.0 0.0 1.0 0.0
P1: 707.0493 0.0 604.0814 -379.7842 0.0 707.0493 180.5066 0.0 0.0 0.0 1.0 0.0
P2: 707.0493 0.0 604.0814 45.75831 0.0 707.0493 180.5066 -0.3454157 0.0 0.0 1.0 0.004981016
P3: 707.0493 0.0 604.0814 -334.1081 0.0 707.0493 180.5066 2.33066 0.0 0.0 1.0 0.003201153
R0_rect: 0.9999128 0.01009263 -0.008511932 -0.01012729 0.9999406 -0.004037671 0.008470675 0.004123522 0.9999556
Tr_velo_to_cam: 0.006927964 -0.9999722 -0.002757829 -0.02457729 -0.001162982 0.002749836 -0.9999955 -0.06127237 0.9999753 0.006931141 -0.001143899 -0.3321029
Tr_imu_to_velo: 0.9999976 0.0007553071 -0.002035826 -0.8086759 -0.0007854027 0.9998898 -0.01482298 0.3195559 0.002024406 0.01482454 0.9998881 -0.7997231
"""

LABEL_LINES = [
    "Car 0.00 0 -1.58 0 0 0 0 1.53 1.63 3.88 -3.10 1.71 16.70 -1.59",
    "Car 0.10 1 1.85 0 0 0 0 1.49 1.72 4.10 4.53 1.89 28.49 1.57",
    "Van 0.00 0 0.40 0 0 0 0 2.05 1.90 5.10 -6.53 1.95 39.10 0.35",
    "Pedestrian 0.00 0 -0.20 0 0 0 0 1.80 0.50 0.90 1.51 1.70 11.75 -0.30",
]

SRC_STATS = {"height": {"mean": 1.526, "std": 0.14},
             "width": {"mean": 1.628, "std": 0.10},
             "length": {"mean": 3.884, "std": 0.43}}
DST_STATS = {"height": {"mean": 1.751, "std": 0.15},
             "width": {"mean": 1.934, "std": 0.12},
             "length": {"mean": 5.150, "std": 0.55}}

IMG_W, IMG_H = 1242, 375


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """(ref_norm, ref_stat, ref objects loader, calib paths) with stubs."""
    if not os.path.isdir(os.path.join(REF_ROOT, "stat_norm")):
        pytest.skip("reference repo not available")
    # norm.py/stat.py do `sys.path.insert(0, "..")` + `from config_path
    # import ...`; stub it so nothing outside the repo is created
    stub = types.ModuleType("config_path")
    stub.dataset_path = "/tmp/nonexistent_statnorm_root"
    stub.datasets = ["kitti"]
    stub.dataset_paths = {"kitti": "/tmp/nonexistent_statnorm_root"}
    stub.dataset_full_name = {"kitti": "KITTI"}
    stub.raw_path_dic = dict(stub.dataset_paths)
    # save/restore every module this fixture installs or imports (the
    # reference's top-level `utils` package would otherwise shadow any later
    # import of that very common name)
    swap = modules_swapped(config_path=stub, utils=None, **{
        "utils.object_3d": None, "utils.kitti_util": None})
    swap.__enter__()
    sys.modules["config_path"] = stub
    sys.path.insert(0, REF_ROOT)  # for `from utils.object_3d import ...`
    mods = {}
    for name in ("norm", "stat"):
        spec = importlib.util.spec_from_file_location(
            f"ref_statnorm_{name}", os.path.join(REF_ROOT, "stat_norm",
                                                 f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mods[name] = mod
    import utils.object_3d as ref_obj_mod
    import utils.kitti_util as ref_ku

    # norm.py:134 does `np.ones((h, w), dtype=np.uint8) * -1`, which 2019
    # numpy wrapped to 255 and numpy 2 rejects with OverflowError. Shim the
    # module's `np.ones` to build that canvas as int16: for < 255 objects the
    # paint-over/unique-count semantics are identical (background never
    # matches an object index either way)
    class _NpShim:
        def __init__(self, real):
            self._real = real

        def __getattr__(self, name):
            return getattr(self._real, name)

        def ones(self, shape, dtype=None, **kw):
            if dtype is np.uint8:
                dtype = np.int16
            return self._real.ones(shape, dtype=dtype, **kw)

    mods["norm"].np = _NpShim(np)

    calib_path = tmp_path_factory.mktemp("calib") / "000000.txt"
    calib_path.write_text(CALIB_TEXT)
    yield (mods["norm"], mods["stat"], ref_obj_mod, ref_ku, str(calib_path))
    sys.path.remove(REF_ROOT)
    swap.__exit__(None, None, None)


def _make_scene(our_calib):
    """(velo (N,4), rect pts) — clusters inside each car + background."""
    rng = np.random.default_rng(42)
    objs = [Object3d(l) for l in LABEL_LINES]
    rect_pts = [rng.uniform([-20, -0.5, 5], [20, 2.5, 60], size=(2048, 3))]
    for o in objs:
        if o.cls_type not in ("Car", "Van"):
            continue
        # box-frame samples strictly inside (x: l, y: [-h, 0], z: w)
        local = rng.uniform([-o.l / 2, -o.h, -o.w / 2], [o.l / 2, 0, o.w / 2],
                            size=(256, 3)) * 0.98
        c, s = np.cos(o.ry), np.sin(o.ry)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        rect_pts.append(local @ R.T + o.t)
    rect = np.concatenate(rect_pts)
    velo = np.concatenate(
        [our_calib.project_rect_to_velo(rect),
         rng.uniform(0, 1, size=(rect.shape[0], 1))], axis=1)
    return velo.astype(np.float64)


def test_single_scale_and_map_match(env):
    ref_norm, _, ref_obj_mod, _, _ = env
    o_ref = ref_obj_mod.Object3d(LABEL_LINES[0])
    o_our = Object3d(LABEL_LINES[0])
    for ratio in (0.0, 0.3, 1.0):
        ref_map = ref_norm.get_scale_map(SRC_STATS, DST_STATS)(o_ref, ratio)
        our_map = our_norm.get_scale_map(SRC_STATS, DST_STATS)(o_our, ratio)
        np.testing.assert_allclose(our_map, ref_map, rtol=1e-12)


@pytest.mark.parametrize("avoid_conflict,align_front",
                         [(False, False), (False, True), (True, False)])
def test_rescale_ptc_matches_reference(env, avoid_conflict, align_front):
    ref_norm, _, ref_obj_mod, ref_ku, calib_path = env
    our_calib = Calibration(calib_path)
    ref_calib = ref_ku.Calibration(calib_path)
    velo = _make_scene(our_calib)

    ref_objs = [ref_obj_mod.Object3d(l) for l in LABEL_LINES]
    our_objs = [Object3d(l) for l in LABEL_LINES]
    ref_map = ref_norm.get_scale_map(SRC_STATS, DST_STATS)
    our_map = our_norm.get_scale_map(SRC_STATS, DST_STATS)

    ref_out, ref_ratios = ref_norm.rescale_ptc(
        ref_map, velo.copy(), ref_objs, ref_calib,
        avoid_conflict=avoid_conflict, align_front=align_front)
    got_out, got_ratios = our_norm.rescale_ptc(
        our_map, velo.copy(), our_objs, our_calib,
        avoid_conflict=avoid_conflict, align_front=align_front)

    np.testing.assert_allclose(np.asarray(got_ratios),
                               np.asarray(ref_ratios), rtol=1e-12)
    assert got_out.shape == ref_out.shape
    np.testing.assert_allclose(got_out, ref_out, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align_front", [False, True])
def test_scale_labels_matches_reference(env, align_front):
    ref_norm, _, ref_obj_mod, ref_ku, calib_path = env
    our_calib = Calibration(calib_path)
    ref_calib = ref_ku.Calibration(calib_path)

    ref_objs = [ref_obj_mod.Object3d(l) for l in LABEL_LINES]
    our_objs = [Object3d(l) for l in LABEL_LINES]
    n_cars = sum(o.cls_type in ("Car", "Van") for o in ref_objs)
    ratios = [1.0, 0.7, 0.0][:n_cars]
    ref_map = ref_norm.get_scale_map(SRC_STATS, DST_STATS)
    our_map = our_norm.get_scale_map(SRC_STATS, DST_STATS)

    ref_new = ref_norm.scale_labels(copy.deepcopy(ref_objs), ref_map, ratios,
                                    ref_calib, IMG_W, IMG_H,
                                    align_front=align_front)
    got_new = our_norm.scale_labels(copy.deepcopy(our_objs), our_map, ratios,
                                    our_calib, IMG_W, IMG_H,
                                    align_front=align_front)
    assert len(got_new) == len(ref_new)
    for g, r in zip(got_new, ref_new):  # both depth-sorted by postprocessing
        assert g.cls_type == r.cls_type
        np.testing.assert_allclose((g.h, g.w, g.l), (r.h, r.w, r.l),
                                   rtol=1e-9)
        np.testing.assert_allclose(g.t, r.t, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(g.box2d, r.box2d, rtol=1e-6, atol=1e-4)
        # the reference stores the visibility tier in its `trucation` field
        # (norm.py:144); ours mirrors that into `truncation` by default
        assert g.truncation == r.trucation


def test_get_stats_matches_reference(env):
    _, ref_stat, _, _, _ = env
    rng = np.random.default_rng(3)
    data = rng.uniform(1.2, 2.2, size=500).tolist()
    ref = ref_stat.get_stats(data)
    got = our_stat.get_stats(data)
    np.testing.assert_allclose(
        [got["mean"], got["std"]], [ref["mean"], ref["std"]], rtol=1e-12)
