"""Differential tests: tpu3d.evaluate vs the REFERENCE's own evaluator code.

The reference matcher (/root/reference/evaluate/eval2.py) is numba-jitted but
algorithmically pure python; executing it with numba stubbed to identity
decorators gives the exact reference semantics on CPU (VERDICT round-1 item 3).
Covered: get_thresholds, image_box_overlap, the greedy compute_statistics_jit
matcher across compute_fp/AOS/dontcare/ignored combinations, the 3D-overlap
kernel, and full metric-0 eval_class → mAP.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_EVAL2 = "/root/reference/evaluate/eval2.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF_EVAL2):
        pytest.skip("reference repo not available")

    def _jit(*args, **kwargs):
        if args and callable(args[0]) and len(args) == 1 and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    numba_stub = types.ModuleType("numba")
    numba_stub.jit = _jit
    numba_stub.njit = _jit
    numba_stub.prange = range
    cuda_stub = types.ModuleType("numba.cuda")
    cuda_stub.jit = _jit
    numba_stub.cuda = cuda_stub

    saved = {k: sys.modules.get(k) for k in ("numba", "numba.cuda")}
    sys.modules["numba"] = numba_stub
    sys.modules["numba.cuda"] = cuda_stub
    sys.path.insert(0, os.path.dirname(REF_EVAL2))
    try:
        spec = importlib.util.spec_from_file_location("ref_eval2", REF_EVAL2)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(os.path.dirname(REF_EVAL2))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _random_annos(rng, n_images, with_dontcare=True):
    """Random KITTI-style (gt, dt) anno dicts for full-eval comparison."""
    names = np.array(["Car", "Van", "Pedestrian", "DontCare"])
    gt_annos, dt_annos = [], []
    for _ in range(n_images):
        n_gt = int(rng.integers(1, 8))
        n_dt = int(rng.integers(0, 10))
        gx = rng.uniform(0, 1100, (n_gt, 1))
        gy = rng.uniform(0, 300, (n_gt, 1))
        gw = rng.uniform(20, 200, (n_gt, 1))
        gh = rng.uniform(15, 80, (n_gt, 1))
        gt_bbox = np.concatenate([gx, gy, gx + gw, gy + gh], axis=1)
        name_idx = rng.integers(0, 4 if with_dontcare else 3, n_gt)
        gt = {
            "name": names[name_idx],
            "truncated": rng.uniform(0, 0.6, n_gt),
            "occluded": rng.integers(0, 4, n_gt).astype(np.int64),
            "alpha": rng.uniform(-np.pi, np.pi, n_gt),
            "bbox": gt_bbox,
            "dimensions": rng.uniform(1, 4, (n_gt, 3)),
            "location": np.concatenate(
                [rng.uniform(-20, 20, (n_gt, 1)),
                 rng.uniform(0, 3, (n_gt, 1)),
                 rng.uniform(1, 69, (n_gt, 1))], axis=1),
            "rotation_y": rng.uniform(-np.pi, np.pi, n_gt),
        }
        # detections: jittered copies of gts + random spurious boxes
        base = gt_bbox[rng.integers(0, n_gt, n_dt)]
        dt_bbox = base + rng.normal(0, 15, (n_dt, 4))
        dt_bbox[:, 2] = np.maximum(dt_bbox[:, 2], dt_bbox[:, 0] + 5)
        dt_bbox[:, 3] = np.maximum(dt_bbox[:, 3], dt_bbox[:, 1] + 5)
        dt = {
            "name": names[rng.integers(0, 3, n_dt)],
            "truncated": np.full(n_dt, -1.0),
            "occluded": np.full(n_dt, -1, np.int64),
            "alpha": rng.uniform(-np.pi, np.pi, n_dt),
            "bbox": dt_bbox,
            "dimensions": rng.uniform(1, 4, (n_dt, 3)),
            "location": np.concatenate(
                [rng.uniform(-20, 20, (n_dt, 1)),
                 rng.uniform(0, 3, (n_dt, 1)),
                 rng.uniform(1, 69, (n_dt, 1))], axis=1),
            "rotation_y": rng.uniform(-np.pi, np.pi, n_dt),
            "score": rng.uniform(0, 1, n_dt),
        }
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


def test_get_thresholds_matches_reference(ref, rng):
    from tpu3d.evaluate.ap import get_thresholds

    for _ in range(200):
        n = int(rng.integers(0, 60))
        scores = rng.uniform(0, 1, n)
        num_gt = int(rng.integers(max(n, 1), n + 30))
        ours = get_thresholds(scores.copy(), num_gt)
        theirs = ref.get_thresholds(scores.copy(), num_gt)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))


def test_image_box_overlap_matches_reference(ref, rng):
    from tpu3d.evaluate.overlaps import image_box_overlap

    for criterion in (-1, 0, 1):
        boxes = rng.uniform(0, 100, (40, 4))
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(0, 60, (40, 2))
        qboxes = rng.uniform(0, 100, (25, 4))
        qboxes[:, 2:] = qboxes[:, :2] + rng.uniform(0, 60, (25, 2))
        ours = image_box_overlap(boxes, qboxes, criterion)
        theirs = ref.image_box_overlap(boxes.copy(), qboxes.copy(), criterion)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_greedy_matcher_matches_reference(ref, rng):
    """Fuzz compute_statistics vs compute_statistics_jit: identical random
    overlap matrices, scores, ignored codes, dontcare boxes, both matcher modes,
    AOS on/off — tp/fp/fn/similarity/thresholds must be bit-equal."""
    from tpu3d.evaluate.ap import compute_statistics

    for trial in range(300):
        n_gt = int(rng.integers(0, 12))
        n_dt = int(rng.integers(0, 15))
        overlaps = rng.uniform(0, 1, (n_dt, n_gt))
        gt_datas = np.concatenate(
            [rng.uniform(0, 300, (n_gt, 4)),
             rng.uniform(-np.pi, np.pi, (n_gt, 1))], axis=1)
        dt_bbox = rng.uniform(0, 300, (n_dt, 2))
        dt_bbox = np.concatenate(
            [dt_bbox, dt_bbox + rng.uniform(5, 80, (n_dt, 2))], axis=1)
        dt_datas = np.concatenate(
            [dt_bbox, rng.uniform(-np.pi, np.pi, (n_dt, 1)),
             rng.uniform(0, 1, (n_dt, 1))], axis=1)
        ignored_gt = rng.choice([-1, 0, 1], n_gt).astype(np.int64)
        ignored_det = rng.choice([-1, 0, 1], n_dt).astype(np.int64)
        n_dc = int(rng.integers(0, 3))
        dc = rng.uniform(0, 250, (n_dc, 2))
        dc_bboxes = np.concatenate([dc, dc + rng.uniform(20, 120, (n_dc, 2))],
                                   axis=1)
        metric = 0
        min_overlap = float(rng.choice([0.3, 0.5, 0.7]))
        compute_fp = bool(trial % 2)
        compute_aos = bool((trial // 2) % 2) and compute_fp
        thresh = float(rng.uniform(0, 1)) if compute_fp else 0.0

        ours = compute_statistics(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes,
            metric, min_overlap, thresh=thresh, compute_fp=compute_fp,
            compute_aos=compute_aos)
        theirs = ref.compute_statistics_jit(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes,
            metric, min_overlap, thresh=thresh, compute_fp=compute_fp,
            compute_aos=compute_aos)
        assert ours[0] == theirs[0], f"tp trial {trial}"
        assert ours[1] == theirs[1], f"fp trial {trial}"
        assert ours[2] == theirs[2], f"fn trial {trial}"
        np.testing.assert_allclose(ours[3], theirs[3], rtol=1e-12,
                                   err_msg=f"similarity trial {trial}")
        np.testing.assert_array_equal(np.sort(np.asarray(ours[4])),
                                      np.sort(np.asarray(theirs[4])),
                                      err_msg=f"thresholds trial {trial}")


def test_d3_overlap_kernel_matches_reference(ref, rng):
    """The height-overlap × BEV-intersection fusion (eval2.py:136-163) vs the
    tail of our 3D overlap path, driven with the same rinc input."""
    from tpu3d.evaluate.overlaps import d3_box_overlap_from_rinc

    n, k = 20, 15
    boxes = np.concatenate([
        rng.uniform(-20, 20, (n, 1)), rng.uniform(0, 3, (n, 1)),
        rng.uniform(5, 60, (n, 1)), rng.uniform(1.2, 2.2, (n, 1)),
        rng.uniform(1.4, 2.0, (n, 1)), rng.uniform(3.0, 5.0, (n, 1)),
        rng.uniform(-np.pi, np.pi, (n, 1))], axis=1)
    qboxes = np.concatenate([
        rng.uniform(-20, 20, (k, 1)), rng.uniform(0, 3, (k, 1)),
        rng.uniform(5, 60, (k, 1)), rng.uniform(1.2, 2.2, (k, 1)),
        rng.uniform(1.4, 2.0, (k, 1)), rng.uniform(3.0, 5.0, (k, 1)),
        rng.uniform(-np.pi, np.pi, (k, 1))], axis=1)
    # reference layout: (x, y, z, l, h, w, ry) columns [0,2,3,5] = x,z,l,w
    rinc = rng.uniform(0, 4, (n, k))
    ours = d3_box_overlap_from_rinc(boxes, qboxes, rinc.copy(), criterion=-1)
    theirs = rinc.copy()
    ref.d3_box_overlap_kernel(boxes, qboxes, theirs, criterion=-1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_eval_class_bbox_map_matches_reference(ref, rng):
    """Full metric-0 (image bbox) eval_class → 11-pt mAP parity on random
    annos: clean_data + thresholds + fused statistics + PR + get_mAP."""
    from tpu3d.evaluate.ap import eval_class, get_mAP

    gt_annos, dt_annos = _random_annos(rng, 20)
    min_overlaps = np.array([[[0.7], [0.5], [0.5]],
                             [[0.5], [0.25], [0.25]]])  # (2, metric, class)
    min_overlaps = np.tile(min_overlaps[:, :, :], (1, 1, 1))
    difficultys = [0, 1, 2, 3, 4, 5]

    ours = eval_class(gt_annos, dt_annos, [0], "kitti", difficultys, 0,
                      min_overlaps, metric_mode="new", compute_aos=True,
                      use_native=False, num_parts=5)
    theirs = ref.eval_class(gt_annos, dt_annos, [0], "kitti", difficultys, 0,
                            min_overlaps, compute_aos=True, num_parts=5)
    np.testing.assert_allclose(get_mAP(ours["precision"]),
                               ref.get_mAP(theirs["precision"]), rtol=1e-12)
    np.testing.assert_allclose(get_mAP(ours["orientation"]),
                               ref.get_mAP(theirs["orientation"]), rtol=1e-9)
    # the native C matcher agrees with both
    from tpu3d.runtime import get_ap_matcher

    if get_ap_matcher()[1] is not None:
        native = eval_class(gt_annos, dt_annos, [0], "kitti", difficultys, 0,
                            min_overlaps, metric_mode="new", compute_aos=True,
                            use_native=True)
        np.testing.assert_allclose(native["precision"], ours["precision"],
                                   rtol=1e-12)
