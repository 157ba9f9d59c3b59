"""Evaluator tests: synthetic scenes with hand-computable AP."""

import numpy as np
import pytest

from tpu3d.evaluate import (
    clean_data,
    evaluate,
    get_official_eval_result,
    get_thresholds,
    image_box_overlap,
)
from tpu3d.kitti import annos as kitti_annos


def _make_anno(locs, dims_lhw, rys, names=None, scores=None, bbox_h=50.0,
               occluded=0, truncated=0.0):
    n = len(locs)
    names = names or ["Car"] * n
    anno = {
        "name": np.array(names),
        "truncated": np.full(n, truncated, dtype=np.float64),
        "occluded": np.full(n, occluded, dtype=np.int64),
        "alpha": np.full(n, -10.0),
        "bbox": np.tile(np.array([100.0, 100.0, 150.0, 100.0 + bbox_h]), (n, 1)),
        "dimensions": np.asarray(dims_lhw, dtype=np.float64).reshape(n, 3),
        "location": np.asarray(locs, dtype=np.float64).reshape(n, 3),
        "rotation_y": np.asarray(rys, dtype=np.float64).reshape(n),
        "score": (np.asarray(scores, dtype=np.float64) if scores is not None
                  else np.zeros(n)),
    }
    return anno


def _perfect_scene(num_images=30, cars_per_image=5, seed=0):
    """gt at depths spanning the distance bands; dt == gt with scores.

    Sized so every difficulty band holds >= 41 valid gt — the 41-point threshold
    machinery can only fill the PR curve (and reach AP 100) with >= 41 matches.
    """
    rng = np.random.default_rng(seed)
    gt, dt = [], []
    for i in range(num_images):
        depths = rng.uniform(5, 68, cars_per_image)
        locs = np.stack([rng.uniform(-10, 10, cars_per_image),
                         np.full(cars_per_image, 1.6), depths], axis=1)
        dims = np.tile(np.array([3.9, 1.5, 1.6]), (cars_per_image, 1))
        rys = rng.uniform(-np.pi, np.pi, cars_per_image)
        gt.append(_make_anno(locs, dims, rys))
        dt.append(_make_anno(locs, dims, rys,
                             scores=rng.uniform(0.5, 1.0, cars_per_image)))
    return gt, dt


def test_perfect_predictions_ap_100():
    gt, dt = _perfect_scene()
    result, ret = get_official_eval_result(gt, dt, 0, "kitti", metric_mode="new")
    for key in ("Car_3d_easy", "Car_3d_moderate", "Car_3d_hard",
                "Car_bev_moderate", "Car_image_moderate"):
        assert ret[key] == pytest.approx(100.0, abs=1e-6), (key, ret[key])
    assert "AP@0.70, 0.50, 0.50" in result


def test_perfect_predictions_old_metric():
    gt, dt = _perfect_scene()
    _, ret = get_official_eval_result(gt, dt, 0, "kitti", metric_mode="old")
    assert ret["Car_3d_moderate"] == pytest.approx(100.0, abs=1e-6)


def test_missed_half_recall_limits_ap():
    # 2 gt per image, detect only the first -> recall caps at 0.5;
    # 11-pt AP: samples at recall 0, 0.1, ..., 1.0 -> 6 of 11 have precision 1
    gt, dt = [], []
    for i in range(50):
        locs = np.array([[0.0, 1.6, 20.0], [5.0, 1.6, 40.0]])
        dims = np.tile([3.9, 1.5, 1.6], (2, 1))
        rys = np.zeros(2)
        gt.append(_make_anno(locs, dims, rys))
        dt.append(_make_anno(locs[:1], dims[:1], rys[:1],
                             scores=[0.9 - 0.001 * i]))
    _, ret = get_official_eval_result(gt, dt, 0, "kitti", metric_mode="new")
    # difficulty 1 ((0,70] occ<=1) covers both gts
    assert ret["Car_3d_moderate"] == pytest.approx(100 * 6 / 11, abs=2.0)


def test_false_positives_reduce_precision():
    gt, dt = [], []
    for i in range(50):
        locs = np.array([[0.0, 1.6, 20.0]])
        dims = np.tile([3.9, 1.5, 1.6], (1, 1))
        gt.append(_make_anno(locs, dims, [0.0]))
        # one true detection + one far false positive with HIGHER score
        dt_locs = np.array([[0.0, 1.6, 20.0], [-10.0, 1.6, 60.0]])
        dt_dims = np.tile([3.9, 1.5, 1.6], (2, 1))
        dt.append(_make_anno(dt_locs, dt_dims, [0.0, 0.0],
                             scores=[0.8, 0.9 - 0.001 * i]))
    _, ret = get_official_eval_result(gt, dt, 0, "kitti", metric_mode="new")
    # at full recall precision is 0.5; envelope keeps max precision at 0.5
    assert ret["Car_3d_moderate"] == pytest.approx(50.0, abs=5.0)


def test_clean_data_new_distance_bands():
    gt = _make_anno([[0, 1.6, 20.0], [0, 1.6, 45.0], [0, 1.6, 65.0]],
                    np.tile([3.9, 1.5, 1.6], (3, 1)), np.zeros(3))
    dt = _make_anno([[0, 1.6, 25.0]], [[3.9, 1.5, 1.6]], [0.0], scores=[0.9])
    # difficulty 0: (0, 30] only
    n_valid, ig_gt, ig_dt, _ = clean_data(gt, dt, 0, "kitti", 0, "new")
    assert n_valid == 1 and ig_gt == [0, 1, 1] and ig_dt == [0]
    # difficulty 4: (30, 50)
    n_valid, ig_gt, ig_dt, _ = clean_data(gt, dt, 0, "kitti", 4, "new")
    assert n_valid == 1 and ig_gt == [1, 0, 1] and ig_dt == [1]
    # difficulty 2: (0, 70) all visible
    n_valid, ig_gt, ig_dt, _ = clean_data(gt, dt, 0, "kitti", 2, "new")
    assert n_valid == 3


def test_clean_data_old_height_and_van():
    # height 30 px: fails easy (40), passes moderate (25)
    gt = _make_anno([[0, 1.6, 20.0]], [[3.9, 1.5, 1.6]], [0.0], bbox_h=30.0)
    dt = _make_anno([[0, 1.6, 20.0]], [[3.9, 1.5, 1.6]], [0.0], scores=[0.9],
                    bbox_h=30.0)
    n_valid, ig_gt, ig_dt, _ = clean_data(gt, dt, 0, "kitti", 0, "old")
    assert n_valid == 0 and ig_gt == [1] and ig_dt == [1]
    n_valid, ig_gt, ig_dt, _ = clean_data(gt, dt, 0, "kitti", 1, "old")
    assert n_valid == 1 and ig_gt == [0] and ig_dt == [0]
    # Van counts as ignorable (not FP) for Car eval
    gt_van = _make_anno([[0, 1.6, 20.0]], [[3.9, 1.5, 1.6]], [0.0],
                        names=["Van"])
    n_valid, ig_gt, _, _ = clean_data(gt_van, dt, 0, "kitti", 1, "old")
    assert n_valid == 0 and ig_gt == [1]


def test_get_thresholds_even_recall_spacing():
    scores = np.linspace(0.99, 0.01, 50)
    th = get_thresholds(scores.copy(), 50)
    assert len(th) <= 41
    assert th[0] == pytest.approx(0.99, abs=0.05)
    assert all(th[i] >= th[i + 1] for i in range(len(th) - 1))


def test_image_box_overlap_matches_iou2d():
    rng = np.random.default_rng(2)
    a = np.sort(rng.uniform(0, 100, (8, 4)), axis=-1)
    b = np.sort(rng.uniform(0, 100, (5, 4)), axis=-1)
    got = image_box_overlap(a, b)
    ref = kitti_annos.iou_2d(a, b)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_evaluate_cli_end_to_end(tmp_path):
    """Full flow through files on disk, including empty prediction files."""
    n_img = 30
    gt, dt = _perfect_scene(num_images=n_img)
    ds = tmp_path / "data"
    (ds / "training" / "label_2").mkdir(parents=True)
    results = tmp_path / "results"
    results.mkdir()
    ids = list(range(n_img))
    with open(ds / "val.txt", "w") as f:
        f.write("\n".join("%06d" % i for i in ids))
    for i in ids:
        g = dict(gt[i])
        # gt files have no score column: write without it
        lines = []
        for j in range(len(g["name"])):
            lines.append(
                "%s %.2f %d %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f"
                % (g["name"][j], g["truncated"][j], g["occluded"][j], g["alpha"][j],
                   g["bbox"][j, 0], g["bbox"][j, 1], g["bbox"][j, 2], g["bbox"][j, 3],
                   g["dimensions"][j, 1], g["dimensions"][j, 2], g["dimensions"][j, 0],
                   g["location"][j, 0], g["location"][j, 1], g["location"][j, 2],
                   g["rotation_y"][j]))
        (ds / "training" / "label_2" / ("%06d.txt" % i)).write_text(
            "\n".join(lines))
        if i == 5:
            (results / ("%06d.txt" % i)).write_text("")  # empty prediction file
        else:
            kitti_annos.to_kitti_format(dt[i], results / ("%06d.txt" % i))
    out, ret = evaluate(result_path=str(results), dataset_path=str(ds),
                        metric="new")
    assert "3d   AP:" in out
    # image 5 undetected (5 of 150 gt missed), all others perfect
    assert 80.0 < ret["Car_3d_moderate"] <= 100.0


def test_native_matcher_matches_python():
    """The C matcher must reproduce the pure-python eval bit-for-bit, including
    DontCare regions, Van gts, AOS, and empty images."""
    from tpu3d.evaluate.ap import eval_class
    from tpu3d.runtime import native_available

    assert native_available(), "native AP matcher failed to build"
    rng = np.random.default_rng(5)
    gt, dt = [], []
    for i in range(12):
        n_gt = int(rng.integers(0, 6))
        n_dt = int(rng.integers(0, 6))
        names = list(rng.choice(["Car", "Van", "Pedestrian", "DontCare"], n_gt,
                                p=[0.6, 0.15, 0.15, 0.1]))
        g = _make_anno(
            np.stack([rng.uniform(-10, 10, n_gt), np.full(n_gt, 1.6),
                      rng.uniform(5, 69, n_gt)], axis=1).reshape(n_gt, 3),
            np.tile([3.9, 1.5, 1.6], (n_gt, 1)),
            rng.uniform(-np.pi, np.pi, n_gt), names=names,
            occluded=int(rng.integers(0, 3)))
        g["alpha"] = rng.uniform(-np.pi, np.pi, n_gt)
        d = _make_anno(
            np.stack([rng.uniform(-10, 10, n_dt), np.full(n_dt, 1.6),
                      rng.uniform(5, 69, n_dt)], axis=1).reshape(n_dt, 3),
            np.tile([3.9, 1.5, 1.6], (n_dt, 1)),
            rng.uniform(-np.pi, np.pi, n_dt),
            scores=rng.uniform(0.1, 1.0, n_dt))
        d["alpha"] = rng.uniform(-np.pi, np.pi, n_dt)
        # make some dts match gts exactly
        k = min(n_gt, n_dt)
        if k:
            d["location"][:k] = g["location"][:k]
            d["rotation_y"][:k] = g["rotation_y"][:k]
        gt.append(g)
        dt.append(d)
    mo = np.array([[[0.7], [0.5], [0.5]]])
    for metric in (0, 1, 2):
        r_native = eval_class(gt, dt, [0], "kitti", [1, 2], metric, mo, "new",
                              compute_aos=True, use_native=True)
        r_python = eval_class(gt, dt, [0], "kitti", [1, 2], metric, mo, "new",
                              compute_aos=True, use_native=False)
        for key in ("precision", "recall", "orientation"):
            np.testing.assert_allclose(r_native[key], r_python[key], atol=1e-12,
                                       err_msg=f"metric={metric} {key}")


def test_range_check_asserts(tmp_path):
    """--range_check reproduces tools/evaluate.py's sanity asserts: detections
    beyond 80 m depth (or labels beyond 70 m) abort the evaluation."""
    import pytest as _pytest

    from tpu3d.evaluate.evaluate import evaluate

    gt_dir = tmp_path / "gt"
    dt_dir = tmp_path / "dt"
    gt_dir.mkdir(); dt_dir.mkdir()
    line = ("Car 0.00 0 0.0 500 150 600 250 1.50 1.60 3.90 "
            "0.00 1.65 {z:.2f} 0.00")
    (gt_dir / "000000.txt").write_text(line.format(z=20.0) + "\n")
    (dt_dir / "000000.txt").write_text(line.format(z=20.0) + " 0.9\n")
    split = tmp_path / "val.txt"
    split.write_text("000000\n")
    # in-range: passes
    evaluate(str(dt_dir), label_path=str(gt_dir),
             label_split_file=str(split), metric="new", range_check=True)
    # out-of-range detection: asserts
    (dt_dir / "000000.txt").write_text(line.format(z=95.0) + " 0.9\n")
    with _pytest.raises(AssertionError, match="80m"):
        evaluate(str(dt_dir), label_path=str(gt_dir),
                 label_split_file=str(split), metric="new", range_check=True)
