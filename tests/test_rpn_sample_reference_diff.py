"""Differential test vs the REFERENCE's own KittiRCNNDataset.get_rpn_sample.

Executes pointrcnn/lib/datasets/kitti_rcnn_dataset.py from source with CPU
torch on a synthetic KITTI-format dataset directory, with the stochastic
draws pinned to deterministic stubs (np.random.choice -> first-k / cycling,
np.random.shuffle -> no-op; GT-aug and global aug disabled), so the
deterministic cores of the RPN sample path run exactly as the reference
wrote them (kitti_rcnn_dataset.py:200-321, 384-414):

- the image-projection + PC_AREA_SCOPE valid-flag filter,
- the near/far distance-stratified point budget,
- per-point segmentation + regression label generation (scipy-Delaunay
  in_hull on the reference side vs our analytic rotated-box test).

Our loader runs on the same directory with the same pinned RNG and must
produce identical pts_input, gt boxes, and per-point labels.
"""

import contextlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from _ref_shims import easydict_module, modules_swapped, torch_cpu_shims

torch = pytest.importorskip("torch")
pytest.importorskip("scipy")

from tpu3d.config import fresh_cfg
from tpu3d.datasets import KittiRCNNDataset, create_synthetic_kitti

REF_PRCNN = "/root/reference/pointrcnn"


class _FakeRng:
    """Deterministic stand-in shared by both sides: choice -> first-k
    (cycling under replacement), shuffle -> no-op, draws -> 0.99."""

    def choice(self, arr, size, replace=False):
        arr = np.asarray(arr)
        if replace:
            return arr[np.arange(size) % max(len(arr), 1)]
        assert size <= len(arr)
        return arr[:size]

    def shuffle(self, arr):
        return None

    def random(self):
        return 0.99

    def integers(self, lo, hi):
        return lo


@contextlib.contextmanager
def _pinned_numpy_rng():
    saved = (np.random.choice, np.random.shuffle, np.random.rand)
    fake = _FakeRng()
    np.random.choice = lambda a, size, replace=False: fake.choice(
        a, size, replace)
    np.random.shuffle = fake.shuffle
    np.random.rand = lambda *s: (np.full(s, 0.99) if s else 0.99)
    try:
        yield
    finally:
        np.random.choice, np.random.shuffle, np.random.rand = saved


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rpn_sample_diff"))
    create_synthetic_kitti(root, n_frames=6, image_files=True, seed=3)
    return root


@pytest.fixture(scope="module")
def ref_dataset(data_root):
    if not os.path.isdir(REF_PRCNN):
        pytest.skip("reference repo not available")
    with contextlib.ExitStack() as stack:
        stack.enter_context(modules_swapped(
            easydict=easydict_module(),
            iou3d_cuda=types.ModuleType("iou3d_cuda"),
            roipool3d_cuda=types.ModuleType("roipool3d_cuda")))
        stack.enter_context(torch_cpu_shims(torch))
        sys.path.insert(0, REF_PRCNN)
        stack.callback(sys.path.remove, REF_PRCNN)
        spec = importlib.util.spec_from_file_location(
            "ref_kitti_rcnn_dataset",
            os.path.join(REF_PRCNN, "lib", "datasets",
                         "kitti_rcnn_dataset.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from lib.config import cfg as ref_cfg

        ref_cfg.RPN.ENABLED = True
        ref_cfg.RCNN.ENABLED = False
        ref_cfg.GT_AUG_ENABLED = False
        ref_cfg.AUG_DATA = False
        ref_cfg.RPN.FIXED = False
        import logging

        ds = mod.KittiRCNNDataset(
            root_dir=data_root, npoints=2048, split="train", classes="Car",
            mode="TRAIN", npoints_faraway=256,
            logger=logging.getLogger("ref_rpn_sample_diff"))
        yield ds, ref_cfg


@pytest.fixture(scope="module")
def our_dataset(data_root):
    cfg = fresh_cfg()
    cfg.RPN.ENABLED = True
    cfg.RCNN.ENABLED = False
    cfg.GT_AUG_ENABLED = False
    cfg.AUG_DATA = False
    cfg.RPN.FIXED = False
    cfg.RPN.NUM_POINTS = 2048
    ds = KittiRCNNDataset(root_dir=data_root, npoints=2048, split="train",
                          mode="TRAIN", classes="Car", cfg=cfg,
                          npoints_faraway=256)
    ds._rng = lambda index: _FakeRng()
    return ds


def test_get_rpn_sample_matches_reference(ref_dataset, our_dataset):
    """Full deterministic get_rpn_sample parity: sampled/filtered points,
    gt boxes, and the per-point cls/reg labels (Delaunay in_hull on the
    reference side vs our analytic in-box test)."""
    ref_ds, _ = ref_dataset
    assert len(ref_ds) == len(our_dataset) > 0
    for index in range(len(ref_ds)):
        with _pinned_numpy_rng():
            ref = ref_ds.get_rpn_sample(index)
        ours = our_dataset.get_rpn_sample(index)

        assert ref["sample_id"] == ours["sample_id"]
        np.testing.assert_allclose(ours["pts_input"], ref["pts_input"],
                                   atol=1e-5)
        n_gt = len(ref["gt_boxes3d"])
        np.testing.assert_allclose(ours["gt_boxes3d"][:n_gt],
                                   ref["gt_boxes3d"], atol=1e-5)
        assert np.abs(ours["gt_boxes3d"][n_gt:]).sum() == 0  # padding
        np.testing.assert_allclose(ours["rpn_reg_label"],
                                   ref["rpn_reg_label"], atol=1e-4)
        # labels must agree everywhere except points numerically ON a box
        # face (Delaunay vs analytic test boundary behavior)
        mism = ours["rpn_cls_label"] != ref["rpn_cls_label"]
        assert mism.mean() < 1e-3, (index, mism.sum())


def test_valid_flag_matches_reference(ref_dataset, our_dataset):
    """The static valid-flag filter (image projection + PC_AREA_SCOPE,
    kitti_rcnn_dataset.py:200-222) bit-for-bit on random projections."""
    ref_ds, _ = ref_dataset
    rng = np.random.default_rng(5)
    pts_rect = rng.uniform([-45, -3, -5], [45, 5, 75],
                           (4096, 3)).astype(np.float32)
    pts_img = rng.uniform([-50, -50], [1300, 450],
                          (4096, 2)).astype(np.float32)
    depth = rng.uniform(-2, 75, 4096).astype(np.float32)
    img_shape = (375, 1242, 3)
    ref_flag = ref_ds.get_valid_flag(pts_rect, pts_img, depth, img_shape)
    our_flag = our_dataset.get_valid_flag(pts_rect, pts_img, depth,
                                          img_shape)
    np.testing.assert_array_equal(np.asarray(our_flag), np.asarray(ref_flag))


def test_near_far_budget_matches_reference(ref_dataset, our_dataset):
    """The distance-stratified sampling block (kitti_rcnn_dataset.py:
    288-321) with pinned draws: far cap, near fill (with replacement when
    short), and ordering, via a synthetic depth profile exercising
    more-far-than-cap, fewer-near-than-needed, and n < npoints."""
    ref_ds, _ = ref_dataset
    rng = np.random.default_rng(7)
    for n_near, n_far in ((3000, 600), (1500, 100), (900, 2000), (500, 300)):
        near = rng.uniform([-20, -1, 0], [20, 3, 39.9],
                           (n_near, 3)).astype(np.float32)
        far = rng.uniform([-20, -1, 40.0], [20, 3, 70],
                          (n_far, 3)).astype(np.float32)
        pts = np.concatenate([near, far])
        intens = rng.random(len(pts)).astype(np.float32)

        # reference block, extracted by running get_rpn_sample's sampling
        # via the same pinned draws the inline code makes
        with _pinned_numpy_rng():
            if ref_ds.npoints < len(pts):
                depth = pts[:, 2]
                near_flag = depth < 40.0
                far_idxs = np.where(near_flag == 0)[0]
                if len(far_idxs) > ref_ds.npoints_faraway:
                    far_idxs = np.random.choice(far_idxs,
                                                ref_ds.npoints_faraway,
                                                replace=False)
                near_idxs = np.where(near_flag == 1)[0]
                need = ref_ds.npoints - len(far_idxs)
                near_choice = np.random.choice(near_idxs, need,
                                               replace=len(near_idxs) < need)
                choice = (np.concatenate((near_choice, far_idxs))
                          if len(far_idxs) > 0 else near_choice)
                np.random.shuffle(choice)
            else:
                choice = np.arange(0, len(pts), dtype=np.int32)
                if ref_ds.npoints > len(pts):
                    extra = np.random.choice(
                        choice, ref_ds.npoints - len(pts),
                        replace=len(choice) < ref_ds.npoints - len(pts))
                    choice = np.concatenate((choice, extra))
                np.random.shuffle(choice)
            ref_pts = pts[choice]
            ref_int = intens[choice]

        our_pts, our_int = our_dataset._sample_points(_FakeRng(), pts,
                                                      intens)
        np.testing.assert_array_equal(our_pts, ref_pts)
        np.testing.assert_array_equal(our_int, ref_int)
