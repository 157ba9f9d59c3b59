"""Differential test vs the REFERENCE's own ProposalTargetLayer torch code.

Executes pointrcnn/lib/rpn/proposal_target_layer.py from source with CPU
torch. The CUDA touchpoints are stubbed with OUR independently-verified
host implementations (boxes_iou3d_gpu -> tpu3d.ops.rotated_iou.boxes_iou3d,
itself diffed against the reference's executed numba device functions in
test_rotated_iou_reference_diff.py; roipool3d_gpu -> tpu3d.ops.roipool,
bit-identical to the CUDA first-k selection per test_ops.py), so both sides
see identical IoU values and identical pooled points — the comparison
isolates the reference's OWN partition / sampling / canonical-transform /
label logic (proposal_target_layer.py:78-182, 45-66).

The stochastic draws are pinned (np.random.permutation -> identity,
torch.randint -> arange % high, np.random.rand -> no-keep, fg-aug off), which
makes the reference forward fully deterministic. The tests then check:

1. our fg/easy-bg/hard-bg partition formulas predict the reference's sampled
   ROIs exactly (the deterministic core of sample_rois_for_rcnn);
2. our shared `canonicalize_rcnn_targets` reproduces the reference's
   canonical points, canonical gt targets, and cls/reg label masks on the
   reference's own sampled ROIs;
3. our fixed-shape proposal_target_layer (own RNG) satisfies the same
   pool-membership/count/assignment invariants the reference's sampler
   guarantees.
"""

import contextlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from _ref_shims import easydict_module, modules_swapped, stable_seed, \
    torch_cpu_shims

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tpu3d.config import fresh_cfg
from tpu3d.models.proposal_target import (canonicalize_rcnn_targets,
                                          proposal_target_layer)
from tpu3d.ops.roipool import roipool3d
from tpu3d.ops.rotated_iou import boxes_iou3d

REF_PRCNN = "/root/reference/pointrcnn"


def _iou3d_stub(boxes_a, boxes_b):
    """Reference boxes_iou3d_gpu replaced by our (reference-diffed) rotated
    IoU so both sides compare identical values."""
    a = jnp.asarray(boxes_a.detach().cpu().numpy())
    b = jnp.asarray(boxes_b.detach().cpu().numpy())
    return torch.from_numpy(np.asarray(boxes_iou3d(a, b), np.float32))


def _roipool_stub(rpn_xyz, pts_feature, rois, extra_width, sampled_pt_num):
    xyz = jnp.asarray(rpn_xyz.detach().cpu().numpy())
    feats = jnp.asarray(pts_feature.detach().cpu().numpy())
    boxes = jnp.asarray(rois.detach().cpu().numpy())
    pooled, empty = roipool3d(xyz, feats, boxes, float(extra_width),
                              int(sampled_pt_num))
    return (torch.from_numpy(np.asarray(pooled, np.float32)),
            torch.from_numpy(np.asarray(empty, np.int64).astype(np.int32)))


@pytest.fixture(scope="module")
def ref_env():
    if not os.path.isdir(REF_PRCNN):
        pytest.skip("reference repo not available")
    with contextlib.ExitStack() as stack:
        stack.enter_context(modules_swapped(
            easydict=easydict_module(),
            iou3d_cuda=types.ModuleType("iou3d_cuda"),
            roipool3d_cuda=types.ModuleType("roipool3d_cuda")))
        stack.enter_context(torch_cpu_shims(torch, get_device=True))
        sys.path.insert(0, REF_PRCNN)
        stack.callback(sys.path.remove, REF_PRCNN)
        import lib.utils.iou3d.iou3d_utils as ref_iou3d
        import lib.utils.roipool3d.roipool3d_utils as ref_roipool

        ref_iou3d.boxes_iou3d_gpu = _iou3d_stub
        ref_roipool.roipool3d_gpu = _roipool_stub
        spec = importlib.util.spec_from_file_location(
            "ref_proposal_target",
            os.path.join(REF_PRCNN, "lib", "rpn",
                         "proposal_target_layer.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from lib.config import cfg as ref_cfg
        yield mod, ref_cfg


@contextlib.contextmanager
def _pinned_rng(mod):
    """Make the reference sampler deterministic: identity fg permutation,
    cycling bg randint, never keep-original in the (disabled) jitter."""
    np_rand, np_perm = np.random.rand, np.random.permutation
    t_randint = torch.randint
    np.random.rand = lambda *s: (np.full(s, 0.99) if s else 0.99)
    np.random.permutation = lambda n: np.arange(n)
    torch.randint = lambda low, high, size, **kw: (
        torch.arange(int(np.prod(size)), dtype=torch.long) % max(high, 1)
    ).reshape(size)
    try:
        yield
    finally:
        np.random.rand, np.random.permutation = np_rand, np_perm
        torch.randint = t_randint


def _make_scene(seed, n_pts=256, n_rois=24, n_gt=3):
    """Proposals straddling the fg / hard-bg / easy-bg IoU bands around a
    few gt boxes, plus points and features."""
    rng = np.random.default_rng(seed)
    gts = np.zeros((n_gt, 7), np.float32)
    gts[:, 0] = rng.uniform(-10, 10, n_gt)
    gts[:, 1] = rng.uniform(0.8, 1.4, n_gt)
    gts[:, 2] = rng.uniform(10, 40, n_gt)
    gts[:, 3:6] = [1.5, 1.6, 3.9]
    gts[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
    rois = np.zeros((n_rois, 7), np.float32)
    for i in range(n_rois):
        g = gts[i % n_gt].copy()
        # shift magnitude sweeps the IoU spectrum fg -> hard bg -> easy bg
        mag = [0.1, 0.4, 0.9, 2.5, 6.0][i % 5]
        g[0] += rng.normal() * mag
        g[2] += rng.normal() * mag
        g[6] += rng.normal() * 0.1
        rois[i] = g
    pts = np.zeros((n_pts, 3), np.float32)
    # half the points inside gt boxes, half scattered
    for i in range(n_pts // 2):
        g = gts[i % n_gt]
        pts[i] = g[0:3] + rng.uniform(-0.5, 0.5, 3) * g[[5, 3, 4]] * 0.4
        pts[i, 1] -= g[3] * 0.5
    pts[n_pts // 2:] = rng.uniform([-20, -1, 0], [20, 3, 60],
                                   (n_pts - n_pts // 2, 3))
    feats = rng.normal(size=(n_pts, 4)).astype(np.float32)
    return rois, gts, pts, feats


def _expected_partition(rois, gts, ref_cfg):
    """Our partition formulas on the same IoU values the reference sees."""
    iou = np.asarray(boxes_iou3d(jnp.asarray(rois), jnp.asarray(gts)))
    max_ov = iou.max(axis=1)
    assign = iou.argmax(axis=1)
    c = ref_cfg.RCNN
    fg_thresh = min(c.REG_FG_THRESH, c.CLS_FG_THRESH)
    fg = np.nonzero(max_ov >= fg_thresh)[0]
    easy = np.nonzero(max_ov < c.CLS_BG_THRESH_LO)[0]
    hard = np.nonzero((max_ov >= c.CLS_BG_THRESH_LO)
                      & (max_ov < c.CLS_BG_THRESH))[0]
    return max_ov, assign, fg, easy, hard


def test_sampler_partition_matches_reference(ref_env):
    """With pinned RNG the reference's sample_rois_for_rcnn is a pure
    function of the fg/easy/hard partition; our mask formulas must predict
    its sampled ROIs, gt assignments, and IoUs exactly."""
    mod, ref_cfg = ref_env
    ref_cfg.RCNN.ROI_FG_AUG_TIMES = 0  # jitter off -> deterministic
    layer = mod.ProposalTargetLayer()
    for seed in range(4):
        rois, gts, _, _ = _make_scene(stable_seed("ptl", seed))
        # the forward feeds 7-column gt boxes (the (B, N, 8) docstring is
        # stale: aug_roi_by_noise_torch .view(1, 7) requires 7 columns)
        with _pinned_rng(mod):
            b_rois, b_gts, b_iou = layer.sample_rois_for_rcnn(
                torch.from_numpy(rois[None]), torch.from_numpy(gts[None]))
        b_rois = b_rois[0].numpy()
        b_gts = b_gts[0].numpy()
        b_iou = b_iou[0].numpy()

        max_ov, assign, fg, easy, hard = _expected_partition(
            rois, gts, ref_cfg)
        R = ref_cfg.RCNN.ROI_PER_IMAGE
        fg_per = int(np.round(ref_cfg.RCNN.FG_RATIO * R))
        fg_take = min(fg_per, len(fg)) if (len(easy) + len(hard)) else R
        bg_take = R - fg_take
        # identity permutation -> the first fg_take fg indices in order
        exp_fg = fg[:fg_take]
        # cycling randint -> arange % pool for each bg sub-pool
        if len(hard) and len(easy):
            hard_cnt = int(bg_take * ref_cfg.RCNN.HARD_BG_RATIO)
            exp_bg = np.concatenate([
                hard[np.arange(hard_cnt) % len(hard)],
                easy[np.arange(bg_take - hard_cnt) % len(easy)]])
        elif len(hard):
            exp_bg = hard[np.arange(bg_take) % len(hard)]
        else:
            exp_bg = easy[np.arange(bg_take) % len(easy)]
        exp_idx = np.concatenate([exp_fg, exp_bg]).astype(int)

        np.testing.assert_allclose(b_rois, rois[exp_idx], atol=1e-6)
        np.testing.assert_allclose(b_gts[:, 0:7], gts[assign[exp_idx]],
                                   atol=1e-6)
        np.testing.assert_allclose(b_iou, max_ov[exp_idx], atol=1e-5)


def test_canonical_targets_match_reference(ref_env):
    """Full pinned-RNG reference forward (jitter and aug off) vs our shared
    canonicalize_rcnn_targets on the reference's own sampled ROIs: canonical
    points, canonical gt boxes, cls labels, reg masks."""
    mod, ref_cfg = ref_env
    ref_cfg.RCNN.ROI_FG_AUG_TIMES = 0
    ref_cfg.AUG_DATA = False
    ref_cfg.RCNN.USE_INTENSITY = False
    layer = mod.ProposalTargetLayer()
    for seed in range(2):
        rois, gts, pts, feats = _make_scene(stable_seed("ptl-canon", seed))
        seg_mask = (np.arange(len(pts)) % 2).astype(np.float32)
        depth = np.linalg.norm(pts, axis=1).astype(np.float32)
        inp = {
            "roi_boxes3d": torch.from_numpy(rois[None]),
            "gt_boxes3d": torch.from_numpy(gts[None]),
            "rpn_xyz": torch.from_numpy(pts[None]),
            "rpn_features": torch.from_numpy(feats[None]),
            "seg_mask": torch.from_numpy(seg_mask[None]),
            "pts_depth": torch.from_numpy(depth[None]),
        }
        with _pinned_rng(mod):
            with torch.no_grad():
                sampled = layer.sample_rois_for_rcnn(
                    inp["roi_boxes3d"], inp["gt_boxes3d"])
            # re-pin so the forward's sample_rois_for_rcnn draws identically
            torch.manual_seed(0)
        with _pinned_rng(mod), torch.no_grad():
            ref_out = layer.forward(inp)

        b_rois, b_gts, b_iou = (t[0].numpy() for t in sampled)
        # pool with OUR roipool (the same stub the reference forward used)
        extra = np.stack([seg_mask, depth / 70.0 - 0.5], 1)
        pts_feature = np.concatenate([extra, feats], 1)
        pooled, empty = roipool3d(
            jnp.asarray(pts[None]), jnp.asarray(pts_feature[None]),
            jnp.asarray(b_rois[None]),
            float(ref_cfg.RCNN.POOL_EXTRA_WIDTH),
            int(ref_cfg.RCNN.NUM_POINTS))
        can_pts, can_gts, cls_label, reg_mask = canonicalize_rcnn_targets(
            pooled[..., 0:3], jnp.asarray(b_rois[None]),
            jnp.asarray(b_gts[None, :, 0:7]), jnp.asarray(b_iou[None]),
            empty, fresh_cfg().RCNN)

        np.testing.assert_allclose(
            np.asarray(can_pts).reshape(-1, ref_cfg.RCNN.NUM_POINTS, 3),
            ref_out["sampled_pts"].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(can_gts).reshape(-1, 7),
                                   ref_out["gt_of_rois"].numpy(), atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(cls_label).reshape(-1),
            ref_out["cls_label"].numpy())
        np.testing.assert_array_equal(
            np.asarray(reg_mask).reshape(-1),
            ref_out["reg_valid_mask"].numpy())


def test_our_layer_satisfies_reference_invariants(ref_env):
    """Our fixed-shape layer (own RNG, jitter/aug off) must satisfy the
    sampler guarantees the reference's code establishes: fg count =
    min(fg_per_image, |fg pool|), every fg ROI from the fg pool with its
    argmax gt and IoU, every bg ROI from the bg pools with the
    HARD_BG_RATIO split, labels per the threshold rules."""
    _, ref_cfg = ref_env
    cfg = fresh_cfg()
    cfg.RCNN.ROI_FG_AUG_TIMES = 0
    for seed in range(3):
        rois, gts, pts, feats = _make_scene(stable_seed("ptl-ours", seed))
        out = jax.jit(lambda k, r, v, g, x, f: proposal_target_layer(
            k, r, v, g, x, f, cfg, aug_data=False))(
            jax.random.PRNGKey(seed), jnp.asarray(rois[None]),
            jnp.ones((1, len(rois)), bool), jnp.asarray(gts[None]),
            jnp.asarray(pts[None]), jnp.asarray(feats[None]))
        s_rois = np.asarray(out["roi_boxes3d"])
        s_iou = np.asarray(out["gt_iou"])

        max_ov, assign, fg, easy, hard = _expected_partition(
            rois, gts, ref_cfg)
        c = ref_cfg.RCNN
        R = c.ROI_PER_IMAGE
        fg_per = int(np.round(c.FG_RATIO * R))
        fg_take = min(fg_per, len(fg)) if (len(easy) + len(hard)) else R
        bg_take = R - fg_take

        # match each sampled ROI back to a source proposal
        d = np.linalg.norm(s_rois[:, None, :] - rois[None, :, :], axis=2)
        src = d.argmin(axis=1)
        assert d.min(axis=1).max() < 1e-5
        fg_thresh = min(c.REG_FG_THRESH, c.CLS_FG_THRESH)
        n_fg = int((max_ov[src] >= fg_thresh).sum())
        assert n_fg == fg_take
        # fg block first, from the fg pool
        assert set(src[:fg_take]) <= set(fg.tolist())
        # bg block from the bg pools with the configured hard/easy split
        if len(hard) and len(easy):
            hard_cnt = int(bg_take * c.HARD_BG_RATIO)
            assert set(src[fg_take:fg_take + hard_cnt]) <= set(hard.tolist())
            assert set(src[fg_take + hard_cnt:]) <= set(easy.tolist())
        # IoU and gt assignment carried faithfully
        np.testing.assert_allclose(s_iou, max_ov[src], atol=1e-5)
