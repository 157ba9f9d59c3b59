"""Differential test vs the REFERENCE's own ProposalLayer torch code.

Executes pointrcnn/lib/rpn/proposal_layer.py from source with CPU torch:
easydict is stubbed (so lib/config.py builds the reference's real default
cfg tree), iou3d_cuda is stubbed at import and the two CUDA NMS wrappers are
replaced with our host `nms_numpy` oracle (itself verified against an
independent Sutherland-Hodgman/Monte-Carlo oracle in test_ops.py) — so the
distance-stratified banding, pre/post top-k slicing, first-band fallback,
bin decode and output packing all run as the reference wrote them. Our
fixed-shape vmapped `proposal_layer` must reproduce the packed
(rois, scores) exactly, for both NMS types and both TEST/TRAIN modes.
Reference: proposal_layer.py:15-135.
"""

import contextlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from _ref_shims import (EasyDictStub, easydict_module, modules_swapped,
                        stable_seed, torch_cpu_shims)

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tpu3d.config import fresh_cfg
from tpu3d.models.bbox_codec import reg_channels
from tpu3d.models.proposal import proposal_layer as our_proposal_layer
from tpu3d.ops.nms import nms_numpy

REF_PRCNN = "/root/reference/pointrcnn"


def _corner_nms_stub(rotated):
    """Reference nms_gpu/nms_normal_gpu semantics on CPU: boxes are
    [x1, y1, x2, y2, ry] BEV corners; greedy keep by score, suppress at
    IoU > thresh; returns LongTensor of indices into the (already
    score-sorted) input."""

    def stub(boxes, scores, thresh):
        b = boxes.detach().cpu().numpy().astype(np.float64)
        s = scores.detach().cpu().numpy()
        boxes5 = np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                           b[:, 2] - b[:, 0], b[:, 3] - b[:, 1], b[:, 4]], 1)
        keep = nms_numpy(boxes5, s, float(thresh), rotated=rotated)
        return torch.from_numpy(keep.astype(np.int64))

    return stub


@pytest.fixture(scope="module")
def ref_env():
    """(proposal_layer module, reference cfg) with CPU shims."""
    if not os.path.isdir(REF_PRCNN):
        pytest.skip("reference repo not available")
    with contextlib.ExitStack() as stack:
        stack.enter_context(modules_swapped(
            easydict=easydict_module(),
            iou3d_cuda=types.ModuleType("iou3d_cuda")))
        stack.enter_context(torch_cpu_shims(torch, get_device=True))
        sys.path.insert(0, REF_PRCNN)
        stack.callback(sys.path.remove, REF_PRCNN)
        import lib.utils.iou3d.iou3d_utils as ref_iou3d

        ref_iou3d.nms_gpu = _corner_nms_stub(rotated=True)
        ref_iou3d.nms_normal_gpu = _corner_nms_stub(rotated=False)
        spec = importlib.util.spec_from_file_location(
            "ref_proposal_layer",
            os.path.join(REF_PRCNN, "lib", "rpn", "proposal_layer.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from lib.config import cfg as ref_cfg
        yield mod, ref_cfg


def _inputs(rng, cfg, B, N):
    n_ch = reg_channels(cfg.RPN.LOC_SCOPE, cfg.RPN.LOC_BIN_SIZE,
                        cfg.RPN.NUM_HEAD_BIN, get_xz_fine=cfg.RPN.LOC_XZ_FINE,
                        get_y_by_bin=False)
    scores = rng.normal(size=(B, N)).astype(np.float32)
    reg = rng.normal(scale=0.7, size=(B, N, n_ch)).astype(np.float32)
    xyz = np.stack([rng.uniform(-30, 30, (B, N)), rng.uniform(-1, 3, (B, N)),
                    rng.uniform(0, 78, (B, N))], axis=2).astype(np.float32)
    return scores, reg, xyz


@pytest.mark.parametrize("mode", ["TEST", "TRAIN"])
@pytest.mark.parametrize("nms_type", ["rotate", "normal"])
def test_proposal_layer_matches_reference(ref_env, mode, nms_type):
    ref_mod, ref_cfg = ref_env
    rng = np.random.default_rng(stable_seed(mode, nms_type))
    B, N = 2, 256
    # identical small top-k budget on both sides (runtime-bounded)
    ref_cfg.RPN.NMS_TYPE = nms_type
    ref_cfg[mode].RPN_PRE_NMS_TOP_N = 180
    ref_cfg[mode].RPN_POST_NMS_TOP_N = 64
    ref_cfg[mode].RPN_NMS_THRESH = 0.75
    our_cfg = fresh_cfg()
    our_cfg.RPN.NMS_TYPE = nms_type
    our_cfg.RPN.LOC_XZ_FINE = bool(ref_cfg.RPN.LOC_XZ_FINE)
    our_cfg[mode].RPN_PRE_NMS_TOP_N = 180
    our_cfg[mode].RPN_POST_NMS_TOP_N = 64
    our_cfg[mode].RPN_NMS_THRESH = 0.75
    assert our_cfg.RPN.LOC_SCOPE == ref_cfg.RPN.LOC_SCOPE
    assert our_cfg.RPN.NUM_HEAD_BIN == ref_cfg.RPN.NUM_HEAD_BIN
    np.testing.assert_allclose(np.asarray(our_cfg.CLS_MEAN_SIZE),
                               np.asarray(ref_cfg.CLS_MEAN_SIZE))

    scores, reg, xyz = _inputs(rng, ref_cfg, B, N)
    layer = ref_mod.ProposalLayer(mode=mode)
    with torch.no_grad():
        ref_rois, ref_scores = layer(
            torch.from_numpy(scores.copy()), torch.from_numpy(reg.copy()),
            torch.from_numpy(xyz.copy()))
    got_rois, got_scores, got_valid = our_proposal_layer(
        jnp.asarray(scores), jnp.asarray(reg), jnp.asarray(xyz), our_cfg,
        mode)
    got_rois = np.asarray(got_rois)
    got_scores = np.asarray(got_scores)
    got_valid = np.asarray(got_valid).astype(bool)

    assert got_rois.shape == tuple(ref_rois.shape)
    # reference zero-pads the tail; our valid mask must cover exactly the
    # nonzero reference rows
    ref_rois = ref_rois.numpy()
    ref_scores = ref_scores.numpy()
    for b in range(B):
        n_ref = int((np.abs(ref_rois[b]).sum(axis=1) > 0).sum())
        assert int(got_valid[b].sum()) == n_ref
        np.testing.assert_allclose(got_rois[b, :n_ref], ref_rois[b, :n_ref],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_scores[b, :n_ref],
                                   ref_scores[b, :n_ref], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(got_rois[b, n_ref:], 0.0, atol=1e-6)
