"""Differential tests vs the REFERENCE's own model-math torch code (CPU).

The evaluator chain is already diffed against the reference's executed code
(test_ap_reference_diff.py, test_rotated_iou_reference_diff.py). This file
extends reference-executed evidence to the model math: the bin-based box
codec and the loss functions. The reference's lib/utils/{bbox_transform,
loss_utils}.py are plain torch — the baked-in CPU torch executes them
directly (only `torch.cuda.FloatTensor` one-hot factories and a
`.to(get_device())` anchor move need CPU shims), so every comparison below
pits our jax functions against the reference's *actual* code path, not a
re-derivation:

- decode_bbox_target over all 8 (get_xz_fine, get_y_by_bin, get_ry_fine)
  combos and both roi layouts (bbox_transform.py:24-123)
- get_reg_loss (all combos; masked-reduction recast vs the reference's
  boolean-indexed subsets, loss_utils.py:87-233)
- SigmoidFocalClassificationLoss / DiceLoss / the TF-compat sigmoid CE
  (loss_utils.py:7-84)
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from _ref_shims import stable_seed

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tpu3d.models import bbox_codec, losses

REF_UTILS = "/root/reference/pointrcnn/lib/utils"


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _CpuAnchor:
    """Shim for `anchor_size.to(roi_box3d.get_device())` — get_device() is -1
    for CPU tensors and `.to(-1)` raises; hand back the CPU tensor."""

    def __init__(self, t):
        self._t = t

    def to(self, _device):
        return self._t


@pytest.fixture(scope="module")
def refs(request):
    """(bbox_transform, loss_utils) reference modules with CPU shims."""
    if not os.path.isdir(REF_UTILS):
        pytest.skip("reference repo not available")
    bt = _load_ref("ref_bbox_transform",
                   os.path.join(REF_UTILS, "bbox_transform.py"))
    lu = _load_ref("ref_loss_utils", os.path.join(REF_UTILS, "loss_utils.py"))
    # the reference builds its bin one-hots with torch.cuda.FloatTensor
    # (loss_utils.py:140-143,163-164,216); a CPU factory is semantics-neutral
    from _ref_shims import torch_cpu_shims

    shim = torch_cpu_shims(torch, cuda_method=False, float_tensor=True)
    shim.__enter__()
    request.addfinalizer(lambda: shim.__exit__(None, None, None))
    return bt, lu


ANCHOR = np.array([1.52563191, 1.62856739, 3.88311640], np.float32)  # cfg CLS_MEAN_SIZE
CODEC_KW = dict(loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12,
                loc_y_scope=0.5, loc_y_bin_size=0.25)


def _rand_codec_inputs(rng, n, combo, roi_cols):
    get_xz_fine, get_y_by_bin, get_ry_fine = combo
    n_ch = bbox_codec.reg_channels(
        CODEC_KW["loc_scope"], CODEC_KW["loc_bin_size"],
        CODEC_KW["num_head_bin"], get_xz_fine=get_xz_fine,
        get_y_by_bin=get_y_by_bin, loc_y_scope=CODEC_KW["loc_y_scope"],
        loc_y_bin_size=CODEC_KW["loc_y_bin_size"])
    pred = rng.normal(size=(n, n_ch)).astype(np.float32)
    roi = rng.normal(size=(n, roi_cols)).astype(np.float32) * 2.0
    if roi_cols == 7:
        roi[:, 3:6] = np.abs(roi[:, 3:6]) + 1.0
    return pred, roi


@pytest.mark.parametrize("get_xz_fine", [True, False])
@pytest.mark.parametrize("get_y_by_bin", [True, False])
@pytest.mark.parametrize("get_ry_fine", [True, False])
@pytest.mark.parametrize("roi_cols", [3, 7])
def test_decode_bbox_target_matches_reference(refs, get_xz_fine, get_y_by_bin,
                                              get_ry_fine, roi_cols):
    bt, _ = refs
    rng = np.random.default_rng(stable_seed(get_xz_fine, get_y_by_bin,
                                            get_ry_fine, roi_cols))
    pred, roi = _rand_codec_inputs(
        rng, 64, (get_xz_fine, get_y_by_bin, get_ry_fine), roi_cols)
    kw = dict(loc_scope=CODEC_KW["loc_scope"],
              loc_bin_size=CODEC_KW["loc_bin_size"],
              num_head_bin=CODEC_KW["num_head_bin"],
              get_xz_fine=get_xz_fine, get_y_by_bin=get_y_by_bin,
              loc_y_scope=CODEC_KW["loc_y_scope"],
              loc_y_bin_size=CODEC_KW["loc_y_bin_size"],
              get_ry_fine=get_ry_fine)
    ref = bt.decode_bbox_target(
        torch.from_numpy(roi.copy()), torch.from_numpy(pred.copy()),
        anchor_size=_CpuAnchor(torch.from_numpy(ANCHOR.copy())), **kw).numpy()
    got = np.asarray(bbox_codec.decode_bbox_target(
        jnp.asarray(roi), jnp.asarray(pred), anchor_size=jnp.asarray(ANCHOR),
        **kw))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("get_xz_fine", [True, False])
@pytest.mark.parametrize("get_y_by_bin", [True, False])
@pytest.mark.parametrize("get_ry_fine", [True, False])
def test_get_reg_loss_matches_reference(refs, get_xz_fine, get_y_by_bin,
                                        get_ry_fine):
    _, lu = refs
    rng = np.random.default_rng(
        stable_seed("loss", get_xz_fine, get_y_by_bin, get_ry_fine))
    n = 48
    n_ch = bbox_codec.reg_channels(
        CODEC_KW["loc_scope"], CODEC_KW["loc_bin_size"],
        CODEC_KW["num_head_bin"], get_xz_fine=get_xz_fine,
        get_y_by_bin=get_y_by_bin, loc_y_scope=CODEC_KW["loc_y_scope"],
        loc_y_bin_size=CODEC_KW["loc_y_bin_size"])
    pred = rng.normal(size=(n, n_ch)).astype(np.float32)
    label = np.zeros((n, 7), np.float32)
    label[:, 0:3] = rng.uniform(-2.5, 2.5, size=(n, 3))  # dx, dy, dz
    label[:, 1] *= 0.15  # dy within loc_y_scope
    label[:, 3:6] = ANCHOR * rng.uniform(0.8, 1.25, size=(n, 3))
    label[:, 6] = rng.uniform(-2 * np.pi, 2 * np.pi, size=n)  # ry
    # fg subset: the reference indexes fg rows out before the loss; ours is a
    # masked reduction over all rows — same math when the mask selects them
    fg = rng.uniform(size=n) < 0.6
    fg[:2] = True
    kw = dict(loc_scope=CODEC_KW["loc_scope"],
              loc_bin_size=CODEC_KW["loc_bin_size"],
              num_head_bin=CODEC_KW["num_head_bin"],
              get_xz_fine=get_xz_fine, get_y_by_bin=get_y_by_bin,
              loc_y_scope=CODEC_KW["loc_y_scope"],
              loc_y_bin_size=CODEC_KW["loc_y_bin_size"],
              get_ry_fine=get_ry_fine)
    ref_loc, ref_ang, ref_size, ref_dict = lu.get_reg_loss(
        torch.from_numpy(pred[fg].copy()), torch.from_numpy(label[fg].copy()),
        anchor_size=torch.from_numpy(ANCHOR.copy()), **kw)
    got_loc, got_ang, got_size, got_dict = losses.get_reg_loss(
        jnp.asarray(pred), jnp.asarray(label),
        jnp.asarray(fg.astype(np.float32)),
        anchor_size=jnp.asarray(ANCHOR), **kw)
    np.testing.assert_allclose(float(got_loc), float(ref_loc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_ang), float(ref_ang),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_size), float(ref_size),
                               rtol=1e-5, atol=1e-6)
    for k, v in ref_dict.items():
        np.testing.assert_allclose(float(got_dict[k]), float(v),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_sigmoid_focal_loss_matches_reference(refs):
    _, lu = refs
    rng = np.random.default_rng(7)
    logits = rng.normal(scale=3.0, size=(4, 256)).astype(np.float32)
    target = (rng.uniform(size=(4, 256)) < 0.3).astype(np.float32)
    weights = rng.uniform(size=(4, 256)).astype(np.float32)
    ref = lu.SigmoidFocalClassificationLoss()(
        torch.from_numpy(logits), torch.from_numpy(target),
        torch.from_numpy(weights)).numpy()
    got = np.asarray(losses.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(weights)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_dice_loss_matches_reference(refs):
    _, lu = refs
    rng = np.random.default_rng(11)
    logits = rng.normal(scale=2.0, size=1024).astype(np.float32)
    target = rng.choice([-1.0, 0.0, 1.0], size=1024,
                        p=[0.2, 0.5, 0.3]).astype(np.float32)
    ref = float(lu.DiceLoss(ignore_target=-1)(
        torch.from_numpy(logits), torch.from_numpy(target)))
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(target),
                                 ignore_target=-1))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_sigmoid_ce_matches_reference(refs):
    _, lu = refs
    rng = np.random.default_rng(13)
    logits = rng.normal(scale=4.0, size=(8, 64)).astype(np.float32)
    labels = (rng.uniform(size=(8, 64)) < 0.5).astype(np.float32)
    ref = lu._sigmoid_cross_entropy_with_logits(
        logits=torch.from_numpy(logits), labels=torch.from_numpy(labels)
    ).numpy()
    got = np.asarray(losses.sigmoid_cross_entropy_with_logits(
        jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
