"""Full-network forward differentials vs the reference's executed torch
modules, with WEIGHTS CONVERTED by tpu3d.tools.convert_torch_ckpt.

Runs the reference's own `lib/net/rpn.py RPN` (backbone Pointnet2MSG + cls/
reg towers) and `lib/net/rcnn_net.py RCNNNet` from source on CPU torch —
the CUDA pointnet2 ops replaced by tests/_ref_pointnet2_shim.py (pure torch
delegating pick semantics to our host numpy oracles, themselves the tested
twins of our jitted ops) — then converts the torch state_dict into our flax
parameter tree and runs our RPN / RCNNNet on the identical input. The
logits must agree to float tolerance.

This is the end-to-end check of the checkpoint converter's name/layout
mapping AND of the whole network composition (4 MSG-SA levels + 4 FP levels
+ heads; xyz-up/merge-down + 3 SA + heads) in one shot — every per-stage
differential composed. It is also the validation that the real-data parity
runbook (docs/KITTI_PARITY_RUNBOOK.md) rests on: a reference-trained .pth
evaluated through our stack produces the reference network's outputs.

References: lib/net/rpn.py:11-76, lib/net/pointnet2_msg.py,
lib/net/rcnn_net.py:14-190, pointnet2_lib/pointnet2/{pointnet2_modules,
pytorch_utils}.py, tools/train_utils/train_utils.py:60-76 (ckpt format).
"""

import contextlib
import importlib
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from _ref_shims import (easydict_module, modules_swapped,  # noqa: E402
                        torch_cpu_shims)

from tpu3d.config import fresh_cfg  # noqa: E402
from tpu3d.tools.convert_torch_ckpt import convert_state_dict  # noqa: E402

REF_PRCNN = "/root/reference/pointrcnn"

# small-but-real shapes: full 4-level MSG pyramid, CPU-feasible
N_PTS = 2048
NPOINTS = [512, 128, 32, 8]


def _set_rpn_cfg(c):
    """Shared knobs, set identically on the reference cfg tree and ours."""
    c.RPN.USE_INTENSITY = False
    c.RPN.LOC_XZ_FINE = True
    c.RPN.NUM_POINTS = N_PTS
    c.RPN.SA_CONFIG.NPOINTS = list(NPOINTS)


@pytest.fixture(scope="module")
def ref_env():
    if not os.path.isdir(REF_PRCNN):
        pytest.skip("reference repo not available")
    import _ref_pointnet2_shim as p2shim

    with contextlib.ExitStack() as stack:
        stack.enter_context(modules_swapped(
            easydict=easydict_module(),
            iou3d_cuda=types.ModuleType("iou3d_cuda"),
            roipool3d_cuda=types.ModuleType("roipool3d_cuda")))
        stack.enter_context(torch_cpu_shims(torch, get_device=True))
        for p in (REF_PRCNN, os.path.join(REF_PRCNN, "lib", "net")):
            sys.path.insert(0, p)
            stack.callback(sys.path.remove, p)
        added = p2shim.install(REF_PRCNN)
        stack.callback(lambda: [sys.modules.pop(n, None) for n in added])
        from lib.config import cfg as ref_cfg

        rpn_mod = importlib.import_module("lib.net.rpn")
        rcnn_mod = importlib.import_module("lib.net.rcnn_net")
        yield rpn_mod, rcnn_mod, ref_cfg


def _randomize_bn_stats(model, rng):
    """BN running stats at init are (0, 1) on both sides — randomize them in
    the torch model so the conversion of mean/var is actually exercised."""
    for mod in model.modules():
        if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            mod.running_mean.copy_(torch.from_numpy(
                rng.normal(scale=0.3, size=mod.running_mean.shape)
                .astype(np.float32)))
            mod.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, size=mod.running_var.shape)
                .astype(np.float32)))


def test_rpn_forward_matches_reference(ref_env):
    """Backbone (4 MSG-SA + 4 FP) + cls/reg towers, eval mode."""
    rpn_mod, _, ref_cfg = ref_env
    saved = (ref_cfg.RPN.USE_INTENSITY, ref_cfg.RPN.LOC_XZ_FINE,
             ref_cfg.RPN.NUM_POINTS, list(ref_cfg.RPN.SA_CONFIG.NPOINTS))
    _set_rpn_cfg(ref_cfg)
    try:
        torch.manual_seed(0)
        ref = rpn_mod.RPN(use_xyz=True, mode="TEST")
        rng = np.random.default_rng(1)
        _randomize_bn_stats(ref, rng)
        with torch.no_grad():
            # undo the 0.001-std reg-head init so outputs carry O(0.1)
            # signal — otherwise the tolerance check would be vacuous
            ref.rpn_reg_layer[-1].conv.weight.mul_(200.0)
        ref = ref.eval()
        pts = np.asarray(
            rng.uniform([-30, -1, 0], [30, 3, 70], size=(2, N_PTS, 3)),
            np.float32)
        with torch.no_grad():
            out = ref({"pts_input": torch.from_numpy(pts)})
        ref_cls = out["rpn_cls"].numpy()
        ref_reg = out["rpn_reg"].numpy()
        # the full PointRCNN checkpoints prefix the submodule (point_rcnn.py
        # self.rpn = RPN(...)) — reproduce that container naming
        sd = {f"rpn.{k}": v.numpy() for k, v in ref.state_dict().items()
              if "loss_func" not in k}
    finally:
        (ref_cfg.RPN.USE_INTENSITY, ref_cfg.RPN.LOC_XZ_FINE,
         ref_cfg.RPN.NUM_POINTS) = saved[:3]
        ref_cfg.RPN.SA_CONFIG.NPOINTS = saved[3]

    ours_cfg = fresh_cfg()
    _set_rpn_cfg(ours_cfg)
    params, stats, missing = convert_state_dict(sd, ours_cfg)
    assert not missing, f"converter expected keys absent: {missing[:5]}"

    from tpu3d.models.rpn import RPN as OurRPN

    model = OurRPN(cfg=ours_cfg)
    got = jax.jit(lambda p: model.apply(p, pts, train=False))(
        {"params": params["rpn"], "batch_stats": stats["rpn"]})
    got_cls = np.asarray(got["rpn_cls"])
    got_reg = np.asarray(got["rpn_reg"])

    assert got_cls.shape == ref_cls.shape
    assert got_reg.shape == ref_reg.shape
    np.testing.assert_allclose(got_cls, ref_cls, atol=2e-3)
    np.testing.assert_allclose(got_reg, ref_reg, atol=2e-3)
    # and the agreement is meaningful, not two constant outputs (the cls
    # tower at random init clusters near the focal bias prior, so its
    # spread is small but nonzero)
    assert np.std(ref_cls) > 0.005 and np.std(ref_reg) > 0.05


def test_rcnn_forward_matches_reference(ref_env):
    """xyz-up + merge-down + 3 SA + cls/reg towers on pooled canonical
    input (ROI_SAMPLE_JIT=False eval path, rcnn_net.py:155-190)."""
    _, rcnn_mod, ref_cfg = ref_env
    saved_jit = ref_cfg.RCNN.ROI_SAMPLE_JIT
    ref_cfg.RCNN.ROI_SAMPLE_JIT = False
    try:
        torch.manual_seed(0)
        ref = rcnn_mod.RCNNNet(
            num_classes=2, input_channels=ref_cfg.RCNN.XYZ_UP_LAYER[-1],
            use_xyz=True)
        rng = np.random.default_rng(2)
        _randomize_bn_stats(ref, rng)
        with torch.no_grad():
            ref.reg_layer[-1].conv.weight.mul_(200.0)  # see RPN note
        ref = ref.eval()
        R, K = 6, int(ref_cfg.RCNN.NUM_POINTS)
        n_ext = (int(ref_cfg.RCNN.USE_INTENSITY)
                 + int(ref_cfg.RCNN.USE_MASK) + int(ref_cfg.RCNN.USE_DEPTH))
        xyz = rng.uniform(-2, 2, size=(R, K, 3)).astype(np.float32)
        extra = rng.uniform(0, 1, size=(R, K, n_ext)).astype(np.float32)
        feats = rng.normal(scale=0.5, size=(R, K, 128)).astype(np.float32)
        pts_input = np.concatenate([xyz, extra, feats], axis=-1)
        rois = np.zeros((R, 7), np.float32)
        with torch.no_grad():
            out = ref({"pts_input": torch.from_numpy(pts_input),
                       "roi_boxes3d": torch.from_numpy(rois)})
        ref_cls = out["rcnn_cls"].numpy()
        ref_reg = out["rcnn_reg"].numpy()
        sd = {f"rcnn_net.{k}": v.numpy()
              for k, v in ref.state_dict().items()
              if "loss_func" not in k and "proposal_target" not in k}
    finally:
        ref_cfg.RCNN.ROI_SAMPLE_JIT = saved_jit

    ours_cfg = fresh_cfg()
    params, stats, missing = convert_state_dict(sd, ours_cfg)
    assert not missing, f"converter expected keys absent: {missing[:5]}"

    from tpu3d.models.rcnn import RCNNNet as OurRCNN

    model = OurRCNN(cfg=ours_cfg, num_classes=2)
    variables = {"params": params["rcnn_net"]}
    if stats:
        variables["batch_stats"] = stats.get("rcnn_net", {})
    got = jax.jit(lambda v: model.apply(v, pts_input, train=False))(variables)
    got_cls = np.asarray(got["rcnn_cls"]).reshape(ref_cls.shape)
    got_reg = np.asarray(got["rcnn_reg"]).reshape(ref_reg.shape)

    np.testing.assert_allclose(got_cls, ref_cls, atol=2e-3)
    np.testing.assert_allclose(got_reg, ref_reg, atol=2e-3)
    assert np.std(ref_reg) > 0.01


def test_converted_checkpoint_loads_into_eval_state(ref_env, tmp_path):
    """convert_file's msgpack restores through load_checkpoint's structure
    fallback (no optimizer state in a converted torch checkpoint)."""
    rpn_mod, _, ref_cfg = ref_env
    import warnings

    import flax.serialization

    saved = (ref_cfg.RPN.USE_INTENSITY, ref_cfg.RPN.LOC_XZ_FINE,
             ref_cfg.RPN.NUM_POINTS, list(ref_cfg.RPN.SA_CONFIG.NPOINTS))
    _set_rpn_cfg(ref_cfg)
    try:
        torch.manual_seed(3)
        ref = rpn_mod.RPN(use_xyz=True, mode="TEST").eval()
        sd = {f"rpn.{k}": v.numpy() for k, v in ref.state_dict().items()
              if "loss_func" not in k}
    finally:
        (ref_cfg.RPN.USE_INTENSITY, ref_cfg.RPN.LOC_XZ_FINE,
         ref_cfg.RPN.NUM_POINTS) = saved[:3]
        ref_cfg.RPN.SA_CONFIG.NPOINTS = saved[3]

    ours_cfg = fresh_cfg()
    _set_rpn_cfg(ours_cfg)
    ours_cfg.RCNN.ENABLED = False
    params, stats, _ = convert_state_dict(sd, ours_cfg)
    payload = {"epoch": np.int32(7), "step": np.asarray(0, np.int32),
               "params": params, "batch_stats": stats}
    path = str(tmp_path / "converted.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))

    import jax.numpy as jnp

    from tpu3d.models.rpn import RPN as OurRPN
    from tpu3d.parallel import create_train_state
    from tpu3d.utils.checkpoint import load_checkpoint

    # template state over the same tree shape (model init)
    from tpu3d.models import PointRCNN

    model = PointRCNN(cfg=ours_cfg, mode="TRAIN")
    pts = np.zeros((1, N_PTS, 3), np.float32)
    state = create_train_state(
        ours_cfg, model,
        {"pts_input": pts,
         "rpn_cls_label": np.zeros((1, N_PTS), np.int32)},
        jax.random.PRNGKey(0), 2, 2)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        restored, epoch = load_checkpoint(path, state)
    assert epoch == 7
    leaf = restored.params["rpn"]["cls_head"]["out"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(leaf), params["rpn"]["cls_head"]["out"]["kernel"])
