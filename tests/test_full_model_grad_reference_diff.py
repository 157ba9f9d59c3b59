"""Full-network GRADIENT differentials vs the reference's executed torch
backward, with weights converted by tpu3d.tools.convert_torch_ckpt.

The round-4 state had every numeric leg diffed except one: the composition
of all custom VJPs through the real network had never been compared to the
reference's executed backward (loss-assembly diff, optimizer-trajectory
diff on a proxy net, whole-network FORWARD diff, and per-op VJP tests all
existed, but not torch `loss.backward()` through RPN/RCNNNet vs `jax.grad`
of our networks). This file closes that leg.

Protocol: build the reference's own `lib/net/rpn.py RPN` / `lib/net/
rcnn_net.py RCNNNet` from source on CPU torch (CUDA neighbor ops replaced
by tests/_ref_pointnet2_shim.py so both sides make IDENTICAL picks), run a
fixed linear probe loss  L = sum(cls·A)/|A| + sum(reg·B)/|B|  with frozen
random cotangent carriers A, B, call `loss.backward()`, and convert the
resulting `.grad` tensors through the SAME `convert_state_dict` mapping as
the weights (the mapping is linear — transposes/reshapes — so it maps
gradients exactly as it maps parameters). Compare tensor-by-tensor against
`jax.grad` of the identical probe through our flax networks on the
converted weights. Train-mode BN (batch statistics in the backward) on the
RPN; the RCNN tower is BN-free per the reference default (config.py:107).

A third test forces the fused Pallas SA slab kernels + their custom VJPs
ON (TPU3D_FORCE_FUSED_SA=1, interpret mode off-TPU) so the hand-written
3-pass backward is validated against the reference's autograd *in
composition*, not just against per-op oracles.

References: lib/net/train_functions.py:9-213 (the backward this models),
tools/train_utils/train_utils.py:128-138 (loss.backward -> clip -> step),
lib/net/rpn.py:11-76, lib/net/rcnn_net.py:14-190,
pointnet2_lib/pointnet2/{pointnet2_modules,pytorch_utils}.py.
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
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from _ref_shims import (easydict_module, modules_swapped,  # noqa: E402
                        torch_cpu_shims)

from tpu3d.config import fresh_cfg  # noqa: E402
from tpu3d.tools.convert_torch_ckpt import convert_state_dict  # noqa: E402

REF_PRCNN = "/root/reference/pointrcnn"

# small-but-real shapes: full 4-level MSG pyramid, CPU-feasible
N_PTS = 2048
NPOINTS = [512, 128, 32, 8]


@pytest.fixture(scope="module", autouse=True)
def _ref_ball_query_semantics():
    """Train-mode BN batch statistics see the grouped slab's pad-slot
    MULTISET (eval BN and the max-pool don't), so the gradient differential
    needs our grouping to reproduce the CUDA ball query's first-hit fill
    exactly — not just the same pick sets (pointnet2.py TPU3D_REF_BALL_QUERY
    comment; found by test_rpn_train_forward_matches_reference)."""
    os.environ["TPU3D_REF_BALL_QUERY"] = "1"
    yield
    os.environ.pop("TPU3D_REF_BALL_QUERY", None)


def _set_rpn_cfg(c):
    c.RPN.USE_INTENSITY = False
    c.RPN.LOC_XZ_FINE = True
    c.RPN.NUM_POINTS = N_PTS
    c.RPN.SA_CONFIG.NPOINTS = list(NPOINTS)
    # identity dropout on both sides: keeps the reference's Sequential
    # indexing (DP_RATIO >= 0 splices the layer, rpn.py:26-28) while making
    # the train-mode backward deterministic
    c.RPN.DP_RATIO = 0.0


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


def _grads_as_state_dict(model, prefix, dtype=np.float32):
    """Collect parameter gradients under the reference's checkpoint naming,
    plus zero 'gradients' for the BN running-stat buffers so the converter's
    expected-key audit stays satisfied (running stats have no grads; the
    zeros land in the batch_stats tree, which the comparison ignores)."""
    sd = {}
    for name, p in model.named_parameters():
        if "loss_func" in name:
            continue
        g = p.grad
        sd[f"{prefix}.{name}"] = (np.zeros(tuple(p.shape), dtype)
                                  if g is None else
                                  g.detach().numpy().astype(dtype))
    for name, b in model.named_buffers():
        if name.endswith("running_mean") or name.endswith("running_var"):
            sd[f"{prefix}.{name}"] = np.zeros(tuple(b.shape), dtype)
    return sd


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _compare_grad_trees(ours, ref, rtol, label, scale_floor=0.0):
    """Per-tensor relative max-abs-diff, normalized by the reference
    tensor's own max magnitude (gradient scales vary by orders of magnitude
    across layers; a global atol would be vacuous for the small ones).
    ``scale_floor``: fraction of the GLOBAL max grad magnitude used as a
    per-tensor scale floor — for bf16 comparisons, whose noise is absolute
    (activation-scale), a tensor whose own grads are tiny would otherwise
    report pure cancellation noise as O(1) relative error."""
    fo, fr = _flatten(ours), _flatten(ref)
    assert set(fo) == set(fr), (
        f"{label}: tree mismatch: only-ours={sorted(set(fo)-set(fr))[:4]} "
        f"only-ref={sorted(set(fr)-set(fo))[:4]}")
    report = bool(os.environ.get("TPU3D_GRAD_DIFF_REPORT"))
    gmax = max(np.abs(v).max() for v in fr.values())
    worst = (None, 0.0)
    for k in sorted(fr):
        a, b = fo[k], fr[k]
        assert a.shape == b.shape, (label, k, a.shape, b.shape)
        scale = max(np.abs(b).max(), scale_floor * gmax)
        if scale < 1e-12:  # both must then be ~zero
            assert np.abs(a).max() < 1e-9, (label, k)
            continue
        rel = np.abs(a - b).max() / scale
        if rel > worst[1]:
            worst = (k, rel)
        if report:
            print(f"{label}: {k:60s} rel {rel:.2e} scale {scale:.2e}")
            continue
        assert rel < rtol, (
            f"{label}: {k} rel err {rel:.2e} (scale {scale:.2e}) >= {rtol}")
    if report:
        assert worst[1] < rtol, f"{label}: worst {worst}"
    return worst


def _probe_torch(out_cls, out_reg, A, B):
    return ((out_cls * torch.from_numpy(A)).sum() / A.size
            + (out_reg * torch.from_numpy(B)).sum() / B.size)


def _probe_jax(out_cls, out_reg, A, B):
    return (jnp.sum(out_cls * A) / A.size + jnp.sum(out_reg * B) / B.size)


@pytest.fixture(scope="module")
def x64_mode():
    """float64 on BOTH sides makes the RPN differential decisive: the
    train-mode BN chain amplifies f32 noise (ReLU gate flips at ~0
    pre-activations, near-eps variances) into 1e-2-scale gradient scatter
    that could mask a real VJP bug; in f64 the noise floor drops ~8 orders
    while a wrong/missing VJP term stays O(1)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def rpn_case(ref_env, x64_mode):
    """One reference-RPN train-mode backward (float64), shared by the grad
    tests: (converted weights/stats, converted reference grads, inputs,
    probes)."""
    rpn_mod, _, ref_cfg = ref_env
    saved = (ref_cfg.RPN.USE_INTENSITY, ref_cfg.RPN.LOC_XZ_FINE,
             ref_cfg.RPN.NUM_POINTS, list(ref_cfg.RPN.SA_CONFIG.NPOINTS),
             ref_cfg.RPN.DP_RATIO)
    _set_rpn_cfg(ref_cfg)
    try:
        torch.manual_seed(0)
        ref = rpn_mod.RPN(use_xyz=True, mode="TRAIN")
        rng = np.random.default_rng(11)
        with torch.no_grad():
            # undo the 0.001-std reg-head init so the reg branch carries
            # O(0.1) signal into the probe (same trick as the forward diff)
            ref.rpn_reg_layer[-1].conv.weight.mul_(200.0)
        ref = ref.double().train()
        # Dense box (~16 pts/m³): every SA level keeps non-degenerate
        # neighborhoods. At scene-sparse density the deep levels go
        # self-hit-only, the grouped slab becomes channel-CONSTANT, and
        # train-mode BN turns into a ×1/sqrt(eps) amplifier of cross-
        # framework float noise (torch: exactly-constant -> exactly 0; ours:
        # constant + 1e-4 noise -> O(1)) — a degenerate-regime artifact that
        # would drown the differential, not a gradient bug.
        pts = np.asarray(
            rng.uniform([-4, -1, 0], [4, 1, 8], size=(2, N_PTS, 3)),
            np.float32).astype(np.float64)
        out = ref({"pts_input": torch.from_numpy(pts)})
        A = rng.normal(size=out["rpn_cls"].shape)
        B = rng.normal(size=out["rpn_reg"].shape)
        loss = _probe_torch(out["rpn_cls"], out["rpn_reg"], A, B)
        loss.backward()
        ref_out = {k: out[k].detach().numpy() for k in ("rpn_cls", "rpn_reg")}
        sd_w = {f"rpn.{k}": v.numpy() for k, v in ref.state_dict().items()
                if "loss_func" not in k}
        sd_g = _grads_as_state_dict(ref, "rpn", dtype=np.float64)
    finally:
        (ref_cfg.RPN.USE_INTENSITY, ref_cfg.RPN.LOC_XZ_FINE,
         ref_cfg.RPN.NUM_POINTS) = saved[:3]
        ref_cfg.RPN.SA_CONFIG.NPOINTS = saved[3]
        ref_cfg.RPN.DP_RATIO = saved[4]

    ours_cfg = fresh_cfg()
    _set_rpn_cfg(ours_cfg)
    # f32 reference-parity training numerics (config.py comments): the bf16
    # activation/matmul casts are the TPU production default, not a numeric
    # claim; the fused-SA test re-enables them under a bf16-scale tolerance.
    ours_cfg.TRAIN.BF16_ACTIVATIONS = False
    ours_cfg.TRAIN.BF16_MATMULS = False
    params, stats, missing = convert_state_dict(sd_w, ours_cfg)
    assert not missing, f"weight conversion missing keys: {missing[:5]}"
    gparams, _, gmissing = convert_state_dict(sd_g, ours_cfg)
    assert not gmissing, f"grad conversion missing keys: {gmissing[:5]}"
    return ours_cfg, params, stats, gparams, pts, A, B, ref_out


def test_rpn_train_forward_matches_reference(rpn_case):
    """TRAIN-mode forward (BN batch statistics) parity — localizes any grad
    divergence: if this fails the issue is batch-stat semantics, not VJPs."""
    ours_cfg, params, stats, _, pts, _, _, ref_out = rpn_case
    from tpu3d.models.rpn import RPN as OurRPN

    model = OurRPN(cfg=ours_cfg)
    out, _ = jax.jit(lambda p: model.apply(
        {"params": p, "batch_stats": stats["rpn"]}, pts, train=True,
        mutable=["batch_stats"]))(params["rpn"])
    for k in ("rpn_cls", "rpn_reg"):
        got = np.asarray(out[k]).reshape(ref_out[k].shape)
        scale = np.abs(ref_out[k]).max()
        rel = np.abs(got - ref_out[k]).max() / scale
        assert rel < 1e-9, f"train-fwd {k}: rel {rel:.2e} (scale {scale:.2e})"


def test_rpn_grad_matches_reference(rpn_case):
    """jax.grad through our RPN (4 MSG-SA + 4 FP + towers, TRAIN-mode BN)
    == the reference's executed loss.backward(), tensor by tensor."""
    ours_cfg, params, stats, gparams, pts, A, B, _ = rpn_case
    from tpu3d.models.rpn import RPN as OurRPN

    model = OurRPN(cfg=ours_cfg)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats["rpn"]}, pts, train=True,
            mutable=["batch_stats"])
        return _probe_jax(out["rpn_cls"], out["rpn_reg"], A, B)

    g = jax.jit(jax.grad(loss_fn))(params["rpn"])
    g = jax.tree_util.tree_map(np.asarray, g)

    # nonvacuous: the probe actually excites the network
    gmax = max(np.abs(v).max() for v in _flatten(gparams["rpn"]).values())
    assert gmax > 1e-3, f"reference grads are ~zero (max {gmax:.1e})"
    worst = _compare_grad_trees(g, gparams["rpn"], rtol=1e-9,
                                label="rpn-grad")
    # record the margin in the failure-free case too (visible with -rA)
    print(f"rpn grad worst rel err: {worst[1]:.2e} at {worst[0]}")


@pytest.fixture(scope="module")
def rcnn_case(ref_env):
    _, rcnn_mod, ref_cfg = ref_env
    saved_jit = ref_cfg.RCNN.ROI_SAMPLE_JIT
    ref_cfg.RCNN.ROI_SAMPLE_JIT = False
    try:
        torch.manual_seed(0)
        ref = rcnn_mod.RCNNNet(
            num_classes=2, input_channels=ref_cfg.RCNN.XYZ_UP_LAYER[-1],
            use_xyz=True)
        rng = np.random.default_rng(12)
        with torch.no_grad():
            ref.reg_layer[-1].conv.weight.mul_(200.0)
        ref = ref.train()  # RCNN tower has no BN (config.py:107), DP 0.0
        R, K = 6, int(ref_cfg.RCNN.NUM_POINTS)
        n_ext = (int(ref_cfg.RCNN.USE_INTENSITY)
                 + int(ref_cfg.RCNN.USE_MASK) + int(ref_cfg.RCNN.USE_DEPTH))
        xyz = rng.uniform(-2, 2, size=(R, K, 3)).astype(np.float32)
        extra = rng.uniform(0, 1, size=(R, K, n_ext)).astype(np.float32)
        feats = rng.normal(scale=0.5, size=(R, K, 128)).astype(np.float32)
        pts_input = np.concatenate([xyz, extra, feats], axis=-1)
        rois = np.zeros((R, 7), np.float32)
        # train mode passes the target tensors through untouched
        # (rcnn_net.py:157-163) — they never enter the compute graph
        out = ref({"pts_input": torch.from_numpy(pts_input),
                   "roi_boxes3d": torch.from_numpy(rois),
                   "cls_label": torch.zeros(R),
                   "reg_valid_mask": torch.zeros(R),
                   "gt_boxes3d_ct": torch.zeros(R, 7)})
        A = rng.normal(size=out["rcnn_cls"].shape).astype(np.float32)
        B = rng.normal(size=out["rcnn_reg"].shape).astype(np.float32)
        loss = _probe_torch(out["rcnn_cls"], out["rcnn_reg"], A, B)
        loss.backward()
        sd_w = {f"rcnn_net.{k}": v.numpy()
                for k, v in ref.state_dict().items()
                if "loss_func" not in k and "proposal_target" not in k}
        sd_g = _grads_as_state_dict(ref, "rcnn_net")
        sd_g = {k: v for k, v in sd_g.items() if "proposal_target" not in k}
    finally:
        ref_cfg.RCNN.ROI_SAMPLE_JIT = saved_jit

    ours_cfg = fresh_cfg()
    ours_cfg.TRAIN.BF16_ACTIVATIONS = False
    ours_cfg.TRAIN.BF16_MATMULS = False
    params, stats, missing = convert_state_dict(sd_w, ours_cfg)
    assert not missing, f"weight conversion missing keys: {missing[:5]}"
    gparams, _, gmissing = convert_state_dict(sd_g, ours_cfg)
    assert not gmissing, f"grad conversion missing keys: {gmissing[:5]}"
    return ours_cfg, params, stats, gparams, pts_input, A, B


def _our_rcnn_grads(ours_cfg, params, stats, pts_input, A, B):
    from tpu3d.models.rcnn import RCNNNet as OurRCNN

    model = OurRCNN(cfg=ours_cfg, num_classes=2)

    def loss_fn(p):
        variables = {"params": p}
        if stats and stats.get("rcnn_net"):
            variables["batch_stats"] = stats["rcnn_net"]
        out = model.apply(variables, pts_input, train=True,
                          mutable=False)
        cls = out["rcnn_cls"].reshape(A.shape)
        reg = out["rcnn_reg"].reshape(B.shape)
        return _probe_jax(cls, reg, A, B)

    g = jax.jit(jax.grad(loss_fn))(params["rcnn_net"])
    return jax.tree_util.tree_map(np.asarray, g)


def test_rcnn_grad_matches_reference(rcnn_case):
    """jax.grad through our RCNNNet (xyz-up + merge-down + 3 SA + towers)
    == the reference's executed backward on the pooled-canonical path."""
    ours_cfg, params, stats, gparams, pts_input, A, B = rcnn_case
    g = _our_rcnn_grads(ours_cfg, params, stats, pts_input, A, B)
    gmax = max(np.abs(v).max()
               for v in _flatten(gparams["rcnn_net"]).values())
    assert gmax > 1e-3, f"reference grads are ~zero (max {gmax:.1e})"
    worst = _compare_grad_trees(g, gparams["rcnn_net"], rtol=5e-3,
                                label="rcnn-grad")
    print(f"rcnn grad worst rel err: {worst[1]:.2e} at {worst[0]}")


def test_rcnn_grad_fused_sa_matches_reference(rcnn_case, monkeypatch):
    """The fused Pallas SA slab kernels' hand-written 3-pass backward, IN
    COMPOSITION through the whole RCNNNet, against the reference's
    autograd. TPU3D_FORCE_FUSED_SA=1 engages the fused path off-TPU
    (interpret mode). The kernels are intrinsically bf16 (activations and
    weight feeds are cast for the MXU; fused_sa.py), so the tolerance is
    bf16-scale: the measured noise profile tops out at ~0.22 relative on
    small-scale SA-tower biases (absolute ~3e-3 — consistent with 2^-8
    rounding through fwd+bwd chains). What this catches is structural — a
    wrong/missing VJP term shows up as O(1) on LARGE-scale tensors — while
    the exact per-op backward is separately pinned f32-tight by
    test_fused_sa.py."""
    _, params, stats, gparams, pts_input, A, B = rcnn_case
    bf16_cfg = fresh_cfg()  # production numerics: bf16 acts/matmuls ON
    monkeypatch.setenv("TPU3D_FORCE_FUSED_SA", "1")
    g = _our_rcnn_grads(bf16_cfg, params, stats, pts_input, A, B)
    worst = _compare_grad_trees(g, gparams["rcnn_net"], rtol=0.30,
                                label="rcnn-grad-fused", scale_floor=0.02)
    print(f"rcnn fused-SA grad worst rel err: {worst[1]:.2e} at {worst[0]}")
