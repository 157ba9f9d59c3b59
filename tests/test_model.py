"""Model tests: shapes, codec symmetry, losses, and a full joint forward+loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3d.config import fresh_cfg
from tpu3d.models import (
    PointRCNN,
    decode_bbox_target,
    model_loss,
    proposal_layer,
    reg_channels,
)
from tpu3d.models.losses import get_reg_loss


def small_cfg(rcnn=False):
    """A tiny config that exercises the full architecture quickly on CPU."""
    c = fresh_cfg()
    c.RPN.NUM_POINTS = 512
    c.RPN.SA_CONFIG.NPOINTS = [128, 32, 16, 8]
    c.RPN.SA_CONFIG.MLPS = [[[8, 8], [8, 8]], [[8, 16], [8, 16]],
                            [[16, 16], [16, 16]], [[16, 32], [16, 32]]]
    c.RPN.FP_MLPS = [[32, 32], [32, 32], [32, 32], [64, 64]]
    c.RPN.CLS_FC = [16]
    c.RPN.REG_FC = [16]
    c.RPN.USE_INTENSITY = False
    c.RPN.LOC_XZ_FINE = True
    c.RPN.LOSS_CLS = "SigmoidFocalLoss"
    c.TRAIN.RPN_PRE_NMS_TOP_N = 64
    c.TRAIN.RPN_POST_NMS_TOP_N = 16
    c.TEST.RPN_PRE_NMS_TOP_N = 64
    c.TEST.RPN_POST_NMS_TOP_N = 16
    if rcnn:
        c.RCNN.ENABLED = True
        c.RCNN.ROI_SAMPLE_JIT = True
        c.RCNN.NUM_POINTS = 32
        c.RCNN.ROI_PER_IMAGE = 8
        c.RCNN.ROI_FG_AUG_TIMES = 3
        c.RCNN.SA_CONFIG.NPOINTS = [16, 8, -1]
        c.RCNN.SA_CONFIG.NSAMPLE = [8, 8, 8]
        c.RCNN.SA_CONFIG.MLPS = [[16, 16], [16, 16], [16, 32]]
        c.RCNN.XYZ_UP_LAYER = [16, 16]
        c.RCNN.CLS_FC = [16]
        c.RCNN.REG_FC = [16]
    return c


def _pts(rng, b, n):
    pts = rng.uniform([-30, -1, 0], [30, 3, 70], size=(b, n, 3))
    return jnp.asarray(pts, jnp.float32)


def test_reg_channels():
    # RPN default: LOC_XZ_FINE=True (default.yaml): 12*4 + 12*2 + 3 + 1 = 76
    assert reg_channels(3.0, 0.5, 12, True) == 76
    # coarse: 12*2 + 24 + 4 = 52
    assert reg_channels(3.0, 0.5, 12, False) == 52
    # RCNN: per_loc_bin 6 -> 6*4 + 9*2 + 3 + 1 = 46
    assert reg_channels(1.5, 0.5, 9, True) == 46


def test_codec_roundtrip_encode_decode():
    """decode(perfect one-hot encoding of a target) must reproduce the target."""
    rng = np.random.default_rng(0)
    n = 64
    anchor = np.array([1.52, 1.63, 3.88], np.float32)
    loc_scope, loc_bin, head_bin = 3.0, 0.5, 12
    per_loc = int(loc_scope / loc_bin) * 2
    targets = np.zeros((n, 7), np.float32)
    targets[:, 0] = rng.uniform(-2.9, 2.9, n)  # dx
    targets[:, 1] = rng.uniform(-0.5, 0.5, n)  # dy
    targets[:, 2] = rng.uniform(-2.9, 2.9, n)  # dz
    targets[:, 3:6] = anchor * rng.uniform(0.9, 1.1, (n, 3))
    targets[:, 6] = rng.uniform(-np.pi, np.pi, n)

    # build an ideal prediction tensor
    C = reg_channels(loc_scope, loc_bin, head_bin, True)
    pred = np.full((n, C), -20.0, np.float32)
    x_shift = np.clip(targets[:, 0] + loc_scope, 0, loc_scope * 2 - 1e-3)
    z_shift = np.clip(targets[:, 2] + loc_scope, 0, loc_scope * 2 - 1e-3)
    x_bin = np.floor(x_shift / loc_bin).astype(int)
    z_bin = np.floor(z_shift / loc_bin).astype(int)
    pred[np.arange(n), x_bin] = 20.0
    pred[np.arange(n), per_loc + z_bin] = 20.0
    x_res = (x_shift - (x_bin * loc_bin + loc_bin / 2)) / loc_bin
    z_res = (z_shift - (z_bin * loc_bin + loc_bin / 2)) / loc_bin
    pred[:, per_loc * 2: per_loc * 3] = 0
    pred[:, per_loc * 3: per_loc * 4] = 0
    pred[np.arange(n), per_loc * 2 + x_bin] = x_res
    pred[np.arange(n), per_loc * 3 + z_bin] = z_res
    start = per_loc * 4
    pred[:, start] = targets[:, 1]
    start += 1
    angle_per = 2 * np.pi / head_bin
    heading = targets[:, 6] % (2 * np.pi)
    shift_angle = (heading + angle_per / 2) % (2 * np.pi)
    ry_bin = np.floor(shift_angle / angle_per).astype(int)
    ry_res = (shift_angle - (ry_bin * angle_per + angle_per / 2)) / (angle_per / 2)
    pred[np.arange(n), start + ry_bin] = 20.0
    pred[:, start + head_bin: start + head_bin * 2] = 0
    pred[np.arange(n), start + head_bin + ry_bin] = ry_res
    start += head_bin * 2
    pred[:, start: start + 3] = (targets[:, 3:6] - anchor) / anchor

    anchors_xyz = np.zeros((n, 3), np.float32)
    decoded = np.asarray(decode_bbox_target(
        jnp.asarray(anchors_xyz), jnp.asarray(pred), loc_scope, loc_bin,
        head_bin, jnp.asarray(anchor), get_xz_fine=True))
    np.testing.assert_allclose(decoded[:, 0], targets[:, 0], atol=1e-4)
    np.testing.assert_allclose(decoded[:, 2], targets[:, 2], atol=1e-4)
    np.testing.assert_allclose(decoded[:, 1], targets[:, 1], atol=1e-4)
    np.testing.assert_allclose(decoded[:, 3:6], targets[:, 3:6], atol=1e-4)
    # ry wraps to (-pi, pi]
    dry = np.abs(((decoded[:, 6] - targets[:, 6]) + np.pi) % (2 * np.pi) - np.pi)
    assert np.max(dry) < 1e-3


def test_reg_loss_zero_for_perfect_pred():
    """Encoding built in test above, fed to get_reg_loss, gives ~zero residual
    losses and tiny bin CE."""
    rng = np.random.default_rng(1)
    n = 16
    anchor = jnp.asarray([1.52, 1.63, 3.88])
    targets = np.zeros((n, 7), np.float32)
    targets[:, 0] = rng.uniform(-2.5, 2.5, n)
    targets[:, 2] = rng.uniform(-2.5, 2.5, n)
    targets[:, 3:6] = np.asarray(anchor)
    loss_loc, loss_angle, loss_size, d = get_reg_loss(
        jnp.zeros((n, 76)), jnp.asarray(targets), jnp.ones(n),
        loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12, anchor_size=anchor,
        get_xz_fine=True)
    # sizes exactly match anchor -> size loss 0
    assert float(loss_size) == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(float(loss_loc)) and np.isfinite(float(loss_angle))


def test_rpn_forward_shapes(rng):
    c = small_cfg()
    model = PointRCNN(cfg=c, mode="TRAIN")
    pts = _pts(rng, 2, c.RPN.NUM_POINTS)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {"pts_input": pts}, train=False)
    out = model.apply(variables, {"pts_input": pts}, train=False)
    assert out["rpn_cls"].shape == (2, 512, 1)
    assert out["rpn_reg"].shape == (2, 512, 76)
    assert out["backbone_features"].shape == (2, 512, 32)
    assert np.isfinite(np.asarray(out["rpn_cls"])).all()


def test_proposal_layer_shapes(rng):
    c = small_cfg()
    b, n = 2, 512
    scores = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    reg = jnp.asarray(rng.normal(scale=0.1, size=(b, n, 76)), jnp.float32)
    xyz = _pts(rng, b, n)
    rois, roi_scores, roi_valid = proposal_layer(scores, reg, xyz, c, "TEST")
    assert rois.shape == (b, 16, 7)
    assert roi_scores.shape == (b, 16)
    assert bool(roi_valid.any())
    # valid rois have positive sizes
    v = np.asarray(roi_valid)
    sizes = np.asarray(rois)[v][:, 3:6]
    assert (sizes > 0).all()


def test_joint_forward_and_loss(rng):
    c = small_cfg(rcnn=True)
    model = PointRCNN(cfg=c, mode="TRAIN")
    b, n = 2, c.RPN.NUM_POINTS
    pts = _pts(rng, b, n)
    gt = np.zeros((b, 5, 7), np.float32)
    gt[:, 0] = [0, 1.6, 20, 1.5, 1.6, 3.9, 0.3]
    gt[:, 1] = [-5, 1.6, 30, 1.5, 1.6, 3.9, -1.0]
    input_dict = {"pts_input": pts, "gt_boxes3d": jnp.asarray(gt)}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "target": jax.random.PRNGKey(2)}
    variables = model.init(rngs, input_dict, train=True)
    out, mutated = model.apply(
        variables, input_dict, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3), "target": jax.random.PRNGKey(4)})
    R = c.RCNN.ROI_PER_IMAGE
    assert out["rois"].shape == (b, 16, 7)
    assert out["rcnn_cls"].shape == (b * R, 1)
    assert out["rcnn_reg"].shape == (b * R, 46)
    assert out["cls_label"].shape == (b * R,)

    # labels for rpn loss: points near gt cars are fg
    rpn_cls_label = jnp.asarray(
        rng.integers(-1, 2, size=(b, n)), jnp.int32)
    rpn_reg_label = jnp.asarray(rng.normal(scale=0.3, size=(b, n, 7)),
                                jnp.float32)
    data = {"rpn_cls_label": rpn_cls_label, "rpn_reg_label": rpn_reg_label}
    loss, tb = model_loss(c, out, data)
    assert np.isfinite(float(loss))
    assert "rpn_loss" in tb and "rcnn_loss" in tb

    # gradient flows
    def loss_fn(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            input_dict, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3),
                  "target": jax.random.PRNGKey(4)})[0]
        return model_loss(c, o, data)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.square(x)), grads, 0.0) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0


def test_eval_forward(rng):
    c = small_cfg(rcnn=True)
    model = PointRCNN(cfg=c, mode="TEST")
    b, n = 2, c.RPN.NUM_POINTS
    pts = _pts(rng, b, n)
    input_dict = {"pts_input": pts}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "target": jax.random.PRNGKey(2)}
    variables = model.init(rngs, input_dict, train=False)
    out = model.apply(variables, input_dict, train=False)
    m = c.TEST.RPN_POST_NMS_TOP_N
    assert out["rois"].shape == (b, m, 7)
    assert out["rcnn_cls"].shape == (b * m, 1)
    assert np.isfinite(np.asarray(out["rcnn_reg"])).all()


def test_rcnn_canonical_decode_roundtrip():
    """The full RCNN target chain must be self-consistent: proposal_target's
    canonical gt encoding (proposal_target.py:269-275) -> the loss's bin
    targets (losses.py get_reg_loss rules) -> eval's decode_bbox_target with a
    7-col ROI must reproduce the world-frame gt box (heading mod pi: the
    ry-fine opposite flip is direction-ambiguous by design)."""
    from tpu3d.ops.box_geometry import rotate_points_along_y
    from tpu3d.ops.rotated_iou import boxes_iou3d

    rng = np.random.default_rng(7)
    n = 64
    gt = np.zeros((n, 7), np.float32)
    gt[:, 0] = rng.uniform(-30, 30, n)
    gt[:, 1] = rng.uniform(0.5, 2.0, n)
    gt[:, 2] = rng.uniform(5, 60, n)
    gt[:, 3] = rng.uniform(1.4, 1.8, n)
    gt[:, 4] = rng.uniform(1.5, 1.8, n)
    gt[:, 5] = rng.uniform(3.5, 4.5, n)
    gt[:, 6] = rng.uniform(-np.pi, np.pi, n)
    roi = gt.copy()
    roi[:, 0:3] += rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    roi[:, 3:6] *= rng.uniform(0.95, 1.05, (n, 3)).astype(np.float32)
    roi[:, 6] += rng.uniform(-0.15, 0.15, n).astype(np.float32)

    roi_j, gt_j = jnp.asarray(roi), jnp.asarray(gt)
    roi_ry = roi_j[:, 6] % (2 * np.pi)
    gt_ct = gt_j.at[:, 0:3].add(-roi_j[:, 0:3]).at[:, 6].add(-roi_ry)
    gt_ct = np.asarray(rotate_points_along_y(gt_ct, roi_ry))

    loc_scope, loc_bin, head_bin = 1.5, 0.5, 9
    per_loc = int(loc_scope / loc_bin) * 2
    anchor = np.array([1.526, 1.629, 3.883], np.float32)
    pred = np.full((n, reg_channels(loc_scope, loc_bin, head_bin, True)),
                   -20.0, np.float32)
    x_shift = np.clip(gt_ct[:, 0] + loc_scope, 0, loc_scope * 2 - 1e-3)
    z_shift = np.clip(gt_ct[:, 2] + loc_scope, 0, loc_scope * 2 - 1e-3)
    x_bin = np.floor(x_shift / loc_bin).astype(int)
    z_bin = np.floor(z_shift / loc_bin).astype(int)
    pred[np.arange(n), x_bin] = 20.0
    pred[np.arange(n), per_loc + z_bin] = 20.0
    pred[:, per_loc * 2: per_loc * 4] = 0.0
    pred[np.arange(n), per_loc * 2 + x_bin] = (
        x_shift - (x_bin * loc_bin + loc_bin / 2)) / loc_bin
    pred[np.arange(n), per_loc * 3 + z_bin] = (
        z_shift - (z_bin * loc_bin + loc_bin / 2)) / loc_bin
    start = per_loc * 4
    pred[:, start] = gt_ct[:, 1]
    start += 1
    angle_per = (np.pi / 2) / head_bin
    ry_l = gt_ct[:, 6] % (2 * np.pi)
    opposite = (ry_l > np.pi * 0.5) & (ry_l < np.pi * 1.5)
    ry_l = np.where(opposite, (ry_l + np.pi) % (2 * np.pi), ry_l)
    shift_angle = np.clip((ry_l + np.pi * 0.5) % (2 * np.pi) - np.pi * 0.25,
                          1e-3, np.pi * 0.5 - 1e-3)
    ry_bin = np.floor(shift_angle / angle_per).astype(int)
    pred[np.arange(n), start + ry_bin] = 20.0
    pred[:, start + head_bin: start + head_bin * 2] = 0.0
    pred[np.arange(n), start + head_bin + ry_bin] = (
        shift_angle - (ry_bin * angle_per + angle_per / 2)) / (angle_per / 2)
    start += head_bin * 2
    pred[:, start: start + 3] = (gt_ct[:, 3:6] - anchor) / anchor

    dec = np.asarray(decode_bbox_target(
        roi_j, jnp.asarray(pred), loc_scope, loc_bin, head_bin,
        jnp.asarray(anchor), get_xz_fine=True, get_ry_fine=True))
    np.testing.assert_allclose(dec[:, 0:3], gt[:, 0:3], atol=2e-2)
    np.testing.assert_allclose(dec[:, 3:6], gt[:, 3:6], atol=1e-2)
    dry = np.abs(((dec[:, 6] - gt[:, 6]) + np.pi / 2) % np.pi - np.pi / 2)
    assert dry.max() < 2e-2
    diag = np.diag(np.asarray(boxes_iou3d(jnp.asarray(dec), gt_j)))
    assert diag.min() > 0.97


def test_remat_grads_match_nonremat(rng):
    """TRAIN.REMAT must not change the math: loss and gradients of the jitted
    train step are identical (up to float assoc) with and without
    rematerialization."""
    import jax
    import jax.numpy as jnp

    from tpu3d.models import PointRCNN, model_loss

    losses, grads = [], []
    pts = _pts(rng, 2, small_cfg().RPN.NUM_POINTS)
    for remat in (False, True):
        c = small_cfg()
        c.TRAIN.REMAT = remat
        model = PointRCNN(cfg=c, mode="TRAIN")
        batch = {
            "rpn_cls_label": jnp.zeros((2, c.RPN.NUM_POINTS), jnp.int32),
            "rpn_reg_label": jnp.zeros((2, c.RPN.NUM_POINTS, 7), jnp.float32),
        }
        variables = jax.jit(lambda r: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1),
             "target": jax.random.PRNGKey(2)}, {"pts_input": r},
            train=True))(pts)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                {"pts_input": pts}, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3),
                      "target": jax.random.PRNGKey(4)})
            loss, _ = model_loss(c, out, batch)
            return loss

        l, g = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
        losses.append(float(l))
        grads.append(g)
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
    flat0 = jax.tree_util.tree_leaves(grads[0])
    flat1 = jax.tree_util.tree_leaves(grads[1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_param_tree_independent_of_input_size(rng):
    """The pre-grouped SA execution strategy (picked by a static-shape
    condition) must NOT change the parameter tree: a model init'd at one N
    restores/applies at any other N (ADVICE r2 medium)."""
    from tpu3d.models.pointnet2 import PointnetSAModuleMSG

    mod = PointnetSAModuleMSG(npoint=16, radii=(0.4, 0.8), nsamples=(8, 16),
                              mlps=((8, 8), (8, 16)))
    k = jax.random.PRNGKey(0)
    xyz_small = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    feats_small = jnp.asarray(rng.standard_normal((2, 32, 4)), jnp.float32)
    xyz_big = jnp.asarray(rng.standard_normal((2, 1024, 3)), jnp.float32)
    feats_big = jnp.asarray(rng.standard_normal((2, 1024, 4)), jnp.float32)
    # 16*16 > 32 -> pregroup path; 16*8 <= 1024 -> plain path
    v_pre = mod.init(k, xyz_small, feats_small)
    v_plain = mod.init(k, xyz_big, feats_big)
    paths = lambda v: set(jax.tree_util.tree_flatten_with_path(v)[0] and
                          [jax.tree_util.keystr(p) for p, _ in
                           jax.tree_util.tree_flatten_with_path(v)[0]])
    assert paths(v_pre) == paths(v_plain)
    # cross-apply: params init'd at the pregroup shape run the plain shape
    out = mod.apply(v_pre, xyz_big, feats_big)
    assert out[1].shape == (2, 16, 8 + 16)
    out_pre = mod.apply(v_pre, xyz_small, feats_small)
    assert out_pre[1].shape == (2, 16, 8 + 16)
    assert np.isfinite(np.asarray(out_pre[1])).all()
    # both strategies compute the same function from the same params
    for kwargs in ({"force_pregroup": True}, {"force_pregroup": False}):
        alt = PointnetSAModuleMSG(npoint=16, radii=(0.4, 0.8),
                                  nsamples=(8, 16), mlps=((8, 8), (8, 16)),
                                  **kwargs)
        out_alt = alt.apply(v_pre, xyz_small, feats_small)
        np.testing.assert_allclose(np.asarray(out_alt[1]),
                                   np.asarray(out_pre[1]),
                                   rtol=1e-5, atol=1e-5)


def test_pregroup_checkpoint_migration():
    """Old (round-2) mlp_i_pre_kernel/_pre_bn/_rest checkpoint trees migrate
    into the unified mlp_i/dense_j layout, including nested optimizer-state
    mirrors."""
    from tpu3d.utils.checkpoint import migrate_pregroup_params

    old = {
        "sa_0": {
            # bias listed BEFORE kernel (msgpack sorts keys): the merge must
            # not clobber the partially-built dense_0 dict
            "mlp_0_pre_bias": np.zeros(8),
            "mlp_0_pre_kernel": np.ones((7, 8)),
            "mlp_0_pre_bn": {"scale": np.ones(8), "bias": np.zeros(8)},
            "mlp_0_rest": {
                "dense_0": {"kernel": np.ones((8, 8))},
                "bn_0": {"scale": np.ones(8), "bias": np.zeros(8)},
            },
            "mlp_1": {"dense_0": {"kernel": np.ones((7, 16))}},
        },
        "mu": {"sa_0": {"mlp_0_pre_kernel": np.zeros((7, 8))}},
    }
    new = migrate_pregroup_params(old)
    assert "mlp_0_pre_kernel" not in new["sa_0"]
    assert new["sa_0"]["mlp_0"]["dense_0"]["kernel"].shape == (7, 8)
    assert new["sa_0"]["mlp_0"]["dense_0"]["bias"].shape == (8,)
    assert new["sa_0"]["mlp_0"]["bn_0"]["scale"].shape == (8,)
    assert new["sa_0"]["mlp_0"]["dense_1"]["kernel"].shape == (8, 8)
    assert new["sa_0"]["mlp_0"]["bn_1"]["scale"].shape == (8,)
    assert new["sa_0"]["mlp_1"]["dense_0"]["kernel"].shape == (7, 16)
    assert new["mu"]["sa_0"]["mlp_0"]["dense_0"]["kernel"].shape == (7, 8)
