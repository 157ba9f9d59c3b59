"""RCNN refinement head: canonical-frame per-ROI PointNet encoder + cls/reg.

Reference parity: lib/net/rcnn_net.py. Input is the pooled, canonically-rotated
per-ROI point set (B·R, K, 3 + C_extra + C_rpn); the xyz-up/merge-down feature
fusion and the 3 single-scale SA stages mirror the reference, with the final SA
being a GroupAll.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.config import as_attrdict
from .bbox_codec import reg_channels
from .pointnet2 import PointnetSAModule, SharedMLP
from .rpn import HeadMLP


class RCNNNet(nn.Module):
    cfg: dict
    num_classes: int = 2

    @nn.compact
    def __call__(self, pts_input, train: bool = False, bn_momentum=0.9):
        """pts_input (M, K, input_ch) where the first
        3 + use_intensity + use_mask + use_depth channels are the "xyz block"
        (reference: rcnn_net.py:22-24, 167-179) — or a ``(xyz (M, K, 3),
        rest (M, K, input_ch - 3))`` tuple, which keeps the bf16 pooled
        features apart from the f32 coordinates (no promoting concat).
        Returns dict(rcnn_cls (M, 1), rcnn_reg (M, C))."""
        full = as_attrdict(self.cfg)
        c = full.RCNN
        # bf16 Dense compute: inference via cfg.BF16_INFERENCE, training via
        # cfg.TRAIN.BF16_MATMULS (the RCNN stack is all-canonical — per-ROI
        # coordinates are a few metres — so every layer is bf16-safe)
        dt = None
        if not train and bool(full.get("BF16_INFERENCE", False)):
            dt = jnp.bfloat16
        elif (train and jax.default_backend() == "tpu"
              and bool(full.TRAIN.get("BF16_MATMULS", True))):
            dt = jnp.bfloat16
        # heads stay f32 in training (see rpn.py head_dt rationale)
        head_dt = dt if not train else None
        if isinstance(pts_input, tuple):
            xyz, rest = pts_input
        else:
            xyz, rest = pts_input[..., 0:3], pts_input[..., 3:]

        if c.USE_RPN_FEATURES:
            n_ext = int(c.USE_INTENSITY) + int(c.USE_MASK) + int(c.USE_DEPTH)
            xyz_block = jnp.concatenate(
                [xyz, rest[..., 0:n_ext].astype(xyz.dtype)], axis=-1)
            rpn_feats = rest[..., n_ext:]
            xyz_feature = SharedMLP(tuple(c.XYZ_UP_LAYER), bn=c.USE_BN,
                                    dtype=dt, name="xyz_up")(
                xyz_block, train=train, bn_momentum=bn_momentum)
            merged = jnp.concatenate(
                [xyz_feature, rpn_feats.astype(xyz_feature.dtype)], axis=-1)
            features = SharedMLP((c.XYZ_UP_LAYER[-1],), bn=c.USE_BN,
                                 dtype=dt, name="merge_down")(
                merged, train=train, bn_momentum=bn_momentum)
        else:
            features = rest

        l_xyz, l_features = xyz, features
        for k in range(len(c.SA_CONFIG.NPOINTS)):
            npoint = c.SA_CONFIG.NPOINTS[k] if c.SA_CONFIG.NPOINTS[k] != -1 else None
            l_xyz, l_features = PointnetSAModule(
                npoint=npoint, radii=(float(c.SA_CONFIG.RADIUS[k]),),
                nsamples=(int(c.SA_CONFIG.NSAMPLE[k]),),
                mlps=(tuple(c.SA_CONFIG.MLPS[k]),),
                use_xyz=True, bn=c.USE_BN, query_chunk=None, dtype=dt,
                canonical=True,  # per-ROI frame: |xyz| <= a few metres
                train_bf16=bool(full.TRAIN.get("BF16_ACTIVATIONS", True)),
                name=f"sa_{k}")(
                    l_xyz, l_features, train=train, bn_momentum=bn_momentum)

        feat = l_features[:, 0, :]  # (M, C) — final GroupAll leaves one group

        cls_channel = 1 if self.num_classes == 2 else self.num_classes
        rcnn_cls = HeadMLP(hidden=tuple(c.CLS_FC), out_channels=cls_channel,
                           use_bn=c.USE_BN, dp_ratio=c.DP_RATIO,
                           dtype=head_dt, name="cls_head")(feat, train=train,
                                            bn_momentum=bn_momentum)
        n_reg = reg_channels(c.LOC_SCOPE, c.LOC_BIN_SIZE, c.NUM_HEAD_BIN,
                             get_xz_fine=True, get_y_by_bin=c.LOC_Y_BY_BIN,
                             loc_y_scope=c.LOC_Y_SCOPE,
                             loc_y_bin_size=c.LOC_Y_BIN_SIZE)
        rcnn_reg = HeadMLP(hidden=tuple(c.REG_FC), out_channels=n_reg,
                           use_bn=c.USE_BN, dp_ratio=c.DP_RATIO,
                           out_kernel_std=0.001, dtype=head_dt, name="reg_head")(
                               feat, train=train, bn_momentum=bn_momentum)
        return {"rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg}
