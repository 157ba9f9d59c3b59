"""RPN: PointNet++ backbone + per-point classification and bin-regression heads.

Reference parity: lib/net/rpn.py. Heads are pointwise Dense stacks (the
reference's Conv1d towers); focal-loss bias init and the 0.001-std reg-head init
are reproduced (rpn.py:61-66).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config.config import as_attrdict
from .bbox_codec import reg_channels
from .pointnet2 import BatchNorm, Pointnet2MSG


class HeadMLP(nn.Module):
    """Conv1d tower: hidden Dense(+BN)+ReLU layers with dropout after the first,
    then a linear output layer (reference: rpn.py:19-47 layer assembly)."""

    hidden: tuple
    out_channels: int
    use_bn: bool = True
    dp_ratio: float = 0.5
    out_bias_init: float = 0.0
    out_kernel_std: float | None = None
    dtype: Any = None  # Dense compute dtype (bf16 inference); output is f32

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.9):
        for i, ch in enumerate(self.hidden):
            x = nn.Dense(ch, use_bias=not self.use_bn,
                         kernel_init=nn.initializers.he_normal(),
                         dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if self.use_bn:
                x = BatchNorm(name=f"bn_{i}")(
                    x, use_running_average=not train, momentum=bn_momentum)
            x = nn.relu(x)
            if i == 0 and self.dp_ratio >= 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train,
                               name="dropout")(x)
        kernel_init = (nn.initializers.normal(self.out_kernel_std)
                       if self.out_kernel_std is not None
                       else nn.initializers.he_normal())
        out = nn.Dense(self.out_channels, kernel_init=kernel_init,
                       bias_init=nn.initializers.constant(self.out_bias_init),
                       dtype=self.dtype, name="out")(x)
        # promote (not force-f32): bf16 heads emit f32; f64 parity stays f64
        return out.astype(jnp.promote_types(out.dtype, jnp.float32))


class RPN(nn.Module):
    """cfg-driven RPN. Input (B, N, 3 [+ intensity]); outputs per-point cls
    logits (B, N, 1), reg (B, N, C), backbone xyz/features."""

    cfg: dict  # the global AttrDict (hashable by id; treat as static)

    @nn.compact
    def __call__(self, pts_input, train: bool = False, bn_momentum=0.9):
        c = as_attrdict(self.cfg)
        sa = c.RPN.SA_CONFIG
        # bf16 Dense compute (MXU 2x; heads/features return f32 — box decode
        # stays full precision). Inference: cfg.BF16_INFERENCE. Training:
        # cfg.TRAIN.BF16_MATMULS (scene-frame layer-0 Denses stay f32 — see
        # pointnet2.SharedMLP.first_f32).
        dt = None
        if not train and bool(c.get("BF16_INFERENCE", False)):
            dt = jnp.bfloat16
        elif (train and jax.default_backend() == "tpu"
              and bool(c.TRAIN.get("BF16_MATMULS", True))):
            dt = jnp.bfloat16
        # the cls/reg towers stay f32 during training: bin logits and
        # residual regressions are where bf16 forward/grad rounding measurably
        # costs AP (quickstart ablation, docs/TRAIN_PROFILE.md), and the head
        # matmuls are a small slice of step time
        head_dt = dt if not train else None
        backbone_cls = Pointnet2MSG
        if train and bool(c.TRAIN.get("REMAT", False)):
            # rematerialized backbone: the backward pass recomputes the SA/FP
            # activations instead of keeping the (B, M, nsample, C) grouped
            # tensors alive (jax.checkpoint; cfg.TRAIN.REMAT)
            backbone_cls = nn.remat(Pointnet2MSG, static_argnums=(2,))
        backbone_xyz, backbone_features = backbone_cls(
            npoints=tuple(sa.NPOINTS),
            radii=tuple(tuple(r) for r in sa.RADIUS),
            nsamples=tuple(tuple(s) for s in sa.NSAMPLE),
            sa_mlps=tuple(tuple(tuple(m) for m in ms) for ms in sa.MLPS),
            fp_mlps=tuple(tuple(m) for m in c.RPN.FP_MLPS),
            use_xyz=True, bn=c.RPN.USE_BN, dtype=dt,
            train_bf16=bool(c.TRAIN.get("BF16_ACTIVATIONS", True)),
            name="backbone")(
                pts_input, train, bn_momentum)

        # focal init puts prior fg prob at 1% (reference: rpn.py:61-64)
        cls_bias = (-float(np.log((1 - 0.01) / 0.01))
                    if c.RPN.LOSS_CLS == "SigmoidFocalLoss" else 0.0)
        rpn_cls = HeadMLP(hidden=tuple(c.RPN.CLS_FC), out_channels=1,
                          use_bn=c.RPN.USE_BN, dp_ratio=c.RPN.DP_RATIO,
                          out_bias_init=cls_bias, dtype=head_dt, name="cls_head")(
                              backbone_features, train=train,
                              bn_momentum=bn_momentum)
        n_reg = reg_channels(c.RPN.LOC_SCOPE, c.RPN.LOC_BIN_SIZE,
                             c.RPN.NUM_HEAD_BIN, c.RPN.LOC_XZ_FINE)
        rpn_reg = HeadMLP(hidden=tuple(c.RPN.REG_FC), out_channels=n_reg,
                          use_bn=c.RPN.USE_BN, dp_ratio=c.RPN.DP_RATIO,
                          out_kernel_std=0.001, dtype=head_dt, name="reg_head")(
                              backbone_features, train=train,
                              bn_momentum=bn_momentum)
        return {
            "rpn_cls": rpn_cls,
            "rpn_reg": rpn_reg,
            "backbone_xyz": backbone_xyz,
            "backbone_features": backbone_features,
        }
