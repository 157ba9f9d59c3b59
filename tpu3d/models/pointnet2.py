"""PointNet++ building blocks as flax modules, channels-last, fixed shapes.

TPU-native redesign of pointnet2_lib/pointnet2/pointnet2_modules.py: the pointwise
"SharedMLP convs" become Dense matmuls over the channel axis (MXU-shaped), and the
CUDA sampling/grouping primitives come from tpu3d.ops. BatchNorm is a custom
module so the BN momentum can be scheduled as a *traced* scalar (the reference's
BNMomentumScheduler, tools/train_utils/train_utils.py:24-45) without recompiles.

Convention: features are (B, N, C); xyz is (B, N, 3).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    ball_query,
    furthest_point_sample,
    furthest_point_sample_with_3nn,
    gather_points,
    group_points,
    interpolation_weights,
    three_interpolate,
    three_nn,
)
from ..ops.envflags import env_flag
from ..ops.fused_sa import (fused_bn_mlp_pool, fused_gather_supported,
                            fused_gathered_mlp_pool, fused_mlp_pool,
                            fused_sa_supported)
from ..ops.grouping import ball_query_from_nearest, nearest_k


class _DenseKernel(nn.Module):
    """Parameter twin of nn.Dense: declares kernel (and bias, when used)
    with the identical names/shapes/inits without running the matmul (the
    fused SA slab kernel consumes the weights directly). Keeps the parameter
    tree — and therefore checkpoints — interchangeable with the unfused
    path."""

    in_features: int
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (self.in_features, self.features))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            return kernel, bias
        return kernel


class _BNState(nn.Module):
    """Parameter/state twin of BatchNorm (scale, bias, batch_stats mean/var),
    for the fused SA path where normalization runs inside the kernel."""

    features: int

    @nn.compact
    def __call__(self):
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.variable("batch_stats", "mean", jnp.zeros, shape)
        var = self.variable("batch_stats", "var", jnp.ones, shape)
        return scale, bias, mean, var


class BatchNorm(nn.Module):
    """BatchNorm over all non-channel axes with run-time momentum.

    ``momentum`` follows the *flax* convention (ema = m·ema + (1−m)·batch);
    the reference's torch momentum t maps to m = 1 − t.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool, momentum=0.9):
        feat_shape = (x.shape[-1],)
        scale = self.param("scale", nn.initializers.ones, feat_shape)
        bias = self.param("bias", nn.initializers.zeros, feat_shape)
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, feat_shape)
        ra_var = self.variable("batch_stats", "var", jnp.ones, feat_shape)

        if use_running_average:
            # eval: fold the normalization into one per-channel affine computed
            # in f32 (C-sized vectors, cheap) and applied in the activation
            # dtype — a single fused multiply-add with no tensor-wide converts
            # (bf16 inference pipelines keep their traffic halved)
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            mul = (inv * scale).astype(x.dtype)
            add = (bias - ra_mean.value * inv * scale).astype(x.dtype)
            return x * mul + add
        axes = tuple(range(x.ndim - 1))
        # promote (not force-f32): bf16 stats go f32; f64 parity runs stay f64
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
        if not self.is_initializing():
            ra_mean.value = momentum * ra_mean.value + (1 - momentum) * mean
            ra_var.value = momentum * ra_var.value + (1 - momentum) * var
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (((xf - mean) * inv) * scale + bias).astype(x.dtype)


class SharedMLP(nn.Module):
    """Stack of pointwise Dense(+BN)+ReLU layers over the channel axis
    (replaces pt_utils.SharedMLP's 1x1 convs)."""

    channels: Sequence[int]
    bn: bool = True
    last_activation: bool = True
    dtype: Any = None  # Dense compute dtype (bf16 on TPU); params stay f32
    # Keep the layer-0 Dense in promoted (f32) compute even when dtype is
    # bf16: scene-frame SA levels feed raw |xyz| <= 70 m coordinates into
    # layer 0 and rely on f32 cancellation (W@xyz[idx] - W@c) before any
    # bf16 rounding — see PointnetSAModuleMSG.canonical.
    first_f32: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.9,
                 first_pre=None, fused_pool: bool = False,
                 fused_gather=None):
        """``first_pre``, when given, is a callable receiving the layer-0
        Dense *module* and returning the layer-0 pre-activation directly
        (``x`` is then ignored for layer 0). This lets callers restructure
        the first matmul (e.g. the SA pre-group algebra) while keeping the
        parameter tree identical to the plain path — checkpoints are
        interchangeable regardless of which execution strategy ran.

        ``fused_pool``: run layers 1..2 + the neighborhood max-pool through
        the fused Pallas slab kernel (ops/fused_sa.py) and return the POOLED
        (B, M, C_out) features — the (B, M, S, C) slab never reaches HBM
        again after the layer-0 pre-activation. Requires bn, 3 channels, a
        trailing activation, and a ``first_pre`` that yields the 4-D slab.
        The parameter tree is identical to the plain path (_DenseKernel /
        _BNState twins)."""
        if fused_pool:
            assert ((first_pre is not None or fused_gather is not None)
                    and len(self.channels) == 3 and self.last_activation)
            dense0 = nn.Dense(self.channels[0], use_bias=not self.bn,
                              kernel_init=nn.initializers.he_normal(),
                              dtype=(None if self.first_f32 else self.dtype),
                              name="dense_0")
            if not self.bn:
                # no-BN chain (the default.yaml RCNN head): single-pass
                # fused kernel, biases instead of normalization
                w1, b1 = _DenseKernel(self.channels[0], self.channels[1],
                                      use_bias=True, name="dense_1")()
                w2, b2 = _DenseKernel(self.channels[1], self.channels[2],
                                      use_bias=True, name="dense_2")()
                if fused_gather is not None:
                    # v2: the grouping gather folds into the kernel; the
                    # (B, M, S, C) slab never exists in HBM at all
                    pre, idxg, center = fused_gather(dense0)
                    return fused_gathered_mlp_pool(pre, idxg, center,
                                                   w1, b1, w2, b2,
                                                   train=train)
                x0 = first_pre(dense0)  # (B, M, S, C1) slab
                return fused_mlp_pool(x0, w1, b1, w2, b2, train=train)
            x0 = first_pre(dense0)  # (B, M, S, C1) slab
            w1 = _DenseKernel(self.channels[0], self.channels[1],
                              name="dense_1")()
            w2 = _DenseKernel(self.channels[1], self.channels[2],
                              name="dense_2")()
            bn_states = [_BNState(c, name=f"bn_{i}")()
                         for i, c in enumerate(self.channels)]
            gammas = tuple(s for s, _, _, _ in bn_states)
            betas = tuple(b for _, b, _, _ in bn_states)
            if train:
                pooled, (means, vars_) = fused_bn_mlp_pool(
                    x0, w1, w2, gammas, betas)
                if not self.is_initializing():
                    for (_, _, m, v), bm, bv in zip(bn_states, means, vars_):
                        m.value = bn_momentum * m.value + (1 - bn_momentum) * bm
                        v.value = bn_momentum * v.value + (1 - bn_momentum) * bv
                return pooled
            return fused_bn_mlp_pool(
                x0, w1, w2, gammas, betas,
                stats=tuple((m.value, v.value)
                            for _, _, m, v in bn_states))
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            dense = nn.Dense(ch, use_bias=not self.bn,
                             kernel_init=nn.initializers.he_normal(),
                             dtype=(None if (i == 0 and self.first_f32)
                                    else self.dtype),
                             name=f"dense_{i}")
            x = first_pre(dense) if (i == 0 and first_pre is not None) \
                else dense(x)
            if self.bn:
                x = BatchNorm(name=f"bn_{i}")(
                    x, use_running_average=not train, momentum=bn_momentum)
            if i < n - 1 or self.last_activation:
                x = nn.relu(x)
        return x


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction: FPS centers, per-radius ball-query
    grouping, shared MLP, max-pool over the neighborhood, concat across scales
    (reference: pointnet2_modules.py:19-96)."""

    npoint: int | None
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    bn: bool = True
    query_chunk: int | None = 512
    dtype: Any = None
    # True when xyz is already a small-magnitude canonical frame (the RCNN's
    # per-ROI coordinates): the pre-group pre-activations may then be rounded
    # to bf16 BEFORE the per-center subtraction without losing the local
    # geometry signal. In scene frames (|xyz| up to 70 m) that rounding is
    # amplified by cancellation — W_x@xyz[idx] − W_x@c keeps only the
    # sub-metre difference — so non-canonical levels gather f32 and cast to
    # bf16 only AFTER the subtraction (XLA fuses subtract+cast into the
    # gather's consumer).
    canonical: bool = False
    # Allow the TPU bf16 activation casts during *training* too (they are
    # always applied at eval). cfg.TRAIN.BF16_ACTIVATIONS wires this; set it
    # False for f32 reference-parity training numerics.
    train_bf16: bool = True
    # Override the pre-group-vs-plain execution-strategy heuristic (None =
    # pick by npoint*nsample vs N). Both strategies share one parameter tree
    # and compute the same function — this is purely a scheduling choice.
    force_pregroup: bool | None = None

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False, bn_momentum=0.9,
                 new_xyz=None):
        """xyz (B, N, 3); features (B, N, C) or None.
        Returns (new_xyz (B, npoint, 3), new_features (B, npoint, ΣC_out))."""
        if new_xyz is None:
            if self.npoint is not None:
                idx = furthest_point_sample(xyz, self.npoint)
                new_xyz = gather_points(xyz, idx)
            else:
                new_xyz = None

        # one nearest-K candidate search shared by every scale: the radii of an
        # MSG level query the same (centers, points) pair, and nearest-first
        # ordering means each scale's ball query is a prefix + radius filter
        # of the K = max(nsample) candidate list (K-NN computed once via the
        # fused Pallas kernel on TPU; reference runs ball_query per radius)
        # TPU3D_REF_BALL_QUERY=1: reproduce the CUDA ball query's slab
        # MULTISET exactly (first-nsample hits in index order, pad = first
        # hit) instead of the shared nearest-k candidates. The pick SETS
        # coincide at production densities and max-pool is order-invariant,
        # but train-mode BN batch statistics see the pad-slot multiplicities
        # — the reference-gradient differentials
        # (test_full_model_grad_reference_diff.py) need bit-equal slabs.
        ref_bq = env_flag("TPU3D_REF_BALL_QUERY")
        shared = None
        cand_xyz = None
        if self.npoint is not None and len(self.radii) > 1 and not ref_bq:
            k_max = max(self.nsamples)
            # every consumer radius-filters the candidates, so the depth-
            # windowed kernel applies with the level's largest radius
            r_max = float(max(self.radii))
            if features is None:
                # candidate coordinates come straight out of the kernel's
                # VMEM registers; each scale's grouped xyz is then a pure
                # elementwise prefix/radius selection of the candidates
                # (the per-scale 3-channel gathers were ~9 ms at SA_0)
                *shared, cand_xyz = nearest_k(new_xyz, xyz, k_max,
                                              with_coords=True,
                                              max_radius=r_max)
            else:
                shared = nearest_k(new_xyz, xyz, k_max, max_radius=r_max)

        # f32-parity gate for the plain-path gathers (the pregroup branch
        # computes its own allow_bf16): BF16_ACTIVATIONS=False during
        # training / TPU3D_F32_EVAL at eval forbid bf16 rounding in
        # group_points' forward AND backward
        exact_gp = not (self.train_bf16 if train
                        else not env_flag("TPU3D_F32_EVAL"))
        scale_features = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            if self.npoint is not None:
                if shared is not None:
                    idx = ball_query_from_nearest(
                        shared[0], shared[1], radius, nsample, xyz.shape[1])
                else:
                    chunk = self.query_chunk
                    if chunk is not None and self.npoint % chunk != 0:
                        chunk = None
                    idx = ball_query(new_xyz, xyz, radius, nsample,
                                     query_chunk=chunk,
                                     method="first" if ref_bq else "auto")
                pregroup = (self.force_pregroup
                            if self.force_pregroup is not None
                            else self.npoint * nsample > xyz.shape[1])
                if features is not None and pregroup:
                    # pre-group first layer: the whole first Dense moves in
                    # front of the gather. With W = [W_x | W_f],
                    #   W @ [xyz[idx]-c ; f[idx]] =
                    #   (W_x@xyz + W_f@f)[idx] - W_x@c,
                    # so ONE per-distinct-point matmul + ONE narrow gather +
                    # a per-center correction replace the grouped-copy
                    # matmul AND the grouped-xyz gather (8.4 ms of pure
                    # gather at the RCNN SA_0 shape). Exact same
                    # pre-activations AND the exact same parameter tree as
                    # the plain path (the layer-0 Dense is driven through
                    # SharedMLP's first_pre hook), so this shape-dependent
                    # strategy choice never changes the checkpoint format.
                    # scene-frame levels keep the layer-0 Dense (and its
                    # center correction) in f32 even under bf16-matmul
                    # training: the cancellation W@xyz[idx] − W@c must
                    # happen before bf16 rounding (module docstring). Eval
                    # keeps the validated BF16_INFERENCE behavior.
                    first_f32 = train and not self.canonical and self.use_xyz
                    cdt = (features.dtype if first_f32
                           else (self.dtype or features.dtype))
                    # TPU3D_F32_EVAL=1: full-precision TPU eval numerics
                    # (debug escape hatch for CPU-vs-TPU parity hunts).
                    # TPU3D_FORCE_FUSED_SA=1 enables the bf16 casts + fused
                    # slab kernel off-TPU (interpret mode; tests only).
                    force_fused = env_flag("TPU3D_FORCE_FUSED_SA")
                    allow_bf16 = (self.train_bf16 if train
                                  else not env_flag("TPU3D_F32_EVAL"))
                    bf16_ok = ((jax.default_backend() == "tpu" or force_fused)
                               and allow_bf16)
                    # fused Pallas slab path: canonical bf16 frames whose
                    # MLP the kernel supports — the grouped slab stays out
                    # of HBM after the layer-0 pre-activation
                    use_fused = (bf16_ok and self.canonical
                                 and fused_sa_supported(
                                     (xyz.shape[0], self.npoint, nsample,
                                      mlp[0]), mlp))

                    def pre0(dense0, *, idx=idx, new_xyz=new_xyz, cdt=cdt):
                        if self.use_xyz:
                            inp = jnp.concatenate(
                                [xyz, features], -1).astype(cdt)
                        else:
                            inp = features.astype(cdt)
                        pre = dense0(inp)
                        if bf16_ok and (self.canonical or not self.use_xyz):
                            # canonical/feature-only frames: bf16 gather
                            # halves the (B, M, S, C) materialization
                            # traffic safely
                            pre = pre.astype(jnp.bfloat16)
                        # exact=not allow_bf16: the f32-parity gate
                        # (BF16_ACTIVATIONS=False / TPU3D_F32_EVAL) must also
                        # forbid the bf16-rounded one-hot MXU backward.
                        # bf16_bwd=allow_bf16 states the cotangent-precision
                        # consent explicitly at this (precise) call site —
                        # bf16 training accepts the MXU backward's bf16
                        # rounding; f32 mode keeps the exact VJP.
                        x = group_points(pre, idx,
                                         precise=not self.canonical,
                                         exact=not allow_bf16,
                                         bf16_bwd=allow_bf16)
                        if self.use_xyz:
                            # W_x@c (+ bias) via the same Dense on
                            # zero-padded features; the grouped term already
                            # carries one bias copy, so subtracting this one
                            # leaves W@[xyz[idx]-c; f[idx]] — the bias is
                            # restored once below when the Dense has one.
                            zf = jnp.zeros(
                                (*new_xyz.shape[:-1], features.shape[-1]),
                                cdt)
                            center = dense0(jnp.concatenate(
                                [new_xyz.astype(cdt), zf], -1))
                            x = x - center[:, :, None, :].astype(x.dtype)
                            if not self.bn:  # Dense has a bias
                                bias = dense0(jnp.zeros(
                                    (1, inp.shape[-1]), cdt))
                                x = x + bias.astype(x.dtype)
                        if bf16_ok and x.dtype == jnp.float32:
                            # cast AFTER the cancellation: the residual is
                            # the small local-geometry signal, safe in bf16
                            x = x.astype(jnp.bfloat16)
                        return x

                    def gather_spec(dense0, *, idx=idx, new_xyz=new_xyz,
                                    cdt=cdt):
                        """v2 fused inputs: per-point pre-activations, group
                        indices, and the per-center subtraction (the W@c
                        pregroup term minus the restored layer-0 bias row) —
                        the gather itself runs inside the kernel."""
                        if self.use_xyz:
                            inp = jnp.concatenate(
                                [xyz, features], -1).astype(cdt)
                        else:
                            inp = features.astype(cdt)
                        pre = dense0(inp).astype(jnp.bfloat16)
                        if self.use_xyz:
                            zf = jnp.zeros(
                                (*new_xyz.shape[:-1], features.shape[-1]),
                                cdt)
                            center = dense0(jnp.concatenate(
                                [new_xyz.astype(cdt), zf], -1))
                        else:
                            center = jnp.zeros(
                                (*new_xyz.shape[:-1], pre.shape[-1]),
                                pre.dtype)
                        if not self.bn:  # restore the layer-0 bias row
                            bias = dense0(jnp.zeros((1, inp.shape[-1]), cdt))
                            center = center - bias
                        return pre, idx, center

                    mlp_mod = SharedMLP(mlp, bn=self.bn, dtype=self.dtype,
                                        first_f32=first_f32,
                                        name=f"mlp_{i}")
                    if use_fused:
                        gspec = (gather_spec if not self.bn
                                 and fused_gather_supported(xyz.shape[1])
                                 else None)
                        scale_features.append(mlp_mod(
                            None, train=train, bn_momentum=bn_momentum,
                            first_pre=pre0, fused_pool=True,
                            fused_gather=gspec))
                    else:
                        out = mlp_mod(None, train=train,
                                      bn_momentum=bn_momentum, first_pre=pre0)
                        scale_features.append(jnp.max(out, axis=2))
                    continue
                if cand_xyz is not None:
                    # derive this scale's grouped xyz from the shared
                    # candidate gather: prefix slots, radius hit mask, and
                    # the CUDA fill (first hit / point 0) — all elementwise
                    hit = ((shared[0][..., :nsample] < radius * radius)
                           & (shared[1][..., :nsample] < xyz.shape[1]))
                    c_xyz = cand_xyz[..., :nsample, :]
                    first_xyz = jnp.where(
                        hit[..., 0:1, None], c_xyz[..., 0:1, :],
                        xyz[:, 0][:, None, None, :])
                    grouped_xyz = (jnp.where(hit[..., None], c_xyz, first_xyz)
                                   - new_xyz[:, :, None, :])
                else:
                    grouped_xyz = (group_points(xyz, idx, exact=exact_gp)
                                   - new_xyz[:, :, None, :])
                grouped = grouped_xyz
                if features is not None:
                    grouped_feats = group_points(features, idx,
                                                 exact=exact_gp)
                    grouped = (jnp.concatenate([grouped_xyz, grouped_feats], -1)
                               if self.use_xyz else grouped_feats)
            else:
                # GroupAll: one group holding every point (reference
                # pointnet2_utils GroupAll)
                grouped = xyz[:, None, :, :]
                if features is not None:
                    grouped = (jnp.concatenate(
                        [grouped, features[:, None, :, :]], -1)
                        if self.use_xyz else features[:, None, :, :])
            out = SharedMLP(mlp, bn=self.bn, dtype=self.dtype,
                            name=f"mlp_{i}")(
                grouped, train=train, bn_momentum=bn_momentum)
            scale_features.append(jnp.max(out, axis=2))  # pool over nsample

        return new_xyz, jnp.concatenate(scale_features, axis=-1)


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale SA (reference: pointnet2_modules.py:99-119)."""


class PointnetFPModule(nn.Module):
    """Feature propagation: inverse-distance 3-NN interpolation + skip concat +
    shared MLP (reference: pointnet2_modules.py:122-160)."""

    mlp: Sequence[int]
    bn: bool = True
    dtype: Any = None
    train_bf16: bool = True

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool = False, bn_momentum=0.9, cached_nn=None):
        """cached_nn: optional (d2 (B, M, 3), idx (B, M, 3)) from the fused
        FPS+3NN kernel (ops.furthest_point_sample_with_3nn) — the encoder
        already knows each point's 3 nearest sampled centers, so the FP-level
        neighbor search is free."""
        if known is not None:
            if cached_nn is not None:
                d2c, idx = cached_nn
                dist = jnp.sqrt(jnp.maximum(d2c, 0.0))
            else:
                dist, idx = three_nn(unknown, known, differentiable=False)
            # Interpolation weights are CONSTANTS under autodiff, matching
            # the reference exactly: its three_nn Function has no backward
            # and three_interpolate_grad propagates to features only
            # (interpolate_gpu.cu:120-160) — and mathematically the weights
            # are pure functions of coordinates, which never depend on
            # parameters, so their param-gradient contribution is
            # identically zero (pinned at 2.5e-12 by
            # test_full_model_grad_reference_diff). stop_gradient also
            # deletes the train-path differentiable distance recompute that
            # cost ~8 ms/step at FP_0 (a 786k-row coordinate gather + a
            # (B, 49152, 3) minor-dim-3 layout copy + row reduce) and lets
            # XLA DCE the custom VJPs' d_weight computation.
            weight = jax.lax.stop_gradient(interpolation_weights(dist))
            if (jax.default_backend() == "tpu"
                    and (self.train_bf16 if train
                         else not env_flag("TPU3D_F32_EVAL"))
                    and known_feats.dtype == jnp.float32):
                # bf16 source features halve the interpolation gather's
                # random-read + write traffic (FP_0 gathers a 400k-row
                # (3, 256)-channel block); same treatment as the SA bf16
                # activation casts, gated by the same flag
                known_feats = known_feats.astype(jnp.bfloat16)
            interpolated = three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (*known_feats.shape[:-2], unknown.shape[1],
                              known_feats.shape[-1]))
        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], -1)
        else:
            new_features = interpolated
        return SharedMLP(self.mlp, bn=self.bn, dtype=self.dtype, name="mlp")(
            new_features, train=train, bn_momentum=bn_momentum)


class Pointnet2MSG(nn.Module):
    """The RPN backbone: 4 MSG-SA encoders + 4 FP decoders configured from
    cfg.RPN.SA_CONFIG / FP_MLPS (reference: lib/net/pointnet2_msg.py)."""

    npoints: Sequence[int]
    radii: Sequence[Sequence[float]]
    nsamples: Sequence[Sequence[int]]
    sa_mlps: Sequence[Sequence[Sequence[int]]]
    fp_mlps: Sequence[Sequence[int]]
    input_channels: int = 0
    use_xyz: bool = True
    bn: bool = True
    dtype: Any = None
    train_bf16: bool = True

    @nn.compact
    def __call__(self, pts_input, train: bool = False, bn_momentum=0.9):
        """pts_input (B, N, 3 + input_channels) -> (xyz (B, N, 3), feats (B, N, C))."""
        xyz = pts_input[..., 0:3]
        features = pts_input[..., 3:] if pts_input.shape[-1] > 3 else None

        l_xyz, l_features = [xyz], [features]
        cached_nn = []  # per level: (d2, idx) of each point's 3-NN centers
        for k in range(len(self.npoints)):
            if self.npoints[k] is None:
                new_xyz = None
                cached_nn.append(None)
            else:
                # fused FPS + exact 3-NN-to-the-sampled-set: the FP decoder's
                # three_nn at this level rides along with the sampling pass
                # (ops.furthest_point_sample_with_3nn)
                fps_idx, nn_d2, nn_idx = furthest_point_sample_with_3nn(
                    l_xyz[k], self.npoints[k])
                new_xyz = gather_points(l_xyz[k], fps_idx)
                cached_nn.append((nn_d2, nn_idx))
            li_xyz, li_features = PointnetSAModuleMSG(
                npoint=self.npoints[k], radii=self.radii[k],
                nsamples=self.nsamples[k], mlps=self.sa_mlps[k],
                use_xyz=self.use_xyz, bn=self.bn, dtype=self.dtype,
                train_bf16=self.train_bf16,
                name=f"sa_{k}")(
                    l_xyz[k], l_features[k], train=train,
                    bn_momentum=bn_momentum, new_xyz=new_xyz)
            l_xyz.append(li_xyz)
            l_features.append(li_features)

        n_fp = len(self.fp_mlps)
        for i in range(n_fp - 1, -1, -1):
            l_features[i] = PointnetFPModule(
                mlp=self.fp_mlps[i], bn=self.bn, dtype=self.dtype,
                train_bf16=self.train_bf16,
                name=f"fp_{i}")(
                    l_xyz[i], l_xyz[i + 1], l_features[i], l_features[i + 1],
                    train=train, bn_momentum=bn_momentum,
                    cached_nn=cached_nn[i] if i < len(cached_nn) else None)

        return l_xyz[0], l_features[0].astype(
            jnp.promote_types(l_features[0].dtype, jnp.float32))
