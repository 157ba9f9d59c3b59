"""Fused SA-stack slab kernel: [BN -> ReLU -> Dense] x2 -> BN -> ReLU -> maxpool.

TPU-native replacement for the RCNN set-abstraction MLP stack over the grouped
point slab (reference: pointnet2_lib/pointnet2/pointnet2_modules.py:19-55 —
the SharedMLP 1x1-conv + BN + ReLU chain and the per-neighborhood max-pool).
At default.yaml training shapes the grouped slab is (1024 ROIs, 128 centers,
64 neighbors, 128 ch) = 2.15 GB in bf16, and XLA's unfused schedule makes
~10 full passes over it per train step (BN stats, normalize+relu, conv
fwd/bwd, wgrad, layout copies — ~60 ms/step, docs/TRAIN_PROFILE.md). This op
reads the slab once per pass and keeps everything else in VMEM:

forward (training, batch statistics — 4 passes over the input slab, nothing
else ever materialized in HBM):
  P1  per-channel sum/sumsq of x0                             -> stats0
  P2  recompute BN0+ReLU, Dense1; sum/sumsq of x1             -> stats1
  P3  recompute through Dense2; sum/sumsq of x2               -> stats2
  P4  full chain + maxpool -> pooled out, argmax, x2@argmax

backward (3 passes; BN training-mode backward needs one global reduction
wave per layer, but layer 2's reductions are free: the max-pool makes the
incoming slab grad nonzero only at argmax slots, so its per-channel sums
collapse to small (B, M, C) tensors computed in plain jax):
  B1  recompute chain; d_x2 (sparse argmax scatter + per-channel affine of
      x2 — the dense part of BN2's backward); reduce sum(d_y1),
      sum(d_y1*xhat1) (= dbeta1, dgamma1); accumulate dW2
  B2  ... + d_x1; reduce dbeta0, dgamma0; accumulate dW1
  B3  ... + d_x0 slab (the only slab-sized write of the whole backward)

Numerics match the unfused SharedMLP bf16 path: pre-activations are rounded
to bf16 at layer boundaries before statistics (flax Dense(dtype=bf16) emits
bf16), matmuls run bf16 x bf16 with f32 accumulation on the MXU, BN math in
f32. Max-pool gradient uses first-argmax (ties are measure-zero in f32; XLA's
eq-mask VJP would split ties). The returned batch statistics are stop-grad
(flax BatchNorm running-average semantics): their cotangents are ignored.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .envflags import env_flag

# set by _ensure_pallas(); kernels only trace inside pallas_call, after import
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl
        pl = _pl
    return pl


def _pick_blk(rows: int, s: int, target: int = 8192) -> int:
    """Largest multiple of s that divides rows and is <= max(target, s).

    target 8192 (one whole SA_0 ROI per step) measured fastest with the
    raised VMEM limit: 22.6 / 24.5 / 26.0 ms fwd+bwd at 8192/4096/2048 for
    the standalone SA_0-shape chain; grid-step overhead dominates below."""
    blk = max(s, (target // s) * s)
    while rows % blk != 0:
        blk -= s
    return blk


# --------------------------------------------------------------------------
# reference implementation (pure jnp; the exact semantics the kernels must
# reproduce — also the CPU fallback and the test oracle)
# --------------------------------------------------------------------------

def _bn_relu_train(x, gamma, beta, eps):
    """flax-BatchNorm training semantics (models/pointnet2.py BatchNorm):
    f32 stats over all non-channel axes, output cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = (((xf - mean) * inv) * gamma + beta).astype(x.dtype)
    return jnp.where(y > 0, y, jnp.zeros((), y.dtype)), mean, var


def _bn_relu_eval(x, gamma, beta, mean, var, eps):
    inv = jax.lax.rsqrt(var + eps)
    mul = (inv * gamma).astype(x.dtype)
    add = (beta - mean * inv * gamma).astype(x.dtype)
    y = x * mul + add
    return jnp.where(y > 0, y, jnp.zeros((), y.dtype))


def _pool(a2, pool):
    """Max over the neighborhood axis. pool="max": jnp.max (XLA's VJP splits
    the cotangent among ties); pool="first": route through the first argmax
    — the fused kernel's subgradient choice, matching the original CUDA
    maxpool backward (a single saved index per output)."""
    if pool == "max":
        return jnp.max(a2, axis=2)
    arg = jnp.argmax(a2, axis=2)
    return jnp.take_along_axis(a2, arg[:, :, None, :], axis=2)[:, :, 0, :]


def fused_bn_mlp_pool_reference(x0, w1, w2, gammas, betas, *, stats=None,
                                eps=1e-5, pool="max"):
    """Oracle: the unfused SharedMLP chain on the (B, M, S, C1) slab.

    stats None -> training (batch statistics; returns (out, (means, vars)));
    stats ((m0,v0),(m1,v1),(m2,v2)) -> eval (returns out). ``pool`` selects
    the max-pool tie subgradient (see _pool); values are identical.
    """
    dt = x0.dtype
    if stats is None:
        a0, m0, v0 = _bn_relu_train(x0, gammas[0], betas[0], eps)
        x1 = jnp.einsum("bmsc,cd->bmsd", a0, w1.astype(dt)).astype(dt)
        a1, m1, v1 = _bn_relu_train(x1, gammas[1], betas[1], eps)
        x2 = jnp.einsum("bmsc,cd->bmsd", a1, w2.astype(dt)).astype(dt)
        a2, m2, v2 = _bn_relu_train(x2, gammas[2], betas[2], eps)
        return _pool(a2, pool), ((m0, m1, m2), (v0, v1, v2))
    (m0, v0), (m1, v1), (m2, v2) = stats
    a0 = _bn_relu_eval(x0, gammas[0], betas[0], m0, v0, eps)
    x1 = jnp.einsum("bmsc,cd->bmsd", a0, w1.astype(dt)).astype(dt)
    a1 = _bn_relu_eval(x1, gammas[1], betas[1], m1, v1, eps)
    x2 = jnp.einsum("bmsc,cd->bmsd", a1, w2.astype(dt)).astype(dt)
    a2 = _bn_relu_eval(x2, gammas[2], betas[2], m2, v2, eps)
    return jnp.max(a2, axis=2)


# --------------------------------------------------------------------------
# Pallas kernels. All slab kernels run on a (B, ROWS // BLK) grid over the
# flattened (B, ROWS = M*S, C) slab; per-channel reductions are emitted as
# per-step partials (B, nblk, 2, C) and summed in jax (global over B too —
# BatchNorm normalizes across the batch axis). BLK is a multiple of S so a
# step never straddles a pooling group. Per-layer constant packs: p0/p1/p2
# carry (mul, add[, r, mu*r]) rows of the layer's channel width; weights ride
# along in bf16 for the MXU.
# --------------------------------------------------------------------------


def _chain_to(depth, x0f, p0_ref, p1_ref, w1_ref, w2_ref):
    """Recompute the forward chain from the slab tile in VMEM. Every
    pre-activation is rounded to bf16 before downstream use (parity with
    Dense(dtype=bf16) layer boundaries). depth 1: (a0, x1f);
    depth 2: (a0, x1f, a1, x2f). x1f/x2f are rounded, upcast to f32."""
    a0 = jnp.maximum(x0f * p0_ref[0] + p0_ref[1], 0.0).astype(jnp.bfloat16)
    x1f = jnp.dot(a0, w1_ref[...], preferred_element_type=jnp.float32)
    x1f = x1f.astype(jnp.bfloat16).astype(jnp.float32)
    if depth == 1:
        return a0, x1f
    a1 = jnp.maximum(x1f * p1_ref[0] + p1_ref[1], 0.0).astype(jnp.bfloat16)
    x2f = jnp.dot(a1, w2_ref[...], preferred_element_type=jnp.float32)
    x2f = x2f.astype(jnp.bfloat16).astype(jnp.float32)
    return a0, x1f, a1, x2f


def _stats0_kernel(x_ref, out_ref):
    xf = x_ref[0].astype(jnp.float32)
    out_ref[0, 0] = jnp.stack([jnp.sum(xf, axis=0),
                               jnp.sum(xf * xf, axis=0)])


def _fwd_stats1_kernel(x_ref, p0_ref, w1_ref, out_ref):
    _, x1f = _chain_to(1, x_ref[0].astype(jnp.float32), p0_ref, None,
                       w1_ref, None)
    out_ref[0, 0] = jnp.stack([jnp.sum(x1f, axis=0),
                               jnp.sum(x1f * x1f, axis=0)])


def _fwd_stats2_kernel(x_ref, p0_ref, p1_ref, w1_ref, w2_ref, out_ref):
    *_, x2f = _chain_to(2, x_ref[0].astype(jnp.float32), p0_ref, p1_ref,
                        w1_ref, w2_ref)
    out_ref[0, 0] = jnp.stack([jnp.sum(x2f, axis=0),
                               jnp.sum(x2f * x2f, axis=0)])


def _fwd_final_kernel(s, x_ref, p0_ref, p1_ref, p2_ref, w1_ref, w2_ref,
                      out_ref, arg_ref, ppre_ref):
    *_, x2f = _chain_to(2, x_ref[0].astype(jnp.float32), p0_ref, p1_ref,
                        w1_ref, w2_ref)
    a2 = jnp.maximum(x2f * p2_ref[0] + p2_ref[1], 0.0)
    blk_m, c3 = a2.shape[0] // s, a2.shape[-1]
    # parity: the unfused path pools bf16 activations — round BEFORE the
    # max/argmax so both the pooled values and the picked slots match. The
    # rounded values are compared UPCAST to f32: Mosaic crashes on 3-D bf16
    # eq-compares, and broadcasts are materialized explicitly (the implicit
    # (m, 1, c) -> (m, s, c) i1 relayout is rejected).
    shape3 = (blk_m, s, c3)
    a2r = a2.astype(jnp.bfloat16).astype(jnp.float32).reshape(shape3)
    mx = jnp.max(a2r, axis=1)
    # first-argmax over the pooling axis (deterministic tie-break)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    eq = a2r == jnp.broadcast_to(mx[:, None, :], shape3)
    arg = jnp.min(jnp.where(eq, s_iota, s), axis=1)
    sel = s_iota == jnp.broadcast_to(arg[:, None, :], shape3)
    ppre = jnp.sum(jnp.where(sel, x2f.reshape(shape3), 0.0), axis=1)
    out_ref[0] = mx.astype(out_ref.dtype)
    arg_ref[0] = arg
    ppre_ref[0] = ppre


def _eval_chain_kernel(s, x_ref, p0_ref, p1_ref, p2_ref, w1_ref, w2_ref,
                       out_ref):
    *_, x2f = _chain_to(2, x_ref[0].astype(jnp.float32), p0_ref, p1_ref,
                        w1_ref, w2_ref)
    a2 = jnp.maximum(x2f * p2_ref[0] + p2_ref[1], 0.0)
    blk_m = a2.shape[0] // s
    # round to the output dtype before pooling (unfused-path parity), but
    # reduce in f32 — Mosaic is unreliable on 3-D bf16 reductions
    a2r = a2.astype(out_ref.dtype).astype(jnp.float32)
    out_ref[0] = jnp.max(a2r.reshape(blk_m, s, -1), axis=1).astype(
        out_ref.dtype)


def _dx2_tile(s, x2f, p2b_ref, dval, arg):
    """d_x2 on a tile: sparse argmax scatter + per-channel affine of x2
    (the dense part of BN2's training backward)."""
    c2a, c2b, r2, m2r2 = p2b_ref[0], p2b_ref[1], p2b_ref[2], p2b_ref[3]
    blk_m, c3 = dval.shape[0], dval.shape[-1]
    shape3 = (blk_m, s, c3)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    sel = s_iota == jnp.broadcast_to(arg[:, None, :], shape3)
    sparse = jnp.where(sel, jnp.broadcast_to(dval[:, None, :], shape3), 0.0)
    xhat2 = x2f * r2 - m2r2
    return sparse.reshape(blk_m * s, c3) - c2a - c2b * xhat2


def _dy1_tile(s, x0f, p0_ref, p1_ref, p2b_ref, dval_ref, arg_ref,
              w1_ref, w2_ref):
    """Shared backward recompute: returns (a0, x1f, a1, d_x2, d_y1, xhat1)."""
    a0, x1f, a1, x2f = _chain_to(2, x0f, p0_ref, p1_ref, w1_ref, w2_ref)
    d_x2 = _dx2_tile(s, x2f, p2b_ref, dval_ref[0], arg_ref[0])
    d_a1 = jax.lax.dot_general(d_x2.astype(jnp.bfloat16), w2_ref[...],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    mask1 = (x1f * p1_ref[0] + p1_ref[1]) > 0  # relu'(y1)
    d_y1 = jnp.where(mask1, d_a1, 0.0)
    xhat1 = x1f * p1_ref[2] - p1_ref[3]  # r1, mu1*r1
    return a0, x1f, a1, d_x2, d_y1, xhat1


def _accum(ref, val):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        ref[...] = val

    @pl.when(jnp.logical_not(first))
    def _():
        ref[...] += val


def _bwd_wave1_kernel(s, x_ref, p0_ref, p1_ref, p2b_ref, dval_ref, arg_ref,
                      w1_ref, w2_ref, red_ref, dw2_ref):
    _, _, a1, d_x2, d_y1, xhat1 = _dy1_tile(
        s, x_ref[0].astype(jnp.float32), p0_ref, p1_ref, p2b_ref, dval_ref,
        arg_ref, w1_ref, w2_ref)
    _accum(dw2_ref, jax.lax.dot_general(
        a1, d_x2.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    red_ref[0, 0] = jnp.stack([jnp.sum(d_y1, axis=0),
                               jnp.sum(d_y1 * xhat1, axis=0)])


def _dx1_tile(p1b_ref, d_y1, xhat1):
    # d_x1 = s1*d_y1 - c1a - c1b*xhat1 (s1 = gamma1*r1; c1a/c1b from wave 1)
    return p1b_ref[0] * d_y1 - p1b_ref[1] - p1b_ref[2] * xhat1


def _bwd_wave2_kernel(s, x_ref, p0_ref, p1_ref, p2b_ref, p1b_ref, dval_ref,
                      arg_ref, w1_ref, w2_ref, red_ref, dw1_ref):
    x0f = x_ref[0].astype(jnp.float32)
    a0, x1f, a1, d_x2, d_y1, xhat1 = _dy1_tile(
        s, x0f, p0_ref, p1_ref, p2b_ref, dval_ref, arg_ref, w1_ref, w2_ref)
    d_x1 = _dx1_tile(p1b_ref, d_y1, xhat1)
    d_x1b = d_x1.astype(jnp.bfloat16)
    _accum(dw1_ref, jax.lax.dot_general(
        a0, d_x1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    d_a0 = jax.lax.dot_general(d_x1b, w1_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    mask0 = (x0f * p0_ref[0] + p0_ref[1]) > 0
    d_y0 = jnp.where(mask0, d_a0, 0.0)
    xhat0 = x0f * p0_ref[2] - p0_ref[3]  # r0, mu0*r0
    red_ref[0, 0] = jnp.stack([jnp.sum(d_y0, axis=0),
                               jnp.sum(d_y0 * xhat0, axis=0)])


def _bwd_apply_kernel(s, x_ref, p0_ref, p1_ref, p2b_ref, p1b_ref, p0b_ref,
                      dval_ref, arg_ref, w1_ref, w2_ref, dx0_ref):
    x0f = x_ref[0].astype(jnp.float32)
    a0, x1f, a1, d_x2, d_y1, xhat1 = _dy1_tile(
        s, x0f, p0_ref, p1_ref, p2b_ref, dval_ref, arg_ref, w1_ref, w2_ref)
    d_x1 = _dx1_tile(p1b_ref, d_y1, xhat1)
    d_a0 = jax.lax.dot_general(d_x1.astype(jnp.bfloat16), w1_ref[...],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    mask0 = (x0f * p0_ref[0] + p0_ref[1]) > 0
    d_y0 = jnp.where(mask0, d_a0, 0.0)
    xhat0 = x0f * p0_ref[2] - p0_ref[3]
    dx0_ref[0] = (p0b_ref[0] * d_y0 - p0b_ref[1] - p0b_ref[2] * xhat0
                  ).astype(dx0_ref.dtype)


def _slab_call(kernel, x0, small_inputs, out_shapes, blk, s, interpret):
    """Run `kernel` over the (B, ROWS, C) slab grid. small_inputs: (k, C)
    f32 const packs / (Cin, Cout) weights (broadcast to every step) or
    (B, M, C') per-center tensors (tiled along the grid)."""
    pl = _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    B, rows, c1 = x0.shape
    nblk = rows // blk
    blk_m = blk // s
    in_specs = [pl.BlockSpec((1, blk, c1), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)]
    for a in small_inputs:
        if a.ndim == 2:  # const pack or weight: whole array, every step
            in_specs.append(pl.BlockSpec(a.shape, lambda b, i: (0, 0),
                                         memory_space=pltpu.VMEM))
        else:  # (B, M, C') per-center tensor
            in_specs.append(pl.BlockSpec(
                (1, blk_m, a.shape[-1]), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM))
    out_specs, shapes = [], []
    for kind, trail, dtype in out_shapes:
        if kind == "partial":  # per-step (2, C) partials
            out_specs.append(pl.BlockSpec((1, 1) + trail,
                                          lambda b, i: (b, i, 0, 0),
                                          memory_space=pltpu.VMEM))
            shapes.append(jax.ShapeDtypeStruct((B, nblk) + trail, dtype))
        elif kind == "center":  # (B, M, C') pooled-side output
            out_specs.append(pl.BlockSpec((1, blk_m, trail[-1]),
                                          lambda b, i: (b, i, 0),
                                          memory_space=pltpu.VMEM))
            shapes.append(jax.ShapeDtypeStruct((B, rows // s, trail[-1]),
                                               dtype))
        elif kind == "slab":
            out_specs.append(pl.BlockSpec((1, blk, trail[-1]),
                                          lambda b, i: (b, i, 0),
                                          memory_space=pltpu.VMEM))
            shapes.append(jax.ShapeDtypeStruct((B, rows, trail[-1]), dtype))
        else:  # "accum": revisited full-array accumulator (e.g. dW)
            out_specs.append(pl.BlockSpec(trail, lambda b, i: (0, 0),
                                          memory_space=pltpu.VMEM))
            shapes.append(jax.ShapeDtypeStruct(trail, dtype))
    single = len(out_shapes) == 1
    params = {}
    if not interpret:
        # v5e cores have far more VMEM than Mosaic's conservative default;
        # the 4096-row tiles of the backward kernel need the headroom
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=in_specs,
        out_specs=out_specs[0] if single else tuple(out_specs),
        out_shape=shapes[0] if single else tuple(shapes),
        interpret=interpret,
        **params,
    )(x0, *small_inputs)


def _bn_consts(mean, var, gamma, beta, eps):
    r = jax.lax.rsqrt(var + eps)
    mul = gamma * r
    add = beta - mean * mul
    return (mul.astype(jnp.float32), add.astype(jnp.float32),
            r.astype(jnp.float32), (mean * r).astype(jnp.float32))


def _stats_from_partials(part, P):
    t = jnp.sum(part, axis=(0, 1))
    mean = t[0] / P
    return mean, t[1] / P - mean * mean


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_train(x0, weights, bn, s, eps, interpret):
    out, stats, _ = _fused_train_fwd_impl(x0, weights, bn, s, eps, interpret)
    return out, stats


def _fused_train_fwd_impl(x0, weights, bn, s, eps, interpret):
    w1, w2 = weights
    gammas, betas = bn
    B, rows, c1 = x0.shape
    c2, c3 = w1.shape[1], w2.shape[1]
    blk = _pick_blk(rows, s)
    P = float(B * rows)
    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)

    part0 = _slab_call(_stats0_kernel, x0, [],
                       [("partial", (2, c1), jnp.float32)], blk, s, interpret)
    mean0, var0 = _stats_from_partials(part0, P)
    p0 = jnp.stack(_bn_consts(mean0, var0, gammas[0], betas[0], eps))

    part1 = _slab_call(_fwd_stats1_kernel, x0, [p0[:2], w1b],
                       [("partial", (2, c2), jnp.float32)], blk, s, interpret)
    mean1, var1 = _stats_from_partials(part1, P)
    p1 = jnp.stack(_bn_consts(mean1, var1, gammas[1], betas[1], eps))

    part2 = _slab_call(_fwd_stats2_kernel, x0, [p0[:2], p1[:2], w1b, w2b],
                       [("partial", (2, c3), jnp.float32)], blk, s, interpret)
    mean2, var2 = _stats_from_partials(part2, P)
    p2 = jnp.stack(_bn_consts(mean2, var2, gammas[2], betas[2], eps))

    out, argmax, ppre = _slab_call(
        partial(_fwd_final_kernel, s), x0, [p0[:2], p1[:2], p2[:2], w1b, w2b],
        [("center", (blk // s, c3), x0.dtype),
         ("center", (blk // s, c3), jnp.int32),
         ("center", (blk // s, c3), jnp.float32)], blk, s, interpret)

    stats = ((mean0, mean1, mean2), (var0, var1, var2))
    res = (x0, w1, w2, gammas, betas, stats, argmax, ppre)
    return out, stats, res


def _fused_train_fwd(x0, weights, bn, s, eps, interpret):
    out, stats, res = _fused_train_fwd_impl(x0, weights, bn, s, eps,
                                            interpret)
    return (out, stats), res


def _fused_train_bwd(s, eps, interpret, res, cts):
    g_out, _ = cts  # batch-stats outputs are stop-grad (flax BN semantics)
    (x0, w1, w2, gammas, betas, stats, argmax, ppre) = res
    means, vars_ = stats
    B, rows, c1 = x0.shape
    c2, c3 = w1.shape[1], w2.shape[1]
    blk = _pick_blk(rows, s)
    P = float(B * rows)
    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)

    mul0, add0, r0, m0r0 = _bn_consts(means[0], vars_[0], gammas[0], betas[0],
                                      eps)
    mul1, add1, r1, m1r1 = _bn_consts(means[1], vars_[1], gammas[1], betas[1],
                                      eps)
    mul2, add2, r2, m2r2 = _bn_consts(means[2], vars_[2], gammas[2], betas[2],
                                      eps)
    p0 = jnp.stack([mul0, add0, r0, m0r0])
    p1 = jnp.stack([mul1, add1, r1, m1r1])

    # layer-2 BN backward reductions from small tensors: the slab grad is
    # nonzero only at argmax slots, whose pre-activation values are ppre
    gf = g_out.astype(jnp.float32)
    d_y2s = jnp.where(ppre * mul2 + add2 > 0, gf, 0.0)   # (B, M, C3)
    dbeta2 = jnp.sum(d_y2s, axis=(0, 1))
    xhat2s = ppre * r2 - m2r2
    dgamma2 = jnp.sum(d_y2s * xhat2s, axis=(0, 1))
    s2 = (gammas[2] * r2).astype(jnp.float32)
    p2b = jnp.stack([s2 * dbeta2 / P, s2 * dgamma2 / P, r2, m2r2])
    dval = d_y2s * s2                                    # argmax scatter value

    red1, dw2 = _slab_call(
        partial(_bwd_wave1_kernel, s), x0, [p0, p1, p2b, dval, argmax,
                                            w1b, w2b],
        [("partial", (2, c2), jnp.float32),
         ("accum", (c2, c3), jnp.float32)], blk, s, interpret)
    t = jnp.sum(red1, axis=(0, 1))
    dbeta1, dgamma1 = t[0], t[1]
    s1 = (gammas[1] * r1).astype(jnp.float32)
    p1b = jnp.stack([s1, s1 * dbeta1 / P, s1 * dgamma1 / P])

    red2, dw1 = _slab_call(
        partial(_bwd_wave2_kernel, s), x0, [p0, p1, p2b, p1b, dval, argmax,
                                            w1b, w2b],
        [("partial", (2, c1), jnp.float32),
         ("accum", (c1, c2), jnp.float32)], blk, s, interpret)
    t = jnp.sum(red2, axis=(0, 1))
    dbeta0, dgamma0 = t[0], t[1]
    s0 = (gammas[0] * r0).astype(jnp.float32)
    p0b = jnp.stack([s0, s0 * dbeta0 / P, s0 * dgamma0 / P])

    d_x0 = _slab_call(
        partial(_bwd_apply_kernel, s), x0, [p0, p1, p2b, p1b, p0b, dval,
                                            argmax, w1b, w2b],
        [("slab", (blk, c1), x0.dtype)], blk, s, interpret)

    d_weights = (dw1.astype(w1.dtype), dw2.astype(w2.dtype))
    d_bn = ((dgamma0.astype(gammas[0].dtype),
             dgamma1.astype(gammas[1].dtype),
             dgamma2.astype(gammas[2].dtype)),
            (dbeta0.astype(betas[0].dtype), dbeta1.astype(betas[1].dtype),
             dbeta2.astype(betas[2].dtype)))
    return d_x0, d_weights, d_bn


_fused_train.defvjp(_fused_train_fwd, _fused_train_bwd)


def fused_bn_mlp_pool(x0, w1, w2, gammas, betas, *, stats=None, eps=1e-5,
                      interpret=None):
    """[BN -> ReLU -> Dense]x2 -> BN -> ReLU -> maxpool over the grouped slab.

    x0 (B, M, S, C1) — the grouped, center-subtracted layer-0 pre-activation
    (bf16 on the TPU path); w1 (C1, C2), w2 (C2, C3); gammas/betas: 3-tuples
    of per-channel BN parameters. stats None -> training with batch
    statistics, returns (pooled (B, M, C3), ((mean0..2), (var0..2))); the
    stats outputs are stop-grad. stats ((m, v) x3) -> eval, returns pooled.

    Use fused_sa_supported() to gate dispatch; anything it rejects should go
    through fused_bn_mlp_pool_reference (the unfused jnp chain).
    """
    B, M, S, C1 = x0.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xf = x0.reshape(B, M * S, C1)
    if stats is None:
        out, st = _fused_train(xf, (w1, w2), (gammas, betas), S, eps,
                               interpret)
        return out, st
    (m0, v0), (m1, v1), (m2, v2) = stats
    p0 = jnp.stack(_bn_consts(m0, v0, gammas[0], betas[0], eps)[:2])
    p1 = jnp.stack(_bn_consts(m1, v1, gammas[1], betas[1], eps)[:2])
    p2 = jnp.stack(_bn_consts(m2, v2, gammas[2], betas[2], eps)[:2])
    blk = _pick_blk(M * S, S)
    c3 = w2.shape[1]
    return _slab_call(partial(_eval_chain_kernel, S), xf,
                      [p0, p1, p2, w1.astype(jnp.bfloat16),
                       w2.astype(jnp.bfloat16)],
                      [("center", (blk // S, c3), x0.dtype)], blk, S,
                      interpret)


# --------------------------------------------------------------------------
# no-BN variant (the default.yaml RCNN head: USE_BN False, reference parity —
# lib/net/rcnn_net.py builds its SA MLPs without BatchNorm). Without batch
# statistics the whole chain is tile-local: ONE forward pass (slab read ->
# relu/dense chain in VMEM -> pooled out + argmax + pre-act@argmax) and ONE
# backward pass (slab read -> recompute -> sparse-argmax backward -> d_x0
# slab write, dW/db accumulated across steps). Layer-0's Dense (and bias)
# live outside in the pregroup algebra; x0 is its slab pre-activation.
# --------------------------------------------------------------------------


def _relu(x):
    """ReLU with the strict subgradient (0 at x == 0) — what jax.nn.relu,
    torch, and the fused kernels use; jnp.maximum's VJP splits ties."""
    return jnp.where(x > 0, x, jnp.zeros((), x.dtype))


def fused_mlp_pool_reference(x0, w1, b1, w2, b2, *, pool="max"):
    """Oracle: ReLU -> Dense(+bias) -> ReLU -> Dense(+bias) -> ReLU -> pool
    (the unfused SharedMLP chain with bn=False on the (B, M, S, C1) slab)."""
    dt = x0.dtype
    a0 = _relu(x0)
    x1 = (jnp.einsum("bmsc,cd->bmsd", a0, w1.astype(dt)).astype(dt)
          + b1.astype(dt))
    a1 = _relu(x1)
    x2 = (jnp.einsum("bmsc,cd->bmsd", a1, w2.astype(dt)).astype(dt)
          + b2.astype(dt))
    return _pool(_relu(x2), pool)


def _chain_nobn(x0f, b_ref, w1_ref, w2_ref):
    """Recompute the no-BN chain on a tile: returns (a0, x1f, a1, x2f);
    pre-activations rounded to bf16 at layer boundaries (Dense parity).
    b_ref rows are padded to max(C2, C3) — slice to each layer's width."""
    c2, c3 = w1_ref.shape[1], w2_ref.shape[1]
    a0 = jnp.maximum(x0f, 0.0).astype(jnp.bfloat16)
    x1f = jnp.dot(a0, w1_ref[...], preferred_element_type=jnp.float32)
    x1f = (x1f.astype(jnp.bfloat16)
           + b_ref[0:1, :c2].astype(jnp.bfloat16)).astype(jnp.float32)
    a1 = jnp.maximum(x1f, 0.0).astype(jnp.bfloat16)
    x2f = jnp.dot(a1, w2_ref[...], preferred_element_type=jnp.float32)
    x2f = (x2f.astype(jnp.bfloat16)
           + b_ref[1:2, :c3].astype(jnp.bfloat16)).astype(jnp.float32)
    return a0, x1f, a1, x2f


def _nobn_fwd_kernel(s, x_ref, b_ref, w1_ref, w2_ref,
                     out_ref, arg_ref, ppre_ref):
    *_, x2f = _chain_nobn(x_ref[0].astype(jnp.float32), b_ref, w1_ref,
                          w2_ref)
    a2 = jnp.maximum(x2f, 0.0)
    blk_m, c3 = a2.shape[0] // s, a2.shape[-1]
    shape3 = (blk_m, s, c3)
    a2r = a2.astype(jnp.bfloat16).astype(jnp.float32).reshape(shape3)
    mx = jnp.max(a2r, axis=1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    eq = a2r == jnp.broadcast_to(mx[:, None, :], shape3)
    arg = jnp.min(jnp.where(eq, s_iota, s), axis=1)
    sel = s_iota == jnp.broadcast_to(arg[:, None, :], shape3)
    ppre = jnp.sum(jnp.where(sel, x2f.reshape(shape3), 0.0), axis=1)
    out_ref[0] = mx.astype(out_ref.dtype)
    arg_ref[0] = arg
    ppre_ref[0] = ppre


def _nobn_eval_kernel(s, x_ref, b_ref, w1_ref, w2_ref, out_ref):
    *_, x2f = _chain_nobn(x_ref[0].astype(jnp.float32), b_ref, w1_ref,
                          w2_ref)
    a2 = jnp.maximum(x2f, 0.0)
    blk_m = a2.shape[0] // s
    a2r = a2.astype(out_ref.dtype).astype(jnp.float32)
    out_ref[0] = jnp.max(a2r.reshape(blk_m, s, -1), axis=1).astype(
        out_ref.dtype)


def _nobn_bwd_kernel(s, x_ref, b_ref, dval_ref, arg_ref, w1_ref, w2_ref,
                     dx0_ref, red_ref, dw1_ref, dw2_ref):
    """One-pass backward: d_x2 is the sparse argmax scatter of dval (no BN
    -> no dense correction term); dW1/dW2 accumulate across steps; the
    per-tile partial carries sum(d_x1) (= db1)."""
    x0f = x_ref[0].astype(jnp.float32)
    a0, x1f, a1, x2f = _chain_nobn(x0f, b_ref, w1_ref, w2_ref)
    blk_m, c3 = dval_ref.shape[1], dval_ref.shape[2]
    shape3 = (blk_m, s, c3)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    sel = s_iota == jnp.broadcast_to(arg_ref[0][:, None, :], shape3)
    d_x2 = jnp.where(sel, jnp.broadcast_to(dval_ref[0][:, None, :], shape3),
                     0.0).reshape(blk_m * s, c3)
    d_x2b = d_x2.astype(jnp.bfloat16)
    _accum(dw2_ref, jax.lax.dot_general(
        a1, d_x2b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    d_a1 = jax.lax.dot_general(d_x2b, w2_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_x1 = jnp.where(x1f > 0, d_a1, 0.0)
    d_x1b = d_x1.astype(jnp.bfloat16)
    _accum(dw1_ref, jax.lax.dot_general(
        a0, d_x1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    d_a0 = jax.lax.dot_general(d_x1b, w1_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dx0_ref[0] = jnp.where(x0f > 0, d_a0, 0.0).astype(dx0_ref.dtype)
    red_ref[0, 0] = jnp.stack([jnp.sum(d_x1, axis=0),
                               jnp.sum(d_x1, axis=0)])  # (2, C2) pack shape


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_nobn(x0, weights, biases, s, interpret):
    out, _, _ = _fused_nobn_fwd_impl(x0, weights, biases, s, interpret)
    return out


def _fused_nobn_fwd_impl(x0, weights, biases, s, interpret):
    w1, w2 = weights
    b1, b2 = biases
    B, rows, c1 = x0.shape
    c2, c3 = w1.shape[1], w2.shape[1]
    blk = _pick_blk(rows, s)
    bmax = max(c2, c3)
    b_pack = jnp.stack([
        jnp.pad(b1.astype(jnp.float32), (0, bmax - c2)),
        jnp.pad(b2.astype(jnp.float32), (0, bmax - c3))])
    out, argmax, ppre = _slab_call(
        partial(_nobn_fwd_kernel, s), x0,
        [b_pack, w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)],
        [("center", (blk // s, c3), x0.dtype),
         ("center", (blk // s, c3), jnp.int32),
         ("center", (blk // s, c3), jnp.float32)], blk, s, interpret)
    return out, argmax, ppre


def _fused_nobn_fwd(x0, weights, biases, s, interpret):
    out, argmax, ppre = _fused_nobn_fwd_impl(x0, weights, biases, s,
                                             interpret)
    return out, (x0, weights, biases, argmax, ppre)


def _fused_nobn_bwd(s, interpret, res, g_out):
    x0, (w1, w2), (b1, b2), argmax, ppre = res
    B, rows, c1 = x0.shape
    c2, c3 = w1.shape[1], w2.shape[1]
    blk = _pick_blk(rows, s)
    bmax = max(c2, c3)
    b_pack = jnp.stack([
        jnp.pad(b1.astype(jnp.float32), (0, bmax - c2)),
        jnp.pad(b2.astype(jnp.float32), (0, bmax - c3))])
    # relu'(x2) at the argmax slot from the saved pre-activation values
    dval = jnp.where(ppre > 0, g_out.astype(jnp.float32), 0.0)
    db2 = jnp.sum(dval, axis=(0, 1))
    d_x0, red, dw1, dw2 = _slab_call(
        partial(_nobn_bwd_kernel, s), x0,
        [b_pack, dval, argmax, w1.astype(jnp.bfloat16),
         w2.astype(jnp.bfloat16)],
        [("slab", (blk, c1), x0.dtype),
         ("partial", (2, c2), jnp.float32),
         ("accum", (c1, c2), jnp.float32),
         ("accum", (c2, c3), jnp.float32)], blk, s, interpret)
    db1 = jnp.sum(red, axis=(0, 1))[0]
    return (d_x0, (dw1.astype(w1.dtype), dw2.astype(w2.dtype)),
            (db1.astype(b1.dtype), db2.astype(b2.dtype)))


_fused_nobn.defvjp(_fused_nobn_fwd, _fused_nobn_bwd)


def fused_mlp_pool(x0, w1, b1, w2, b2, *, train=True, interpret=None):
    """No-BN fused chain: ReLU -> Dense -> ReLU -> Dense -> ReLU -> maxpool
    over the (B, M, S, C1) grouped slab (the default.yaml RCNN head). x0 is
    the layer-0 pre-activation (bias included via the pregroup algebra).
    Differentiable (custom VJP) in train mode; eval runs the single-pass
    kernel without residual outputs."""
    B, M, S, C1 = x0.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xf = x0.reshape(B, M * S, C1)
    if train:
        return _fused_nobn(xf, (w1, w2), (b1, b2), S, interpret)
    c2, c3 = w1.shape[1], w2.shape[1]
    bmax = max(c2, c3)
    b_pack = jnp.stack([
        jnp.pad(b1.astype(jnp.float32), (0, bmax - c2)),
        jnp.pad(b2.astype(jnp.float32), (0, bmax - c3))])
    blk = _pick_blk(M * S, S)
    return _slab_call(partial(_nobn_eval_kernel, S), xf,
                      [b_pack, w1.astype(jnp.bfloat16),
                       w2.astype(jnp.bfloat16)],
                      [("center", (blk // S, c3), x0.dtype)], blk, S,
                      interpret)


# --------------------------------------------------------------------------
# v2 (no-BN): the grouping gather and its transpose fold INTO the kernels.
# Inputs are the per-point layer-0 pre-activations (B, N, C1) — N points per
# ROI, a VMEM-resident table — plus flat group indices and a per-center
# subtraction term. The (B, M*S, C1) slab never exists in HBM at all: the
# forward builds one-hot rows in VMEM and feeds the MXU; the backward
# recomputes the chain the same way and scatters d_x0 back through the
# transposed one-hot, accumulating d_pre per batch element in VMEM.
# Replaces (at the SA_0 training shape): the XLA pregroup gather fusion
# (7.4 ms), the center broadcast (3.3), the d_pre one-hot scatter fusion
# (6.1), the slab-sized d_center/d_bias reduces (5.6), and both kernels'
# x0 slab HBM traffic.
# --------------------------------------------------------------------------


def _gather_x0(idx_ref, pre_ref, c_ref, s):
    """In-VMEM grouped gather: one-hot rows (BLK, N) on the MXU, bf16 round,
    minus the per-center term. Returns (oh bf16, x0f f32). idx arrives as a
    (1, 1, BLK) lane-oriented block (2-D (1, BLK) blocks violate the sublane
    tiling rule); the [:, None] column reshape is the standard pattern."""
    blk = idx_ref.shape[2]
    n = pre_ref.shape[1]
    blk_m = blk // s
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, n), 1)
    oh = ((lane - idx_ref[0, 0][:, None]) == 0).astype(jnp.bfloat16)
    g16 = jnp.dot(oh, pre_ref[0], preferred_element_type=jnp.float32
                  ).astype(jnp.bfloat16)
    c3 = g16.shape[-1]
    cfull = jnp.broadcast_to(c_ref[0][:, None, :], (blk_m, s, c3)
                             ).reshape(blk, c3)
    return oh, (g16 - cfull.astype(jnp.bfloat16)).astype(jnp.float32)


def _nobn2_fwd_kernel(s, idx_ref, pre_ref, c_ref, b_ref, w1_ref, w2_ref,
                      out_ref, arg_ref, ppre_ref):
    _, x0f = _gather_x0(idx_ref, pre_ref, c_ref, s)
    *_, x2f = _chain_nobn(x0f, b_ref, w1_ref, w2_ref)
    a2 = jnp.maximum(x2f, 0.0)
    blk_m, c3 = a2.shape[0] // s, a2.shape[-1]
    shape3 = (blk_m, s, c3)
    a2r = a2.astype(jnp.bfloat16).astype(jnp.float32).reshape(shape3)
    mx = jnp.max(a2r, axis=1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    eq = a2r == jnp.broadcast_to(mx[:, None, :], shape3)
    arg = jnp.min(jnp.where(eq, s_iota, s), axis=1)
    sel = s_iota == jnp.broadcast_to(arg[:, None, :], shape3)
    ppre = jnp.sum(jnp.where(sel, x2f.reshape(shape3), 0.0), axis=1)
    out_ref[0] = mx.astype(out_ref.dtype)
    arg_ref[0] = arg
    ppre_ref[0] = ppre


def _nobn2_eval_kernel(s, idx_ref, pre_ref, c_ref, b_ref, w1_ref, w2_ref,
                       out_ref):
    _, x0f = _gather_x0(idx_ref, pre_ref, c_ref, s)
    *_, x2f = _chain_nobn(x0f, b_ref, w1_ref, w2_ref)
    a2 = jnp.maximum(x2f, 0.0)
    blk_m = a2.shape[0] // s
    a2r = a2.astype(out_ref.dtype).astype(jnp.float32)
    out_ref[0] = jnp.max(a2r.reshape(blk_m, s, -1), axis=1).astype(
        out_ref.dtype)


def _nobn2_bwd_kernel(s, idx_ref, pre_ref, c_ref, b_ref, dval_ref, arg_ref,
                      w1_ref, w2_ref, dpre_ref, dc_ref, red_ref, dw1_ref,
                      dw2_ref):
    oh, x0f = _gather_x0(idx_ref, pre_ref, c_ref, s)
    a0, x1f, a1, x2f = _chain_nobn(x0f, b_ref, w1_ref, w2_ref)
    blk_m, c3 = dval_ref.shape[1], dval_ref.shape[2]
    shape3 = (blk_m, s, c3)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    sel = s_iota == jnp.broadcast_to(arg_ref[0][:, None, :], shape3)
    d_x2 = jnp.where(sel, jnp.broadcast_to(dval_ref[0][:, None, :], shape3),
                     0.0).reshape(blk_m * s, c3)
    d_x2b = d_x2.astype(jnp.bfloat16)
    _accum(dw2_ref, jax.lax.dot_general(
        a1, d_x2b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    d_a1 = jax.lax.dot_general(d_x2b, w2_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_x1 = jnp.where(x1f > 0, d_a1, 0.0)
    d_x1b = d_x1.astype(jnp.bfloat16)
    _accum(dw1_ref, jax.lax.dot_general(
        a0, d_x1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    d_a0 = jax.lax.dot_general(d_x1b, w1_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_x0 = jnp.where(x0f > 0, d_a0, 0.0)
    c1 = d_x0.shape[-1]
    # d_pre = oh^T @ d_x0, accumulated across the tiles of each batch elem
    dpre_p = jax.lax.dot_general(oh, d_x0.astype(jnp.bfloat16),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _():
        dpre_ref[0] = dpre_p

    @pl.when(jnp.logical_not(first))
    def _():
        dpre_ref[0] += dpre_p

    dc_ref[0] = -jnp.sum(d_x0.reshape(blk_m, s, c1), axis=1)
    red_ref[0, 0] = jnp.stack([jnp.sum(d_x1, axis=0),
                               jnp.sum(d_x1, axis=0)])


def _g2_call(kernel, idxflat, pre, center, small, out_shapes, blk, s,
             interpret):
    """pallas_call helper for the gathered (v2) kernels: grid over
    (B, rows // blk) of the VIRTUAL slab; pre is the per-batch table."""
    pl = _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    B, rows = idxflat.shape
    N, c1 = pre.shape[1], pre.shape[2]
    nblk = rows // blk
    blk_m = blk // s
    idxflat = idxflat.reshape(B, 1, rows)  # lane-oriented for the kernels
    in_specs = [
        pl.BlockSpec((1, 1, blk), lambda b, i: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, c1), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_m, c1), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for a in small:
        if a.ndim == 2:
            in_specs.append(pl.BlockSpec(a.shape, lambda b, i: (0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                (1, blk_m, a.shape[-1]), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM))
    out_specs, shapes = [], []
    for kind, trail, dtype in out_shapes:
        if kind == "partial":
            out_specs.append(pl.BlockSpec((1, 1) + trail,
                                          lambda b, i: (b, i, 0, 0),
                                          memory_space=pltpu.VMEM))
            shapes.append(jax.ShapeDtypeStruct((B, nblk) + trail, dtype))
        elif kind == "center":
            out_specs.append(pl.BlockSpec((1, blk_m, trail[-1]),
                                          lambda b, i: (b, i, 0),
                                          memory_space=pltpu.VMEM))
            shapes.append(jax.ShapeDtypeStruct((B, rows // s, trail[-1]),
                                               dtype))
        elif kind == "table":  # (B, N, C) accumulator (d_pre)
            out_specs.append(pl.BlockSpec((1, N, trail[-1]),
                                          lambda b, i: (b, 0, 0),
                                          memory_space=pltpu.VMEM))
            shapes.append(jax.ShapeDtypeStruct((B, N, trail[-1]), dtype))
        else:  # "accum"
            out_specs.append(pl.BlockSpec(trail, lambda b, i: (0, 0),
                                          memory_space=pltpu.VMEM))
            shapes.append(jax.ShapeDtypeStruct(trail, dtype))
    single = len(out_shapes) == 1
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=in_specs,
        out_specs=out_specs[0] if single else tuple(out_specs),
        out_shape=shapes[0] if single else tuple(shapes),
        interpret=interpret,
        **params,
    )(idxflat, pre.astype(jnp.bfloat16), center, *small)


def _b_pack(b1, b2):
    bmax = max(b1.shape[0], b2.shape[0])
    return jnp.stack([
        jnp.pad(b1.astype(jnp.float32), (0, bmax - b1.shape[0])),
        jnp.pad(b2.astype(jnp.float32), (0, bmax - b2.shape[0]))])


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_nobn2(pre, idx, center, wb, s, interpret):
    out, _, _ = _fused_nobn2_fwd_impl(pre, idx, center, wb, s, interpret)
    return out


def _fused_nobn2_fwd_impl(pre, idx, center, wb, s, interpret):
    w1, b1, w2, b2 = wb
    B, rows = idx.shape
    c3 = w2.shape[1]
    blk = _pick_blk(rows, s)
    out, argmax, ppre = _g2_call(
        partial(_nobn2_fwd_kernel, s), idx, pre, center,
        [_b_pack(b1, b2), w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)],
        [("center", (blk // s, c3), pre.dtype),
         ("center", (blk // s, c3), jnp.int32),
         ("center", (blk // s, c3), jnp.float32)], blk, s, interpret)
    return out, argmax, ppre


def _fused_nobn2_fwd(pre, idx, center, wb, s, interpret):
    out, argmax, ppre = _fused_nobn2_fwd_impl(pre, idx, center, wb, s,
                                              interpret)
    return out, (pre, idx, center, wb, argmax, ppre)


def _fused_nobn2_bwd(s, interpret, res, g_out):
    pre, idx, center, (w1, b1, w2, b2), argmax, ppre = res
    B, rows = idx.shape
    c1, c2, c3 = w1.shape[0], w1.shape[1], w2.shape[1]
    blk = _pick_blk(rows, s)
    dval = jnp.where(ppre > 0, g_out.astype(jnp.float32), 0.0)
    db2 = jnp.sum(dval, axis=(0, 1))
    dpre, dc, red, dw1, dw2 = _g2_call(
        partial(_nobn2_bwd_kernel, s), idx, pre, center,
        [_b_pack(b1, b2), dval, argmax, w1.astype(jnp.bfloat16),
         w2.astype(jnp.bfloat16)],
        [("table", (0, c1), jnp.float32),
         ("center", (blk // s, c1), jnp.float32),
         ("partial", (2, c2), jnp.float32),
         ("accum", (c1, c2), jnp.float32),
         ("accum", (c2, c3), jnp.float32)], blk, s, interpret)
    db1 = jnp.sum(red, axis=(0, 1))[0]
    return (dpre.astype(pre.dtype), None, dc.astype(center.dtype),
            (dw1.astype(w1.dtype), db1.astype(b1.dtype),
             dw2.astype(w2.dtype), db2.astype(b2.dtype)))


_fused_nobn2.defvjp(_fused_nobn2_fwd, _fused_nobn2_bwd)


def fused_gathered_mlp_pool(pre, idx, center, w1, b1, w2, b2, *,
                            train=True, interpret=None):
    """v2 no-BN fused chain with the grouping gather folded in:
    x0 = bf16(gather(pre, idx)) - center, then ReLU -> Dense -> ReLU ->
    Dense -> ReLU -> maxpool, all in VMEM. pre (B, N, C1) per-point layer-0
    pre-activations; idx (B, M, S) int32 group indices into N; center
    (B, M, C1) per-center subtraction (the pregroup W@c term minus the
    restored layer-0 bias row). Returns pooled (B, M, C3).

    Gradients flow to pre, center, and the weights/biases; the grouped slab
    and its cotangent never exist in HBM (the backward scatters through the
    transposed one-hot in VMEM)."""
    B, M, S = idx.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    idxflat = idx.reshape(B, M * S)
    center = center.astype(pre.dtype)
    if train:
        return _fused_nobn2(pre, idxflat, center, (w1, b1, w2, b2), S,
                            interpret)
    blk = _pick_blk(M * S, S)
    c3 = w2.shape[1]
    return _g2_call(
        partial(_nobn2_eval_kernel, S), idxflat, pre, center,
        [_b_pack(b1, b2), w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)],
        [("center", (blk // S, c3), pre.dtype)], blk, S, interpret)


def fused_gather_supported(n: int) -> bool:
    """Whether the v2 in-kernel gather handles an n-point source table."""
    return n % 128 == 0 and n <= 2048


def fused_sa_supported(shape, mlp) -> bool:
    """Whether the Pallas fused path handles this (B, M, S, C1) slab + MLP."""
    if len(mlp) != 3:
        return False
    _, m, s, c1 = shape
    return (s % 8 == 0 and (m * s) % max(s, 128) == 0 and c1 % 128 == 0
            and c1 == mlp[0] and all(c % 128 == 0 for c in mlp)
            and not env_flag("TPU3D_DISABLE_FUSED_SA"))
