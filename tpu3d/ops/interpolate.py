"""three_nn / three_interpolate — PointNet++ feature propagation primitives.

TPU-native replacement for pointnet2_cuda's interpolate_gpu.cu: brute-force 3-NN
(a top-3 over the pairwise distance row — tiny N between SA levels, so the full
(M, N) distance matrix is cheap) and inverse-distance-weighted interpolation
(a gather + weighted sum; differentiable, so the CUDA grad kernel at
interpolate_gpu.cu:120-160 is unnecessary).
"""

from __future__ import annotations


from .envflags import env_flag
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("differentiable",))
def three_nn(unknown: jnp.ndarray, known: jnp.ndarray,
             differentiable: bool = True):
    """(B, M, 3) queries × (B, N, 3) sources -> ((B, M, 3) dists, (B, M, 3) idx).

    Distances are Euclidean (not squared), nearest first, matching the exact
    brute-force 3-NN of interpolate_gpu.cu:9-70. On TPU the neighbor search is
    a Pallas kernel (distance tile lives in VMEM, exact per-lane top-3 sweep —
    no (M, N) HBM round trip, unlike the earlier approx_min_k formulation which
    was also only 0.99-recall); elsewhere it falls back to approx_min_k, which
    is exact on CPU.

    differentiable=True recomputes the picked distances from coordinates
    outside the kernel so gradients flow to both point sets (the training
    path); differentiable=False returns the kernel's own exact distances,
    skipping a 400k-row coordinate gather (the inference path — the reference
    CUDA op has no distance gradient either, interpolate_gpu.cu).
    """
    B, M, _ = unknown.shape
    N = known.shape[1]
    if (jax.default_backend() == "tpu" and M % 128 == 0 and M >= 128
            and not env_flag("TPU3D_DISABLE_PALLAS")):
        d2k, idx = _three_nn_pallas(unknown, known)
        if not differentiable:
            return jnp.sqrt(jnp.maximum(d2k, 0.0)), idx
        return nn_dist_from_idx(unknown, known, idx), idx
    d2 = jnp.sum((unknown[:, :, None, :] - known[:, None, :, :]) ** 2, axis=-1)
    min_d2, idx = jax.lax.approx_min_k(d2, 3, recall_target=0.99)
    return jnp.sqrt(jnp.maximum(min_d2, 0.0)), idx.astype(jnp.int32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _three_nn_idx_pallas(unknown, known, interpret=False):
    """Back-compat shim: indices only."""
    return _three_nn_pallas(unknown, known, interpret=interpret)[1]


@partial(jax.jit, static_argnames=("interpret",))
def _three_nn_pallas(unknown: jnp.ndarray, known: jnp.ndarray,
                     interpret: bool = False):
    """Exact 3-NN indices on TPU. A fori_loop sweeps W-point blocks of the
    sources, maintaining exact per-lane top-3 (value, index) registers via a
    vectorized 3-way insertion; the true top-3 of a row always survive in the
    per-lane registers (at most two other elements are globally smaller), so
    three exact picks over the (TILE_M, W) candidates finish the job. The
    (TILE_M, N) distance matrix is never materialized — working set is ~8
    (TILE_M, W) arrays, far under the 16MB scoped-vmem limit. Returns
    ((B, M, 3) f32 squared dists, (B, M, 3) int32 idx), nearest first; ties
    break to the lowest index (matching interpolate_gpu.cu's stable scan)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, M, _ = unknown.shape
    N = known.shape[1]
    NPAD = _round_up(N, 128)
    W = next(w for w in (256, 128) if NPAD % w == 0)
    NB = NPAD // W
    # working set ~10 live (tile_m, W) f32 arrays + Mosaic temps of similar
    # order; the 5MB budget keeps the true footprint under the 16MB
    # scoped-vmem limit (tile 512, W 256 measured fastest at the FP shapes)
    tile_m = min(M, max(8, (5 * 1024 * 1024 // (10 * W * 4)) // 128 * 128))
    tile_m = min(tile_m, 512)
    while M % tile_m != 0:
        tile_m -= 1
    u_t = jnp.transpose(unknown, (0, 2, 1))  # (B, 3, M)
    k_t = jnp.transpose(known, (0, 2, 1))  # (B, 3, N)
    if NPAD != N:  # pad far away so padded columns never win
        k_t = jnp.pad(k_t, ((0, 0), (0, 0), (0, NPAD - N)),
                      constant_values=1e9)

    def kernel(u_ref, k_ref, out_ref, d_ref):
        ux = u_ref[0, 0][:, None]  # (TILE_M, 1)
        uy = u_ref[0, 1][:, None]
        uz = u_ref[0, 2][:, None]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_m, W), 1)

        def sweep(b, carry):
            d1, i1, d2, i2, d3, i3 = carry
            kx = k_ref[0, 0, pl.ds(b * W, W)][None, :]
            ky = k_ref[0, 1, pl.ds(b * W, W)][None, :]
            kz = k_ref[0, 2, pl.ds(b * W, W)][None, :]
            m = (ux - kx) ** 2 + (uy - ky) ** 2 + (uz - kz) ** 2
            idx = b * W + lane
            # 3-way insertion as a min/max sorting network for the distances
            # (5 ops instead of a 6-where shift chain) + compare-driven
            # selects for the indices; strict < keeps earlier (lower)
            # indices on ties
            c1 = m < d1
            c2 = m < d2
            c3 = m < d3
            y1 = jnp.maximum(d1, m)
            d1n = jnp.minimum(d1, m)
            y2 = jnp.maximum(d2, y1)
            d2n = jnp.minimum(d2, y1)
            d3n = jnp.minimum(d3, y2)
            i1n = jnp.where(c1, idx, i1)
            i2n = jnp.where(c2, jnp.where(c1, i1, idx), i2)
            i3n = jnp.where(c3, jnp.where(c2, i2, idx), i3)
            return d1n, i1n, d2n, i2n, d3n, i3n

        inf = jnp.full((tile_m, W), jnp.inf, jnp.float32)
        zero = jnp.zeros((tile_m, W), jnp.int32)
        d1, i1, d2, i2, d3, i3 = jax.lax.fori_loop(
            0, NB, sweep, (inf, zero, inf, zero, inf, zero))

        big = jnp.int32(NPAD * NB + 1)
        for s in range(3):
            cmin = jnp.min(d1, axis=1, keepdims=True)
            # among equal-distance candidates take the lowest point index
            chosen = jnp.min(jnp.where(d1 == cmin, i1, big), axis=1)
            out_ref[0, s] = chosen
            d_ref[0, s] = cmin[:, 0]
            sel = jnp.logical_and(d1 == cmin, i1 == chosen[:, None])
            # shift the selected lane's register stack up one slot
            d1 = jnp.where(sel, d2, d1)
            i1 = jnp.where(sel, i2, i1)
            d2 = jnp.where(sel, d3, d2)
            i2 = jnp.where(sel, i3, i2)
            d3 = jnp.where(sel, jnp.inf, d3)

    idx_o, d_o = pl.pallas_call(
        kernel,
        grid=(B, M // tile_m),
        in_specs=[
            pl.BlockSpec((1, 3, tile_m), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, NPAD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, tile_m), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_m), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 3, M), jnp.int32),
            jax.ShapeDtypeStruct((B, 3, M), jnp.float32),
        ),
        interpret=interpret,
    )(u_t, k_t)
    return (jnp.transpose(d_o, (0, 2, 1)),
            jnp.transpose(idx_o, (0, 2, 1)))  # ((B,M,3) d2, (B,M,3) idx)


def _pick_coords(known: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) coords gathered by (B, M, 3) idx -> (B, M, 3, 3). On TPU the
    row gather runs as an exact f32 one-hot einsum on the MXU (XLA fuses the
    one-hot into the dot; random-row gathers cost ~4.5 ms at the FP_0
    training shape vs ~0.5 ms of f32 matmul) — bitwise-equal values, and the
    VJP is the transposed einsum instead of a serialized scatter."""
    B, M, _ = idx.shape
    N = known.shape[1]
    if jax.default_backend() == "tpu" and N <= 8192:
        oh = jax.nn.one_hot(idx.reshape(B, M * 3), N, dtype=jnp.float32)
        return jnp.einsum("bkn,bnc->bkc", oh, known.astype(jnp.float32),
                          precision="highest").reshape(B, M, 3, 3)
    return jnp.take_along_axis(
        known, idx.reshape(B, M * 3)[..., None], axis=1).reshape(B, M, 3, 3)


def nn_dist_from_idx(unknown: jnp.ndarray, known: jnp.ndarray,
                     idx: jnp.ndarray) -> jnp.ndarray:
    """Differentiable recompute of the picked 3-NN distances from coordinates
    ((B, M, 3) queries, (B, N, 3) sources, (B, M, 3) idx) — the training path
    of three_nn, shared by the fused FPS+3NN route."""
    picked = _pick_coords(known, idx)
    d2 = jnp.sum((unknown[:, :, None, :] - picked) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@jax.jit
def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) source features, (B, M, 3) idx, (B, M, 3) weights -> (B, M, C).

    On TPU the weighted 3-NN gather is reformulated as a sparse-row matmul on
    the MXU: the three (weight, index) pairs of each output row are summed into
    one one-hot bf16 row of width N, and a single (M, N) x (N, C) matmul does
    gather + weighting + reduction in one pass (random-access gathers run ~30x
    below HBM bandwidth on TPU; the MXU FLOP overspend is free by comparison).
    Chunked over M to bound the one-hot buffer. bf16 feature rounding matches
    the grouping fast path (activations tolerate it; f32 accumulate); gradients
    flow through weights and features as with the gather formulation.

    Measured on v5e (B=8): one-hot wins up to N=1024 sources (0.71 -> 0.53 ms
    at the (256, 1024, 512) level; 1.20 -> 0.84 ms at (1024, 4096, 256)) and
    loses at N=4096 where the one-hot traffic overtakes the gather, hence the
    N <= 1024 dispatch bound. Above it the forward stays a gather but carries
    a custom VJP whose feature gradient is a chunked one-hot MXU matmul —
    XLA's native take_along_axis VJP is a serialized scatter-add that costs
    13.3 ms/step at the FP_0 training shape (docs/TRAIN_PROFILE.md); the
    matmul transpose is ~3 ms of MXU time, mirroring the CUDA grad kernel's
    atomic-add design being replaced wholesale (interpolate_gpu.cu:120-160).
    """
    B, M, _ = idx.shape
    N, C = features.shape[1], features.shape[-1]
    if jax.default_backend() == "tpu" and C >= 16:
        if N <= 1024:
            return _three_interpolate_onehot(features, idx, weight)
        if (C % 128 == 0 and N % 128 == 0 and M % 8 == 0
                and N * C * 2 <= 8 * 1024 * 1024
                and not env_flag("TPU3D_DISABLE_PALLAS")):
            # wide table that still fits VMEM (FP_0: N=4096, C=256): the
            # fully-fused Pallas path — in-kernel one-hot rows feeding the
            # MXU, VMEM-resident d_features accumulator (see kernel block
            # comment above _ti_fwd_kernel)
            return _three_interpolate_pallas(features, idx, weight, False)
        return _three_interpolate_gather_mxu_vjp(features, idx, weight)
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, M * 3)[..., None], axis=1
    ).reshape(B, M, 3, -1)
    return jnp.sum(gathered * weight[..., None], axis=2)


# one-hot chunk budget for the custom-VJP feature gradient (tests shrink it
# to exercise the scan-accumulate path at small shapes)
# budget for the pre-reduction (B, chunk, 3, N) bf16 one-hot slab — the
# peak transient of the chunked one-hot matmuls (6 bytes per (b, m) column:
# 3 neighbor rows x bf16). 96 MB keeps FP_0-shape chunks at the profiled
# sizes (e.g. B16/N4096 -> chunk 256) while bounding the slab honestly.
_ONEHOT_SLAB_BYTES = 96 * 1024 * 1024


# --------------------------------------------------------------------------
# Fully-fused Pallas interpolation for wide tables (FP_0: N=4096, M=16384,
# C=256). The source table lives in VMEM per batch element; the weighted
# one-hot rows are BUILT IN-KERNEL and immediately consumed by the MXU, so
# neither the (M, N) row matrix nor any gathered slab ever touches HBM. The
# backward accumulates d_features into a VMEM-resident (N, C) block across
# the M-tiles of each batch element and emits the weight grads from three
# unweighted one-hot dots. Replaces: the XLA row-gather forward (random-row
# reads run ~30x under HBM bandwidth) and the chunked-scan backward whose
# (B, N, C) f32 accumulator XLA spilled to HBM (64 round trips/step at the
# FP_0 training shape — the dominant interpolate cost in the r4 trace).
# --------------------------------------------------------------------------


def _ti_fwd_kernel(tm, n, f_ref, i_ref, w_ref, o_ref):
    """idx/weight arrive transposed as (1, 3, tm) blocks: row slices give
    clean (tm,) vectors whose [:, None] sublane broadcast Mosaic handles
    (the lane-dim-3 layout of an untransposed block does not relayout)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    rows = jnp.zeros((tm, n), jnp.bfloat16)
    for j in range(3):
        sel = (lane - i_ref[0, j][:, None]) == 0
        rows = rows + (sel.astype(jnp.bfloat16)
                       * w_ref[0, j][:, None].astype(jnp.bfloat16))
    o_ref[0] = jnp.dot(rows, f_ref[0],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _ti_bwd_kernel(tm, n, f_ref, i_ref, w_ref, g_ref, df_ref, dw_ref):
    pl = _pl()
    lane = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    gb = g_ref[0].astype(jnp.bfloat16)
    # dw_j[m] = <features[idx_j[m]], g[m]> = p[m, idx_j[m]] with
    # p = g @ features^T — ONE dot for all three neighbor slots, extracted
    # through the same selection masks that build the weighted rows
    p = jax.lax.dot_general(gb, f_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    rows = jnp.zeros((tm, n), jnp.bfloat16)
    for j in range(3):
        sel = (lane - i_ref[0, j][:, None]) == 0
        rows = rows + (sel.astype(jnp.bfloat16)
                       * w_ref[0, j][:, None].astype(jnp.bfloat16))
        dw_ref[0, j] = jnp.sum(jnp.where(sel, p, 0.0), axis=1)
    dfp = jax.lax.dot_general(rows, gb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    first = pl.program_id(1) == 0  # new batch element -> fresh accumulator

    @pl.when(first)
    def _():
        df_ref[0] = dfp

    @pl.when(jnp.logical_not(first))
    def _():
        df_ref[0] += dfp


def _pl():
    from jax.experimental import pallas as pl
    return pl


def _ti_pick_tm(m: int, target: int = 512) -> int:
    tm = min(m, target)
    while m % tm != 0:
        tm -= 8
    return max(tm, 8)


def _ti_pallas_fwd_impl(features, idx, weight, interpret):
    pl = _pl()
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = features.shape
    M = idx.shape[1]
    tm = _ti_pick_tm(M)
    fb = features.astype(jnp.bfloat16)
    i_t = jnp.transpose(idx, (0, 2, 1))      # (B, 3, M)
    w_t = jnp.transpose(weight, (0, 2, 1)).astype(jnp.float32)
    params = ({} if interpret else {"compiler_params":
               __import__("jax.experimental.pallas.tpu", fromlist=["x"]
               ).CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)})
    out = pl.pallas_call(
        partial(_ti_fwd_kernel, tm, N),
        grid=(B, M // tm),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), features.dtype),
        interpret=interpret,
        **params,
    )(fb, i_t, w_t)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _three_interpolate_pallas(features, idx, weight, interpret):
    return _ti_pallas_fwd_impl(features, idx, weight, interpret)


def _ti_pallas_fwd(features, idx, weight, interpret):
    return (_ti_pallas_fwd_impl(features, idx, weight, interpret),
            (features, idx, weight))


def _ti_pallas_bwd(interpret, res, g):
    pl = _pl()
    from jax.experimental.pallas import tpu as pltpu

    features, idx, weight = res
    B, N, C = features.shape
    M = idx.shape[1]
    tm = _ti_pick_tm(M)
    fb = features.astype(jnp.bfloat16)
    i_t = jnp.transpose(idx, (0, 2, 1))      # (B, 3, M)
    w_t = jnp.transpose(weight, (0, 2, 1)).astype(jnp.float32)
    params = ({} if interpret else {"compiler_params":
               __import__("jax.experimental.pallas.tpu", fromlist=["x"]
               ).CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)})
    df, dw = pl.pallas_call(
        partial(_ti_bwd_kernel, tm, N),
        grid=(B, M // tm),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, M), jnp.float32),
        ),
        interpret=interpret,
        **params,
    )(fb, i_t, w_t, g)
    return (df.astype(features.dtype), None,
            jnp.transpose(dw, (0, 2, 1)).astype(weight.dtype))


_three_interpolate_pallas.defvjp(_ti_pallas_fwd, _ti_pallas_bwd)


def _ti_gather_fwd_impl(features, idx, weight):
    B, M, _ = idx.shape
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, M * 3)[..., None], axis=1
    ).reshape(B, M, 3, -1)
    return jnp.sum(gathered * weight[..., None], axis=2)


@jax.custom_vjp
def _three_interpolate_gather_mxu_vjp(features, idx, weight):
    return _ti_gather_fwd_impl(features, idx, weight)


def _ti_gather_vjp_fwd(features, idx, weight):
    return _ti_gather_fwd_impl(features, idx, weight), (features, idx, weight)


def _ti_gather_vjp_bwd(res, g):
    features, idx, weight = res
    B, M, _ = idx.shape
    N, C = features.shape[1], features.shape[-1]
    # grad wrt weight: regather the picked rows (row-latency gather, ~same
    # cost as the forward) and dot against the cotangent — cheaper than
    # saving the (B, M, 3, C) product as a residual (805 MB at FP_0 shape)
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, M * 3)[..., None], axis=1
    ).reshape(B, M, 3, C)
    gw = jnp.einsum("bmjc,bmc->bmj", gathered.astype(jnp.float32),
                    g.astype(jnp.float32))
    # grad wrt features: transpose of the interpolation operator applied to g
    # — a (N, M)·(M, C) sparse matmul with 3 nnz per column, run as chunked
    # weighted-one-hot bf16 matmuls on the MXU with an f32 accumulator
    # (replaces XLA's serialized scatter-add VJP)
    chunk = max(1, min(M, _ONEHOT_SLAB_BYTES // max(B * N * 6, 1)))
    if chunk < M and M % chunk != 0:
        # pad to a chunk multiple instead of shrinking chunk toward 1 (a
        # near-prime M would degrade to M sequential scan steps): padded rows
        # carry index N (all-zero one-hot) and zero weight/cotangent
        n_chunks = -(-M // chunk)
        pad = n_chunks * chunk - M
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)), constant_values=N)
        weight = jnp.pad(weight, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        M = n_chunks * chunk
    gb = g.astype(jnp.bfloat16)
    if chunk == M:
        rows = jnp.sum(
            jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
            * weight[..., None].astype(jnp.bfloat16), axis=2)
        gf = jnp.einsum("bmn,bmc->bnc", rows, gb,
                        preferred_element_type=jnp.float32)
    else:
        n_chunks = M // chunk
        parts_i = idx.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
        parts_w = weight.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
        parts_g = gb.reshape(B, n_chunks, chunk, C).transpose(1, 0, 2, 3)

        def body(acc, args):
            ic, wc, gc = args
            rows = jnp.sum(
                jax.nn.one_hot(ic, N, dtype=jnp.bfloat16)
                * wc[..., None].astype(jnp.bfloat16), axis=2)
            return acc + jnp.einsum("bmn,bmc->bnc", rows, gc,
                                    preferred_element_type=jnp.float32), None

        gf, _ = jax.lax.scan(body, jnp.zeros((B, N, C), jnp.float32),
                             (parts_i, parts_w, parts_g))
    return gf.astype(features.dtype), None, gw.astype(weight.dtype)


_three_interpolate_gather_mxu_vjp.defvjp(_ti_gather_vjp_fwd,
                                         _ti_gather_vjp_bwd)


def _three_interpolate_onehot(features: jnp.ndarray, idx: jnp.ndarray,
                              weight: jnp.ndarray) -> jnp.ndarray:
    B, M, _ = idx.shape
    N, C = features.shape[1], features.shape[-1]
    fb = features.astype(jnp.bfloat16)
    n_rows = M
    # chunk so the (B, chunk, 3, N) bf16 one-hot slab stays under budget
    chunk = max(1, min(M, _ONEHOT_SLAB_BYTES // max(B * N * 6, 1)))
    if chunk < M and M % chunk != 0:
        # pad to a chunk multiple (see _ti_gather_vjp_bwd): padded rows
        # produce zeros and are sliced off below
        n_chunks = -(-M // chunk)
        pad = n_chunks * chunk - M
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)), constant_values=N)
        weight = jnp.pad(weight, ((0, 0), (0, pad), (0, 0)))
        M = n_chunks * chunk

    def do_chunk(args):
        ic, wc = args  # (B, chunk, 3)
        rows = jnp.sum(
            jax.nn.one_hot(ic, N, dtype=jnp.bfloat16)
            * wc[..., None].astype(jnp.bfloat16), axis=2)  # (B, chunk, N)
        return jnp.einsum("bmn,bnc->bmc", rows, fb,
                          preferred_element_type=jnp.float32)

    if chunk == M:
        out = do_chunk((idx, weight))
    else:
        parts_i = idx.reshape(B, M // chunk, chunk, 3).transpose(1, 0, 2, 3)
        parts_w = weight.reshape(B, M // chunk, chunk, 3).transpose(1, 0, 2, 3)
        out = jax.lax.map(do_chunk, (parts_i, parts_w)).transpose(
            1, 0, 2, 3).reshape(B, M, C)
    return out[:, :n_rows].astype(features.dtype)


def interpolation_weights(dist: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weights normalized to 1 (pointnet2_modules parity)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def three_nn_numpy(unknown: np.ndarray, known: np.ndarray):
    """Host oracle."""
    unknown, known = np.asarray(unknown), np.asarray(known)
    B, M, _ = unknown.shape
    dists = np.zeros((B, M, 3))
    idx = np.zeros((B, M, 3), dtype=np.int32)
    for b in range(B):
        d2 = np.sum((unknown[b][:, None] - known[b][None]) ** 2, axis=-1)
        order = np.argsort(d2, axis=1, kind="stable")[:, :3]
        idx[b] = order
        dists[b] = np.sqrt(np.take_along_axis(d2, order, axis=1))
    return dists, idx
