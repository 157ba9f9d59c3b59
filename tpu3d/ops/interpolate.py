"""three_nn / three_interpolate — PointNet++ feature propagation primitives.

TPU-native replacement for pointnet2_cuda's interpolate_gpu.cu: brute-force 3-NN
(a top-3 over the pairwise distance row — tiny N between SA levels, so the full
(M, N) distance matrix is cheap) and inverse-distance-weighted interpolation
(a gather + weighted sum; differentiable, so the CUDA grad kernel at
interpolate_gpu.cu:120-160 is unnecessary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """(B, M, 3) queries × (B, N, 3) sources -> ((B, M, 3) dists, (B, M, 3) idx).

    Distances are Euclidean (not squared), nearest first, matching
    interpolate_gpu.cu:9-70. Uses the TPU-native ``lax.approx_min_k``
    (PartialReduce) — ~10x faster than a full top_k sort at the FP-0 layer's
    (16384, 4096) shape; exact on CPU, >=0.99-recall approximate on TPU (the
    inverse-distance interpolation is insensitive to an occasional
    3rd-nearest swap).
    """
    d2 = jnp.sum((unknown[:, :, None, :] - known[:, None, :, :]) ** 2, axis=-1)
    min_d2, idx = jax.lax.approx_min_k(d2, 3, recall_target=0.99)
    return jnp.sqrt(jnp.maximum(min_d2, 0.0)), idx.astype(jnp.int32)


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
    N <= 1024 dispatch bound.
    """
    B, M, _ = idx.shape
    N, C = features.shape[1], features.shape[-1]
    if jax.default_backend() == "tpu" and N <= 1024 and C >= 16:
        return _three_interpolate_onehot(features, idx, weight)
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, M * 3)[..., None], axis=1
    ).reshape(B, M, 3, -1)
    return jnp.sum(gathered * weight[..., None], axis=2)


def _three_interpolate_onehot(features: jnp.ndarray, idx: jnp.ndarray,
                              weight: jnp.ndarray) -> jnp.ndarray:
    B, M, _ = idx.shape
    N, C = features.shape[1], features.shape[-1]
    fb = features.astype(jnp.bfloat16)
    # ~32MB one-hot chunks (B x chunk x N bf16)
    chunk = max(1, min(M, (32 * 1024 * 1024) // max(B * N * 2, 1)))
    while M % chunk != 0:
        chunk -= 1

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
    return out.astype(features.dtype)


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
