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
    """(B, N, C) source features, (B, M, 3) idx, (B, M, 3) weights -> (B, M, C)."""
    B, M, _ = idx.shape
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, M * 3)[..., None], axis=1
    ).reshape(B, M, 3, -1)
    return jnp.sum(gathered * weight[..., None], axis=2)


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
