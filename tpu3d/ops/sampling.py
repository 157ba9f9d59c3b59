"""Furthest point sampling and point gathering.

TPU-native replacement for pointnet2_cuda's sampling kernels
(pointnet2_lib/pointnet2/src/sampling_gpu.cu): FPS is inherently sequential in the
number of picks (the CUDA kernel also loops j=1..m), so it is expressed as a
``lax.fori_loop`` whose body is one fully-vectorized distance update + argmax over
all N points — O(m·N) work, identical to the CUDA algorithm, with the running
min-distance kept as a live (B, N) value that XLA keeps on-chip between
iterations. Gathers are plain ``jnp.take_along_axis`` (differentiable for free —
no hand-written grad kernels needed, unlike sampling_gpu.cu:46-90).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32 indices; first pick is point 0 (CUDA parity).

    Padding convention: callers padding N with duplicate points are safe — a
    duplicate has distance 0 to its twin and is never picked while distinct
    points remain.
    """
    B, N, _ = xyz.shape

    def one_batch(pts):
        def body(i, carry):
            idx, min_dist, last = carry
            d = jnp.sum((pts - last) ** 2, axis=-1)  # (N,)
            min_dist = jnp.minimum(min_dist, d)
            nxt = jnp.argmax(min_dist).astype(jnp.int32)
            idx = idx.at[i].set(nxt)
            return idx, min_dist, pts[nxt]

        idx0 = jnp.zeros(npoint, dtype=jnp.int32)
        init = (idx0, jnp.full(N, jnp.inf, dtype=pts.dtype), pts[0])
        idx, _, _ = jax.lax.fori_loop(1, npoint, body, init)
        return idx

    return jax.vmap(one_batch)(xyz)


@jax.jit
def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) gathered by (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(features, idx[..., None], axis=1)


def furthest_point_sample_numpy(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """Host FPS oracle, (B, N, 3) -> (B, npoint)."""
    xyz = np.asarray(xyz)
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        min_dist = np.full(N, np.inf)
        last = 0
        for i in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, last]) ** 2, axis=-1)
            min_dist = np.minimum(min_dist, d)
            last = int(np.argmax(min_dist))
            out[b, i] = last
    return out
