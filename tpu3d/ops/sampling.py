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

    Dispatches to the Pallas kernel on TPU (running-min distances live in VMEM
    for the whole pick loop); the lax.fori_loop path is the portable fallback
    and the test oracle's jax twin.
    """
    import os

    B, N, _ = xyz.shape
    # batch-in-kernel Pallas FPS: the full (B, N) running-min state + (B, N)
    # coordinates live in VMEM for the whole pick loop (one grid cell, every
    # iteration fully batched on the VPU). Budget check keeps ~6·(B, N) f32
    # buffers under half of a v5e core's 128MB VMEM (the RCNN's (800, 512)
    # TEST shape needs ~10MB; the XLA fallback costs 41 ms there vs ~3 ms
    # in-kernel).
    vmem_ok = B * N * 4 * 6 < 64 * 1024 * 1024
    if (jax.default_backend() == "tpu" and N % 128 == 0 and N >= 256
            and npoint >= 1 and vmem_ok
            and not os.environ.get("TPU3D_DISABLE_PALLAS")):
        return _fps_pallas(xyz, npoint)
    return _fps_xla(xyz, npoint)


@partial(jax.jit, static_argnames=("npoint",))
def _fps_xla(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
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


def _fps_pallas(xyz: jnp.ndarray, npoint: int,
                interpret: bool = False) -> jnp.ndarray:
    """Batch-in-kernel Pallas FPS: a single grid cell holds the whole batch's
    (B, N) coordinates and running-min distances in VMEM; every pick iteration
    is one fully-batched VPU pass (distance update + per-row masked argmax +
    masked coordinate extraction), so neither the batch nor the pick loop ever
    touches HBM. This is the CUDA kernel's shared-memory reduction
    (sampling_gpu.cu:94-180) lifted to the whole batch; the XLA fallback pays
    HBM round-trips + per-iteration gather overhead instead.

    Mosaic TC kernels have no dynamic scalar gathers/scatters, so the last
    picks' coordinates come from masked row reductions and output slots are
    written with masked column updates.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    xyz_t = jnp.transpose(xyz, (2, 0, 1))  # (3, B, N)

    def kernel(xyz_ref, out_ref, dist_ref):
        x = xyz_ref[0]  # (B, N)
        y = xyz_ref[1]
        z = xyz_ref[2]
        dist_ref[...] = jnp.full((B, N), jnp.inf, jnp.float32)
        out_ref[...] = jnp.zeros((B, npoint), jnp.int32)

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)

        def body(j, last_idx):
            sel = col_ids == last_idx[:, None]  # (B, N)
            lx = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
            ly = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
            lz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
            d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
            mind = jnp.minimum(dist_ref[...], d2)
            dist_ref[...] = mind
            best = jnp.max(mind, axis=1, keepdims=True)  # (B, 1)
            nxt = jnp.min(jnp.where(mind == best, col_ids, N), axis=1)  # (B,)
            out_ref[...] = jnp.where(out_cols == j, nxt[:, None], out_ref[...])
            return nxt

        jax.lax.fori_loop(1, npoint, body, jnp.zeros((B,), jnp.int32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(xyz_t)


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
