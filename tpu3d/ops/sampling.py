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

from .envflags import env_flag
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
            and not env_flag("TPU3D_DISABLE_PALLAS")):
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

    # ~6-8 live (B, N) f32 temporaries in the loop body; the default ~19MB
    # scoped-VMEM limit overflows at batch-16 eval's RCNN shape (1600, 512)
    # (19.54M observed), so raise it with the footprint like _fps3nn_pallas
    vmem_bytes = min(110 * 1024 * 1024,
                     max(24 * 1024 * 1024, B * N * 4 * 10))
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes)
    except AttributeError:  # older pallas API name
        params = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_bytes)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        compiler_params=params,
        interpret=interpret,
    )(xyz_t)


@partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_with_3nn(xyz: jnp.ndarray, npoint: int):
    """Fused FPS + exact 3-NN-to-the-sampled-set.

    (B, N, 3) -> (fps_idx (B, npoint) i32,
                  nn_d2 (B, N, 3) f32, nn_idx (B, N, 3) i32).

    The PointNet++ encoder immediately needs (SA) the FPS centers and (FP,
    later) each original point's 3 nearest *among those same centers*
    (interpolate_gpu.cu three_nn with known = sampled subset). FPS already
    evaluates every (point, center) distance once to maintain its running
    min, so a per-point top-3 (d², step-index) tracker inside the pick loop
    produces the FP-level three_nn for free — the running min IS the top-1,
    and the registers come out sorted. This deletes the standalone 14 ms
    FP_0 three_nn sweep from the eval trace (see docs/ROUND3_NOTES.md).

    nn_idx values are positions into the sampled list (= what three_nn
    returns against gather(xyz, fps_idx)); ties break to the earlier pick,
    which is the lower known-index — identical to the standalone kernel and
    the CUDA scan. Requires npoint >= 3 for meaningful top-3 (smaller
    npoint falls back).
    """
    import os

    B, N, _ = xyz.shape
    vmem_ok = B * N * 4 * 16 < 28 * 1024 * 1024
    if (jax.default_backend() == "tpu" and N % 128 == 0 and N >= 256
            and npoint >= 3 and vmem_ok
            and not env_flag("TPU3D_DISABLE_PALLAS")):
        return _fps3nn_pallas(xyz, npoint)
    idx = furthest_point_sample(xyz, npoint)
    from .interpolate import three_nn

    centers = gather_points(xyz, idx)
    dist, nn_idx = three_nn(xyz, centers, differentiable=False)
    return idx, dist * dist, nn_idx


def _fps3nn_pallas(xyz: jnp.ndarray, npoint: int,
                   interpret: bool = False):
    """Batch-in-kernel fused FPS + top-3 (see furthest_point_sample_with_3nn).

    State per point: sorted (d1, i1, d2, i2, d3, i3) registers as fori_loop
    carries; each pick iteration folds the newest center via a 5-op min/max
    insertion network (same network as interpolate._three_nn_pallas). The
    epilogue folds the final center (which FPS itself never needs). ~15 live
    (B, N) f32/i32 arrays — the scoped-VMEM request is raised accordingly.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    xyz_t = jnp.transpose(xyz, (2, 0, 1))  # (3, B, N)

    def kernel(xyz_ref, out_ref, nn_d_ref, nn_i_ref):
        x = xyz_ref[0]  # (B, N)
        y = xyz_ref[1]
        z = xyz_ref[2]
        out_ref[...] = jnp.zeros((B, npoint), jnp.int32)

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)
        inf = jnp.full((B, N), jnp.inf, jnp.float32)
        zeros = jnp.zeros((B, N), jnp.int32)

        def fold(carry, last_idx, pos):
            """Fold the center at sampled-position ``pos`` (point index
            ``last_idx``) into every point's sorted top-3."""
            d1, i1, d2, i2, d3, i3 = carry
            sel = col_ids == last_idx[:, None]
            lx = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
            ly = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
            lz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
            m = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
            c1 = m < d1
            c2 = m < d2
            c3 = m < d3
            y1 = jnp.maximum(d1, m)
            d1n = jnp.minimum(d1, m)
            y2 = jnp.maximum(d2, y1)
            d2n = jnp.minimum(d2, y1)
            d3n = jnp.minimum(d3, y2)
            i1n = jnp.where(c1, pos, i1)
            i2n = jnp.where(c2, jnp.where(c1, i1, pos), i2)
            i3n = jnp.where(c3, jnp.where(c2, i2, pos), i3)
            return d1n, i1n, d2n, i2n, d3n, i3n

        def body(j, carry):
            *top, last = carry
            top = fold(tuple(top), last, j - 1)
            mind = top[0]  # running FPS min = per-point top-1
            best = jnp.max(mind, axis=1, keepdims=True)
            nxt = jnp.min(jnp.where(mind == best, col_ids, N), axis=1)
            out_ref[...] = jnp.where(out_cols == j, nxt[:, None], out_ref[...])
            return (*top, nxt)

        *top, last = jax.lax.fori_loop(
            1, npoint, body,
            (inf, zeros, inf, zeros, inf, zeros, jnp.zeros((B,), jnp.int32)))
        d1, i1, d2, i2, d3, i3 = fold(tuple(top), last, npoint - 1)
        nn_d_ref[0] = d1
        nn_d_ref[1] = d2
        nn_d_ref[2] = d3
        nn_i_ref[0] = i1
        nn_i_ref[1] = i2
        nn_i_ref[2] = i3

    vmem_bytes = min(110 * 1024 * 1024,
                     max(24 * 1024 * 1024, B * N * 4 * 24))
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes)
    except AttributeError:  # older pallas API name
        params = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_bytes)
    out, nn_d, nn_i = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, npoint), jnp.int32),
            jax.ShapeDtypeStruct((3, B, N), jnp.float32),
            jax.ShapeDtypeStruct((3, B, N), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        compiler_params=params,
        interpret=interpret,
    )(xyz_t)
    return out, jnp.transpose(nn_d, (1, 2, 0)), jnp.transpose(nn_i, (1, 2, 0))


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
