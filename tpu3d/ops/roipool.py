"""ROI-aware point pooling — fixed-size per-box point extraction.

TPU-native replacement for roipool3d_cuda (pointrcnn/lib/utils/roipool3d/src/):
for each 3D ROI, gather the first ``num_sampled`` points inside the (optionally
enlarged) box in point-index order; when a box holds fewer points the slots wrap
around modulo the count (the CUDA kernel's `get_pooled_idx` duplicate-fill,
roipool3d_kernel.cu:123-162); an all-empty box yields zeros plus an empty flag.

Everything is one fused mask→prefix-sum→scatter→gather program: the analytic
point-in-rotated-box test replaces the kernel's `check_pt_in_box3d`, and the
wraparound fill is an index-mod, so there is no sequential loop at all — better
than the CUDA original, which serializes the first-k scan per box.

On TPU the first-k selection is one single-operand unstable s32 sort of index
keys — exact CUDA first-k-in-index-order parity at every shape (the earlier
approx_min_k variant and its TPU3D_EXACT_ROIPOOL escape hatch are gone: the
single-key sort is both exact and faster than the approx lowering was).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .box_geometry import enlarge_box3d, points_in_boxes3d


def _pool_one(pts: jnp.ndarray, feats: jnp.ndarray, boxes: jnp.ndarray,
              num_sampled: int, gather_xyz: bool = True):
    """(N, 3) pts, (N, C) feats, (M, 7) boxes -> ((M, K, 3+C), (M,) empty flag)."""
    n = pts.shape[0]
    inside = points_in_boxes3d(pts, boxes).T  # (M, N)
    # scatter-free first-k selection (see grouping._ball_query_one): index keys
    # + one min-k give the first num_sampled interior points in index order
    iota = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(inside, iota[None, :], n)
    if n < num_sampled:  # fewer points than slots: pad with sentinels
        keys = jnp.concatenate(
            [keys, jnp.full((keys.shape[0], num_sampled - n), n, jnp.int32)],
            axis=1)
    if jax.default_backend() == "tpu":
        # ONE single-operand unstable s32 sort: the ascending prefix is
        # exactly the first num_sampled interior points in index order (keys
        # are distinct, sentinels sort last) — bit-exact CUDA first-k parity,
        # AND faster than both top_k (which co-sorts an iota payload) and the
        # earlier approx_min_k (whose fallback lowering at k=512/n=16384 was
        # a stable f32 sort: 3.6 ms vs 0.9 for this one at the eval shape).
        sel = jax.lax.sort(keys, dimension=1, is_stable=False)
        sel = jax.lax.slice_in_dim(sel, 0, num_sampled, axis=1)
        counts = jnp.sum(sel < n, axis=1)  # (M,)
        slots = jnp.clip(sel, 0, n - 1)
    else:
        neg_keys, _ = jax.lax.top_k(-keys, num_sampled)
        slots = jnp.clip(-neg_keys, 0, n - 1).astype(jnp.int32)
        counts = jnp.sum(inside, axis=1)  # (M,)
    empty = counts == 0
    # wraparound duplicate fill: slot k reads slot k % count
    k = jnp.arange(num_sampled)[None, :]
    src = jnp.where(counts[:, None] > 0, k % jnp.maximum(counts[:, None], 1), 0)
    m_boxes = slots.shape[0]
    if (jax.default_backend() == "tpu"
            and m_boxes * num_sampled * num_sampled <= (1 << 28)):
        # K-wide one-hot matmul instead of a second row-by-row gather (a
        # 400k-row int gather costs ~5 ms at the eval shape; slot values
        # < 2^24 are exact in f32, 'highest' keeps them bit-exact). Bounded:
        # at TRAIN-sized ROI counts (2048/scene during --train_with_eval)
        # the (M, K, K) one-hot work outgrows the gather it replaces.
        oh = jax.nn.one_hot(src, num_sampled, dtype=jnp.float32)
        slots = jnp.einsum("mkj,mj->mk", oh, slots.astype(jnp.float32),
                           precision="highest").astype(jnp.int32)
    else:
        slots = jnp.take_along_axis(slots, src, axis=1)  # (M, K)
    # one row gather: the feature table may be bf16 (halves the dominant
    # random-read + write traffic of this 400k-row gather); callers that
    # embed the coordinates in the table (bf16 hi/lo pair) skip the second
    # xyz gather, which is pure row-latency (2.4 ms for 4.9 MB at the eval
    # shape)
    pf = feats[slots]  # (M, K, C)
    pf = jnp.where(empty[:, None, None], jnp.zeros((), pf.dtype), pf)
    if not gather_xyz:
        return None, pf, empty
    px = pts[slots]  # (M, K, 3)
    px = jnp.where(empty[:, None, None], jnp.zeros((), px.dtype), px)
    return px, pf, empty


@partial(jax.jit, static_argnames=("num_sampled", "split"))
def roipool3d(pts: jnp.ndarray, feats: jnp.ndarray, boxes3d: jnp.ndarray,
              pool_extra_width: float, num_sampled: int, split: bool = False):
    """Batched ROI point pooling.

    :param pts: (B, N, 3) rect-coord points
    :param feats: (B, N, C) per-point features (any float dtype — bf16
        halves the gather traffic on TPU)
    :param boxes3d: (B, M, 7) ROIs
    :param pool_extra_width: box enlargement before the inside test
        (cfg.RCNN.POOL_EXTRA_WIDTH)
    :param num_sampled: K points per ROI (cfg.RCNN.NUM_POINTS = 512)
    :param split: True returns ((B, M, K, 3) xyz, (B, M, K, C) feats, empty)
        without concatenating (keeps mixed dtypes apart); False returns the
        classic ((B, M, K, 3 + C) pooled, (B, M) bool empty).
        split="features" skips the xyz gather entirely and returns
        (None, feats, empty) — for callers embedding the coordinates in the
        feature table as a bf16 hi/lo pair.
    """
    big = enlarge_box3d(boxes3d, pool_extra_width)
    px, pf, empty = jax.vmap(
        lambda p, f, b: _pool_one(p, f, b, num_sampled,
                                  gather_xyz=split != "features"))(
        pts, feats, big)
    if split:
        return px, pf, empty
    return jnp.concatenate([px, pf.astype(px.dtype)], axis=-1), empty


def roipool3d_numpy(pts, feats, boxes3d, pool_extra_width, num_sampled):
    """Host oracle with identical semantics."""
    from ..kitti.boxes import enlarge_box3d as np_enlarge
    from ..kitti.boxes import points_in_boxes3d as np_inside

    pts, feats, boxes3d = map(np.asarray, (pts, feats, boxes3d))
    B, N, _ = pts.shape
    M = boxes3d.shape[1]
    C = feats.shape[-1]
    pooled = np.zeros((B, M, num_sampled, 3 + C), dtype=np.float32)
    empty = np.zeros((B, M), dtype=bool)
    for b in range(B):
        big = np_enlarge(boxes3d[b], pool_extra_width)
        inside = np_inside(pts[b], big)  # (N, M)
        data = np.concatenate([pts[b], feats[b]], axis=1)
        for m in range(M):
            hits = np.where(inside[:, m])[0]
            if len(hits) == 0:
                empty[b, m] = True
                continue
            take = hits[np.arange(num_sampled) % len(hits)]
            pooled[b, m] = data[take]
    return pooled, empty
