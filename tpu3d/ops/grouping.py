"""Ball query + grouping — the neighborhood primitive of PointNet++ SA layers.

TPU-native replacement for pointnet2_cuda's ball_query_gpu.cu / group_points_gpu.cu.
Semantics match the CUDA kernel exactly: for each query center, take the first
``nsample`` points (in index order) whose squared distance is < radius²; if fewer
than ``nsample`` qualify, the remaining slots repeat the *first* qualifying index;
if none qualify, all slots are 0 (ball_query_gpu.cu:9-44 fills with the first hit
and leaves zeros when there is no hit).

The order-preserving "first k within radius" is computed without sorting: a
prefix-sum of the in-radius mask gives each point its slot, and a scatter-drop
writes indices into the fixed-size slot buffer. The (M, N) mask never needs to be
materialized at full batch size — callers can chunk the query dimension via
``query_chunk`` to bound the (chunk, N) distance tile (this is what keeps the
op HBM-friendly at N=16384; a Pallas fusion of query+group+MLP is the planned
fast path).
"""

from __future__ import annotations


from .envflags import env_flag, env_int
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# budget for the (B, chunk, N) bf16 one-hot slab materialized by the
# gather-backward MXU matmul (mirrors interpolate._ONEHOT_SLAB_BYTES)
_ONEHOT_SLAB_BYTES = 96 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nk_tiling(M: int, NPAD: int, k: int, with_coords: bool,
               windowed: bool = False):
    """Shared tiling choice for the nearest-k kernel and its windowed
    wrapper (which must know tile_m to build per-tile sweep windows)."""
    # the k-pick epilogue costs k reduction passes over (tile_m, W): at
    # k <= 32 a 256-lane candidate window halves that for a negligible rise
    # in lane collisions (still ~8 candidate slots per pick)
    w_pref = (256, 128) if (k <= 32 and NPAD >= 2048) else (512, 256, 128)
    W = next(w for w in w_pref if NPAD % w == 0)
    NB = NPAD // W
    if windowed and M % 128 == 0:
        # depth-windowed sweep: total sweep work ≈ tile_m·N + n_tiles·margin
        # (each tile sweeps only its own z-window, and the windows tile the
        # sorted point range), so SMALL center tiles win — the 4MB-budget
        # tile that amortizes best for full sweeps would merge many windows.
        # With the sweep collapsed, the k-pick epilogue dominates; its cost
        # is linear in W (A/B via TPU3D_NK_WIN_W; collisions stay rare
        # because the windows keep candidate bands short).
        # valid override: a positive multiple of 128 (TPU lane tile) that
        # divides NPAD, fits it, AND keeps the kernel's live carries (up to
        # 9 (128, W) f32 arrays with coords, plus Mosaic temps) inside an
        # 8MB slice of the 16MB scoped-VMEM budget — anything else is
        # ignored (negative or tiny values would produce negative block ids
        # / sub-tile lanes; huge ones would Mosaic-fail at compile)
        w_env = env_int("TPU3D_NK_WIN_W")
        n_live = 9 if with_coords else 6
        w_vmem_max = (8 * 1024 * 1024) // (n_live * 128 * 4)
        if (w_env is not None and 128 <= w_env <= min(NPAD, w_vmem_max)
                and w_env % 128 == 0 and NPAD % w_env == 0):
            W = w_env
            NB = NPAD // W
        return W, NB, 128
    # working set ~6 (9 with coords) live (tile_m, W) f32 arrays (+ Mosaic
    # temps); measured fastest at the 4MB budget — bigger tiles were slower
    n_live = 9 if with_coords else 6
    tile_m = min(M, max(8, (4 * 1024 * 1024 // (n_live * W * 4)) // 128 * 128))
    while M % tile_m != 0:  # largest divisor of M under the VMEM budget
        tile_m -= 1
    return W, NB, tile_m


@partial(jax.jit, static_argnames=("k", "interpret", "with_coords"))
def _nearest_k_pallas(centers: jnp.ndarray, pts: jnp.ndarray, k: int,
                      interpret: bool = False, with_coords: bool = False,
                      win=None, oids=None):
    """(B, M, 3) × (B, N, 3) -> ((B, M, k) d2, (B, M, k) idx), nearest first.

    Fused Pallas kernel; the (TILE_M, N) distance matrix is never
    materialized anywhere: a fori_loop sweeps W-point blocks, computing one
    (TILE_M, W) distance slab on the VPU and folding it into a per-lane
    running min (value + block id), then k cheap iterative picks select from
    the (TILE_M, W) candidates. Working set is ~6 (TILE_M, W) arrays — far
    under the 16MB scoped-vmem limit (the earlier whole-matrix formulation
    blew it at the SA_1 shape). The earlier approx_min_k formulation also
    round-tripped the distance matrix through HBM (16.6 ms at the RPN SA_0
    shape).

    Approximation (same family as approx_min_k): two true nearest neighbors
    whose point indices are congruent mod W collide and only the nearer
    survives; with W=512 and k<=64 the expected miss is ~1 per row, and any
    replacement candidate is still the next-nearest in its lane — harmless for
    ball-query semantics, where which k in-radius points are returned is
    arbitrary (ball_query_gpu.cu takes the first k in memory order).

    ``win`` (optional): per-(batch, center-tile) sweep windows as a pair of
    (B, M // tile_m) int32 arrays (lo_block, hi_block) — the fori sweep runs
    [lo, hi) instead of [0, NB). Used by ``nearest_k_windowed``, which sorts
    points and centers by depth so each tile only sweeps the blocks that can
    contain points within the query radius. Rows whose window excludes some
    true nearest neighbors simply report inf distance for the missing slots
    (the ball-query radius filter discards those anyway).

    ``oids`` (optional, requires win): (B, N) int32 original ids of the
    (sorted) points; the returned idx are then these ids instead of
    positions — the ids ride the sweep carries like the coordinates do, so
    the caller avoids a 1-element-granular (B, M·k) re-map gather (~9 ms at
    the RPN SA_0 eval shape, slower than the whole kernel).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, M, _ = centers.shape
    N = pts.shape[1]
    NPAD = _round_up(N, 128)
    W, NB, tile_m = _nk_tiling(M, NPAD, k, with_coords,
                               windowed=win is not None)
    c_t = jnp.transpose(centers, (0, 2, 1))  # (B, 3, M)
    pts_t = jnp.transpose(pts, (0, 2, 1))  # (B, 3, N)
    if NPAD != N:  # pad far away so padded columns never win
        pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, NPAD - N)),
                        constant_values=1e9)

    def kernel(*refs):
        if win is not None:
            # whole (B, n_tiles) window table lives in SMEM (TPU lowering
            # requires SMEM blocks to equal the array dims); pick this
            # grid cell's bounds by program id
            lo_ref, hi_ref, c_ref, p_ref = refs[:4]
            refs = refs[4:]
            b_id, i_id = pl.program_id(0), pl.program_id(1)
            lo_b, hi_b = lo_ref[b_id, i_id], hi_ref[b_id, i_id]
        else:
            c_ref, p_ref = refs[:2]
            refs = refs[2:]
            lo_b, hi_b = 0, NB
        if oids is not None:
            o_ref, outs = refs[0], refs[1:]
        else:
            o_ref, outs = None, refs
        d_out, i_out = outs[0], outs[1]
        # exact VPU distances: the u²+k²−2u·k MXU form loses ~|u||k|·eps_bf16
        # to cancellation (KITTI coords reach 70 m, d² thresholds are 0.01 m²)
        ux = c_ref[0, 0][:, None]  # (tile_m, 1)
        uy = c_ref[0, 1][:, None]
        uz = c_ref[0, 2][:, None]

        def blocks(b):
            px = p_ref[0, 0, pl.ds(b * W, W)][None, :]  # (1, W)
            py = p_ref[0, 1, pl.ds(b * W, W)][None, :]
            pz = p_ref[0, 2, pl.ds(b * W, W)][None, :]
            return px, py, pz

        def sweep(b, carry):
            cand_d, cand_blk = carry[0], carry[1]
            px, py, pz = blocks(b)
            m = (ux - px) ** 2 + (uy - py) ** 2 + (uz - pz) ** 2
            upd = m < cand_d  # strict: ties keep the earlier (lower) block
            # the id carry holds the block number — or, with oids, the
            # original point id directly (so no post-hoc re-map gather)
            tag = (o_ref[0, 0, pl.ds(b * W, W)][None, :]
                   if oids is not None else b)
            out = (jnp.where(upd, m, cand_d), jnp.where(upd, tag, cand_blk))
            if with_coords:
                cx, cy, cz = carry[2], carry[3], carry[4]
                out += (jnp.where(upd, px, cx), jnp.where(upd, py, cy),
                        jnp.where(upd, pz, cz))
            return out

        zf = jnp.zeros((tile_m, W), jnp.float32)
        init = (jnp.full((tile_m, W), jnp.inf, jnp.float32),
                jnp.zeros((tile_m, W), jnp.int32))
        if with_coords:
            init += (zf, zf, zf)
        carry = jax.lax.fori_loop(lo_b, hi_b, sweep, init)
        cand_d, cand_blk = carry[0], carry[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_m, W), 1)
        cand_i = cand_blk if oids is not None else cand_blk * W + lane
        out_rows = jax.lax.broadcasted_iota(jnp.int32, (k, tile_m), 0)

        def pick(s, cand_d):
            cmin = jnp.min(cand_d, axis=1, keepdims=True)  # (tile_m, 1)
            sel_lane = jnp.min(jnp.where(cand_d == cmin, lane, W), axis=1)
            sel = lane == sel_lane[:, None]
            idx_s = jnp.sum(jnp.where(sel, cand_i, 0), axis=1)
            row = out_rows == s
            d_out[0] = jnp.where(row, cmin[:, 0][None, :], d_out[0])
            i_out[0] = jnp.where(row, idx_s[None, :], i_out[0])
            if with_coords:
                for o, c in zip(outs[2:], carry[2:]):
                    v = jnp.sum(jnp.where(sel, c, 0.0), axis=1)
                    o[0] = jnp.where(row, v[None, :], o[0])
            return jnp.where(sel, jnp.inf, cand_d)

        for o in outs:
            o[0] = jnp.zeros((k, tile_m), o.dtype)
        jax.lax.fori_loop(0, k, pick, cand_d)

    n_out = 5 if with_coords else 2
    spec = pl.BlockSpec((1, k, tile_m), lambda b, i: (b, 0, i),
                        memory_space=pltpu.VMEM)
    dtypes = [jnp.float32, jnp.int32] + [jnp.float32] * (n_out - 2)
    in_specs = [
        pl.BlockSpec((1, 3, tile_m), lambda b, i: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, NPAD), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [c_t, pts_t]
    if oids is not None:
        if NPAD != N:  # padded slots keep id N (never a radius hit)
            oids = jnp.pad(oids, ((0, 0), (0, NPAD - N)), constant_values=N)
        # (B, 1, NPAD) so the block's trailing dims equal the array's
        in_specs.append(pl.BlockSpec((1, 1, NPAD), lambda b, i: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(oids[:, None, :])
    if win is not None:
        n_tiles = M // tile_m
        smem_spec = pl.BlockSpec((B, n_tiles), lambda b, i: (0, 0),
                                 memory_space=pltpu.SMEM)
        in_specs = [smem_spec, smem_spec] + in_specs
        operands = [win[0], win[1]] + operands
    res = pl.pallas_call(
        kernel,
        grid=(B, M // tile_m),
        in_specs=in_specs,
        out_specs=tuple(spec for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((B, k, M), dt) for dt in dtypes),
        interpret=interpret,
    )(*operands)
    out = tuple(jnp.transpose(r, (0, 2, 1)) for r in res)
    if with_coords:
        return out[0], out[1], jnp.stack(out[2:], axis=-1)  # (B, M, k, 3)
    return out[0], out[1]


@partial(jax.jit, static_argnames=("k", "max_radius", "interpret",
                                   "with_coords"))
def nearest_k_windowed(centers: jnp.ndarray, pts: jnp.ndarray, k: int,
                       max_radius: float, interpret: bool = False,
                       with_coords: bool = False):
    """Radius-bounded nearest-k: same contract as ``nearest_k`` for every
    neighbor within ``max_radius`` of its center; slots beyond the in-radius
    neighbors may report inf distance instead of the true (out-of-radius)
    next-nearest point. ONLY valid for callers that radius-filter the
    result (``ball_query_from_nearest``).

    The algorithmic win over the plain kernel: points and centers are sorted
    by depth (axis 2 — the rect-frame forward axis, the scene's longest,
    0..70.4 m under PC_AREA_SCOPE), so each center tile's candidate sweep
    covers only the point blocks whose depth can fall within max_radius of
    the tile — a per-tile [lo, hi) block window computed by searchsorted and
    passed to the kernel through SMEM. At the RPN SA_0 shape (4096 centers ×
    16384 points, r=0.5) a tile's window is a few % of the points instead of
    all of them; the O(M·N) VPU distance sweep that was at roofline becomes
    O(M·window). Replaces the brute sweep of ball_query_gpu.cu:9-44 with a
    sort-based spatial index (the CUDA kernel has no analog — it brute-forces
    N per query center).
    """
    B, M, _ = centers.shape
    N = pts.shape[1]
    NPAD = _round_up(N, 128)
    W, NB, tile_m = _nk_tiling(M, NPAD, k, with_coords, windowed=True)
    n_tiles = M // tile_m

    # variadic co-sorts instead of argsort + row gathers (1-element-granular
    # take_along_axis is latency-bound on TPU; one multi-payload sort is not)
    z = pts[..., 2]
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    z_s, x_s, y_s, order = jax.lax.sort(
        (z, pts[..., 0], pts[..., 1], iota), dimension=1, num_keys=1)
    pts_s = jnp.stack([x_s, y_s, z_s], axis=-1)
    cz = centers[..., 2]
    ciota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (B, M))
    cz_s, cx_s, cy_s, corder = jax.lax.sort(
        (cz, centers[..., 0], centers[..., 1], ciota), dimension=1,
        num_keys=1)
    centers_s = jnp.stack([cx_s, cy_s, cz_s], axis=-1)
    cz_t = cz_s.reshape(B, n_tiles, tile_m)
    lo_z = cz_t[:, :, 0] - max_radius  # rows sorted: first/last = min/max
    hi_z = cz_t[:, :, -1] + max_radius
    lo_i = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="left"))(
        z_s, lo_z)
    hi_i = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
        z_s, hi_z)
    win_lo = (lo_i // W).astype(jnp.int32)
    win_hi = jnp.minimum(-(-hi_i // W), NB).astype(jnp.int32)

    # the kernel returns original point ids directly (oids ride the sweep)
    res = _nearest_k_pallas(centers_s, pts_s, k, interpret=interpret,
                            with_coords=with_coords,
                            win=(win_lo, win_hi), oids=order)
    # kernel rows are in sorted-center order; map back. Padded-slot sentinel
    # ids (>= N) are clamped for gather safety, but their distance is forced
    # to inf so consumers that mask on d2 (isfinite, radius) reject them —
    # the clamp alone would defeat `idx < n_pts` guards while the pad
    # coordinate's ~3e18 d2 is finite.
    d2 = jnp.where(res[1] >= N, jnp.inf, res[0])
    idx = jnp.minimum(res[1], N - 1)
    _, inv = jax.lax.sort((corder, ciota), dimension=1, num_keys=1)
    d2 = jnp.take_along_axis(d2, inv[..., None], axis=1)
    idx = jnp.take_along_axis(idx, inv[..., None], axis=1)
    if with_coords:
        coords = jnp.take_along_axis(res[2], inv[..., None, None], axis=1)
        return d2, idx, coords
    return d2, idx


def nearest_k(centers: jnp.ndarray, pts: jnp.ndarray, k: int,
              with_coords: bool = False, max_radius: float | None = None):
    """(B, M, 3) × (B, N, 3) -> ((B, M, k) squared dists, (B, M, k) idx
    [, (B, M, k, 3) coords]), nearest first. Dispatches to the fused Pallas
    kernel on TPU for large problems; otherwise one approx_min_k (exact on
    CPU). with_coords returns the picked points' coordinates straight from
    the kernel's VMEM registers — no 3-channel coordinate gather (which
    costs ~6 ms at the RPN SA_0 shape).

    ``max_radius``: callers that only consume neighbors within a radius
    (ball query) may pass it to enable the depth-windowed kernel — slots
    beyond the in-radius neighbors are then allowed to be inf/garbage (see
    nearest_k_windowed)."""
    B, M, _ = centers.shape
    N = pts.shape[1]
    if (jax.default_backend() == "tpu" and M * N >= (1 << 20)
            and N % 128 == 0 and k <= 64
            and not env_flag("TPU3D_DISABLE_PALLAS")):
        if max_radius is not None and not env_flag("TPU3D_DISABLE_WINDOWED"):
            return nearest_k_windowed(centers, pts, k, float(max_radius),
                                      with_coords=with_coords)
        return _nearest_k_pallas(centers, pts, k, with_coords=with_coords)

    # fallback: chunk the query dim so the distance tile stays bounded
    # (a whole (B, M, N) matrix is 256MB/scene at the RPN SA_0 shape)
    chunk = M
    if M * N > (1 << 22):
        chunk = next((c for c in (512, 256, 128, 64) if M % c == 0), M)

    def one_chunk(cc, p):
        d2 = jnp.sum((cc[:, None, :] - p[None, :, :]) ** 2, axis=-1)
        if N < k:
            d2 = jnp.concatenate(
                [d2, jnp.full((d2.shape[0], k - N), jnp.inf, d2.dtype)],
                axis=1)
        return jax.lax.approx_min_k(d2, k)

    def per_batch(c, p):
        if chunk == M:
            return one_chunk(c, p)
        parts = c.reshape(M // chunk, chunk, 3)
        d, i = jax.lax.map(lambda cc: one_chunk(cc, p), parts)
        return d.reshape(M, k), i.reshape(M, k)

    min_d2, idx = jax.vmap(per_batch)(centers, pts)
    idx = idx.astype(jnp.int32)
    if with_coords:
        safe = jnp.clip(idx, 0, N - 1)
        coords = jnp.take_along_axis(
            pts, safe.reshape(B, M * k)[..., None], axis=1
        ).reshape(B, M, k, 3)
        return min_d2, idx, coords
    return min_d2, idx


def ball_query_from_nearest(d2: jnp.ndarray, idx: jnp.ndarray, radius: float,
                            nsample: int, n_pts: int) -> jnp.ndarray:
    """Derive a ball-query result from nearest-k candidates: keep the first
    ``nsample`` candidates inside the radius, pad short rows with the first
    hit, all-miss rows are 0 (CUDA fill parity). Because candidates are
    nearest-first, the hit mask is a prefix, matching _ball_query_one."""
    d2, idx = d2[..., :nsample], idx[..., :nsample]
    hit = (d2 < radius * radius) & (idx < n_pts)
    first = jnp.where(hit[..., 0:1], idx[..., 0:1], 0)
    return jnp.where(hit, idx, first).astype(jnp.int32)


def _ball_query_one(centers: jnp.ndarray, pts: jnp.ndarray, radius: float,
                    nsample: int, method: str = "nearest") -> jnp.ndarray:
    """(M, 3) centers × (N, 3) pts -> (M, nsample) int32.

    method "nearest" (default): the nsample *nearest* points, kept only when
    inside the radius — one TPU-native ``lax.approx_min_k`` per row (~14x faster
    than a top_k/sort formulation at RPN layer-1 shapes). Which k in-radius
    points a ball query returns is arbitrary (the reference CUDA kernel takes
    the first k in memory order purely for convenience, ball_query_gpu.cu:9-44,
    and downstream max-pooling is order-invariant), so nearest-k is a drop-in —
    and statistically nicer — neighbor rule.

    method "first": exact CUDA-parity first-k-in-index-order (the numpy
    oracle's semantics). Computed as ONE single-operand unstable sort of s32
    index keys (in-radius -> own index, else sentinel n) — no distance/iota
    co-sort, so roughly half the sort traffic of the approx_min_k pair sort
    (the key array IS the payload). The ascending prefix of the sorted keys
    is exactly the first-k in-radius indices.

    Both pad short rows with the first slot's hit and return all-zeros when
    nothing is in radius (CUDA parity).
    """
    n = pts.shape[0]
    d2 = jnp.sum((centers[:, None, :] - pts[None, :, :]) ** 2, axis=-1)  # (M, N)
    if method == "nearest":
        if n < nsample:
            d2 = jnp.concatenate(
                [d2, jnp.full((d2.shape[0], nsample - n), jnp.inf, d2.dtype)],
                axis=1)
        neg_d2, idx = jax.lax.approx_min_k(d2, nsample)
        hit = (neg_d2 < radius * radius) & (idx < n)
    else:
        mask = d2 < radius * radius
        iota = jnp.arange(n, dtype=jnp.int32)
        keys = jnp.where(mask, iota[None, :], n)
        if n < nsample:  # fewer points than slots: pad with sentinels
            keys = jnp.concatenate(
                [keys, jnp.full((keys.shape[0], nsample - n), n, jnp.int32)],
                axis=1)
        keys = jax.lax.sort(keys, dimension=1, is_stable=False)
        idx = jax.lax.slice_in_dim(keys, 0, nsample, axis=1)
        hit = idx < n
    # pad with the first hit; all-miss rows become 0 (CUDA parity)
    first = jnp.where(hit[:, 0:1], idx[:, 0:1], 0)
    return jnp.where(hit, idx, first).astype(jnp.int32)


@partial(jax.jit, static_argnames=("radius", "nsample", "query_chunk", "method"))
def ball_query(centers: jnp.ndarray, pts: jnp.ndarray, radius: float,
               nsample: int, query_chunk: int | None = None,
               method: str = "auto") -> jnp.ndarray:
    """(B, M, 3) centers × (B, N, 3) pts -> (B, M, nsample) int32 indices.

    ``query_chunk`` bounds the (chunk, N) distance tile; M must divide by it.
    See _ball_query_one for the ``method`` semantics. ``"auto"`` (the
    default) picks the fastest in-radius rule for the backend; an explicit
    ``"nearest"`` / ``"first"`` is always honored (A/B studies depend on it).
    """
    if method not in ("auto", "nearest", "first"):
        raise ValueError(
            f"ball_query method must be 'auto', 'nearest' or 'first', got "
            f"{method!r}")  # an explicitly named rule is always honored
    B, M, _ = centers.shape
    N = pts.shape[1]
    if (method in ("auto", "nearest") and jax.default_backend() == "tpu"
            and M * N >= (1 << 20) and N % 128 == 0 and nsample <= 64
            and not env_flag("TPU3D_DISABLE_PALLAS")):
        if not env_flag("TPU3D_DISABLE_WINDOWED"):
            d2, idx = nearest_k_windowed(centers, pts, nsample, float(radius))
        else:
            d2, idx = _nearest_k_pallas(centers, pts, nsample)
        return ball_query_from_nearest(d2, idx, radius, nsample, N)
    if method == "auto":
        if (jax.default_backend() == "tpu"
                and not env_flag("TPU3D_BALLQ_NEAREST")):
            # small-shape TPU path: which k in-radius points a ball query
            # returns is arbitrary (downstream max-pool is order-invariant),
            # so take the exact CUDA-parity first-k — its single-key s32
            # sort is ~2x cheaper than approx_min_k's (d2, iota) pair sort
            # at the RCNN SA shapes ((800, 128, 512): 5.0 ms sort + 1.9 ms
            # layout copies in the eval trace; see docs/ROUND3_NOTES.md).
            # TPU3D_BALLQ_NEAREST=1 makes auto keep the nearest-k rule
            # (A/B knob for neighbor-rule quality studies).
            method = "first"
        else:
            method = "nearest"

    def per_batch(c, p):
        if query_chunk is None or query_chunk >= M:
            return _ball_query_one(c, p, radius, nsample, method)
        c_chunks = c.reshape(M // query_chunk, query_chunk, 3)
        return jax.lax.map(
            lambda cc: _ball_query_one(cc, p, radius, nsample, method), c_chunks
        ).reshape(M, nsample)

    return jax.vmap(per_batch)(centers, pts)


@partial(jax.jit, static_argnames=("precise", "exact", "bf16_bwd"))
def group_points(features: jnp.ndarray, idx: jnp.ndarray,
                 precise: bool = False, exact: bool = False,
                 bf16_bwd: bool | None = None) -> jnp.ndarray:
    """(B, N, C) features gathered by (B, M, nsample) -> (B, M, nsample, C).

    Replaces group_points_gpu.cu (+ its hand-written grad — both paths are
    differentiable). On TPU with a small source table the gather is routed
    through the MXU as a chunked one-hot bf16 matmul (~3x faster than the
    native gather at the RCNN's (800, 8192-of-512, 128) shape); wide tables
    (the RPN's 16384 points) keep the plain gather. precise=True forbids the
    bf16 value rounding (f32 'highest' one-hot or plain gather) — needed when
    the gathered values feed a cancelling subtraction (pre-grouped scene-frame
    pre-activations). exact=True additionally forbids bf16 anywhere in the op
    INCLUDING the backward (f32 'highest' one-hot or the plain gather's exact
    scatter VJP) — the f32-parity mode the models wire to
    cfg.TRAIN.BF16_ACTIVATIONS=False / TPU3D_F32_EVAL.

    bf16_bwd makes the backward-precision choice for precise wide-table
    callers explicit at the call site: True consents to the bf16-rounded
    one-hot MXU backward (standard bf16-training cotangent precision), False
    keeps XLA's exact scatter VJP, None (default) defers to the route's
    default (MXU backward unless TPU3D_PRECISE_EXACT_BWD=1).
    """
    B, M, S = idx.shape
    N, C = features.shape[1], features.shape[-1]
    route = _gp_route(jax.default_backend(), N, C, M * S, precise, exact,
                      bf16_bwd)
    if route == "onehot_exact":
        return _group_points_onehot_exact(features, idx)
    if route == "onehot_bf16":
        return _group_points_onehot(features, idx)
    if route == "gather_mxu_bwd":
        return _group_points_gather_mxu_vjp(features, idx)
    flat = idx.reshape(B, M * S)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(B, M, S, features.shape[-1])


def _gp_route(backend: str, N: int, C: int, MS: int,
              precise: bool, exact: bool,
              bf16_bwd: bool | None = None) -> str:
    """Pure routing decision for group_points (unit-tested directly since the
    fast paths are TPU-only).

    - 'onehot_exact': small table, f32 'highest' one-hot — exact forward AND
      backward (precise/exact callers, and narrow tables where it also wins).
    - 'onehot_bf16': small wide-channel table, bf16 one-hot MXU (fastest).
    - 'gather_mxu_bwd': wide table (N > 2048), plain exact gather forward +
      chunked one-hot bf16 MXU backward — replaces 11 ms/step of XLA
      serialized scatter at the RPN SA_1 training shapes
      (docs/TRAIN_PROFILE.md fusion.47/48). precise callers take this path
      too: their constraint is FORWARD cancellation (W@xyz[idx]−W@c before
      rounding); the cotangent is bf16-rounded like everywhere else in bf16
      training. NOT taken when exact=True (the f32-parity gate:
      cfg.TRAIN.BF16_ACTIVATIONS=False / TPU3D_F32_EVAL), when the caller
      passes bf16_bwd=False, or — for precise callers that left bf16_bwd
      unset — under TPU3D_PRECISE_EXACT_BWD=1.
    - 'gather': plain gather with XLA's exact autodiff.
    """
    if backend == "tpu" and N <= 2048:
        if precise or exact or C < 16:
            return "onehot_exact"
        if C >= 16 and MS % 8 == 0:
            return "onehot_bf16"
    if bf16_bwd is None:
        bf16_bwd = not (precise and env_flag("TPU3D_PRECISE_EXACT_BWD"))
    if backend == "tpu" and C >= 16 and N > 2048 and not exact and bf16_bwd:
        return "gather_mxu_bwd"
    return "gather"


def _gp_gather_impl(features, idx):
    B, M, S = idx.shape
    flat = idx.reshape(B, M * S)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(B, M, S, features.shape[-1])


@jax.custom_vjp
def _group_points_gather_mxu_vjp(features, idx):
    return _gp_gather_impl(features, idx)


def _gp_vjp_fwd(features, idx):
    # features rides the residuals only for its shape/dtype (already live as
    # an input; the bwd never reads its values, so it costs nothing)
    return _gp_gather_impl(features, idx), (features, idx)


def _gp_vjp_bwd(res, g):
    """grad_features[b, n, :] = sum over gathered rows k with idx[k]==n of
    g[b, k, :] — run as chunked one-hot bf16 matmuls with an f32 accumulator
    on the MXU instead of XLA's serialized scatter-add (the same trade as
    interpolate's `_ti_gather_vjp_bwd`; bf16 cotangent rounding is the
    standard TPU training precision and is convergence-validated).

    Indices are clipped to [0, N) so the backward matches the forward
    gather's clamp semantics (take_along_axis clamps out-of-range indices;
    an unclipped one-hot would silently drop those cotangents). ball_query
    always produces in-range indices, so the clip is free insurance.
    """
    features, idx = res
    B, N, C = features.shape
    fdtype = features.dtype
    _, M, S = idx.shape
    total = M * S
    flat = jnp.clip(idx.reshape(B, total), 0, N - 1)
    gb = g.reshape(B, total, C).astype(jnp.bfloat16)
    # (B, chunk, N) bf16 one-hot slab under the shared budget
    chunk = max(1, min(total, _ONEHOT_SLAB_BYTES // max(B * N * 2, 1)))
    if chunk < total and total % chunk != 0:
        # pad to a chunk multiple instead of shrinking chunk toward 1 (a
        # near-prime total would otherwise degrade to M*S scan steps):
        # padded rows carry index N whose one-hot row is all-zero, so they
        # contribute nothing to the accumulator
        n_chunks = -(-total // chunk)
        pad = n_chunks * chunk - total
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=N)
        gb = jnp.pad(gb, ((0, 0), (0, pad), (0, 0)))
        total = n_chunks * chunk
    if chunk == total:
        oh = jax.nn.one_hot(flat, N, dtype=jnp.bfloat16)
        gf = jnp.einsum("bkn,bkc->bnc", oh, gb,
                        preferred_element_type=jnp.float32)
    else:
        n_chunks = total // chunk
        parts_i = flat.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
        parts_g = gb.reshape(B, n_chunks, chunk, C).transpose(1, 0, 2, 3)

        def body(acc, args):
            ic, gc = args
            oh = jax.nn.one_hot(ic, N, dtype=jnp.bfloat16)
            return acc + jnp.einsum("bkn,bkc->bnc", oh, gc,
                                    preferred_element_type=jnp.float32), None

        gf, _ = jax.lax.scan(body, jnp.zeros((B, N, C), jnp.float32),
                             (parts_i, parts_g))
    return gf.astype(fdtype), None


_group_points_gather_mxu_vjp.defvjp(_gp_vjp_fwd, _gp_vjp_bwd)


def _group_points_onehot_exact(features: jnp.ndarray,
                               idx: jnp.ndarray) -> jnp.ndarray:
    """Exact gather-as-matmul for narrow tables (C < 16, e.g. xyz): one-hot f32
    rows x features with precision='highest' — bitwise-equal to the gather and
    5.6x faster at the RCNN SA_0 shape ((800, 512, 3) by (800, 128, 64):
    60.7 -> 10.8 ms on v5e; XLA's native gather crawls at ~1.4 GB/s there).
    Default matmul precision would round the values to bf16, hence 'highest'.
    XLA fuses the one-hot generation into the dot, so no chunking is needed."""
    B, M, S = idx.shape
    N = features.shape[1]
    oh = jax.nn.one_hot(idx.reshape(B, M * S), N, dtype=jnp.float32)
    out = jnp.einsum("bkn,bnc->bkc", oh, features.astype(jnp.float32),
                     precision="highest")
    return out.reshape(B, M, S, -1).astype(features.dtype)


def _group_points_onehot(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather-as-matmul: one-hot rows (bf16) x features (bf16) on the MXU,
    chunked along the gathered axis to bound the one-hot buffer. Features are
    rounded to bf16 — acceptable for network activations (the standard TPU
    training/inference precision); coordinate gathers stay on the exact path
    because C < 16 there."""
    B, M, S = idx.shape
    N, C = features.shape[1], features.shape[-1]
    flat = idx.reshape(B, M * S)
    fb = features.astype(jnp.bfloat16)
    total = M * S
    n_rows = total
    # ~32MB one-hot chunks
    chunk = max(1, min(total, (16 * 1024 * 1024) // max(N * 2, 1)))
    if chunk < total and total % chunk != 0:
        # pad to a chunk multiple (see _gp_vjp_bwd): padded rows gather index
        # N -> all-zero one-hot -> zero rows, sliced off below
        n_chunks = -(-total // chunk)
        flat = jnp.pad(flat, ((0, 0), (0, n_chunks * chunk - total)),
                       constant_values=N)
        total = n_chunks * chunk

    def do_chunk(ic):
        oh = jax.nn.one_hot(ic, N, dtype=jnp.bfloat16)  # (B, chunk, N)
        return jnp.einsum("bcs,bsf->bcf", oh, fb,
                          preferred_element_type=jnp.float32)

    if chunk == total:
        out = do_chunk(flat)
    else:
        parts = flat.reshape(B, total // chunk, chunk).transpose(1, 0, 2)
        out = jax.lax.map(do_chunk, parts).transpose(1, 0, 2, 3).reshape(
            B, total, C)
    return out[:, :n_rows].reshape(B, M, S, C).astype(features.dtype)


def ball_query_numpy(centers: np.ndarray, pts: np.ndarray, radius: float,
                     nsample: int) -> np.ndarray:
    """Host oracle, (B, M, 3) × (B, N, 3) -> (B, M, nsample), CUDA-parity fill."""
    centers, pts = np.asarray(centers), np.asarray(pts)
    B, M, _ = centers.shape
    out = np.zeros((B, M, nsample), dtype=np.int32)
    for b in range(B):
        for m in range(M):
            d2 = np.sum((pts[b] - centers[b, m]) ** 2, axis=-1)
            hits = np.where(d2 < radius * radius)[0]
            if len(hits) == 0:
                continue
            take = hits[:nsample]
            out[b, m, : len(take)] = take
            out[b, m, len(take):] = take[0]
    return out
