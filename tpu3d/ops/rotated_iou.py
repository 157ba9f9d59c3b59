"""Rotated-box intersection / IoU — the framework's single rotated-IoU primitive.

One implementation serves both roles the reference splits across two CUDA kernels
(pointrcnn/lib/utils/iou3d/src/iou3d_kernel.cu and evaluate/rotate_iou.py): pairwise
BEV overlap/IoU matrices for the detector's NMS/target-assignment, and the
evaluator's criterion-parameterized rotated IoU.

Algorithm: sort-free, scatter-free Liang-Barsky line-integral form (see
``_pair_intersection_area``): the intersection area is the shoelace integral over
each quad's edges clipped to the other quad — a fixed number of elementwise
min/max/multiply ops per pair, which XLA fuses into one VPU program over the whole
(N, M) matrix (~0.1 ns/pair on v5e vs ~400 ns/pair for a scatter-based
Sutherland-Hodgman clip). A small independent numpy Sutherland-Hodgman oracle
lives in ``rotated_iou_numpy`` for tests and host-side callers.

Criterion (evaluator parity, evaluate/rotate_iou.py:devRotateIoUEval):
  -1 -> IoU (inter / union)
   0 -> inter / area(A)
   1 -> inter / area(B)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

def _box_to_bev_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) [xc, zc, l, w, ry] -> (..., 4, 2) corners, consistent clockwise
    order (the bottom-face order of tpu3d.kitti.boxes.corners_from_boxes3d)."""
    xc, zc, l, w, ry = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3],
                        boxes[..., 4])
    sx = jnp.array([1, 1, -1, -1], dtype=boxes.dtype) * (l[..., None] / 2)
    sz = jnp.array([1, -1, -1, 1], dtype=boxes.dtype) * (w[..., None] / 2)
    c, s = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    x = c * sx + s * sz + xc[..., None]
    z = -s * sx + c * sz + zc[..., None]
    return jnp.stack([x, z], axis=-1)


def boxes3d_to_bev5(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) [x,y,z,h,w,l,ry] -> (..., 5) [xc, zc, l, w, ry] BEV boxes."""
    return jnp.stack(
        [boxes3d[..., 0], boxes3d[..., 2], boxes3d[..., 5], boxes3d[..., 4],
         boxes3d[..., 6]], axis=-1)


def _cross2(o, a, b):
    """cross(a - o, b - o), last-dim (.., 2) points."""
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _clipped_edge_integral(cx, cy, eps: float = 0.0):
    """Shoelace line integral of cx's edges clipped to the inside of quad cy.

    cx, cy: (.., 4, 2) consistently-oriented (clockwise) convex quads.
    For each directed edge p->q of cx, the sub-segment inside cy is found by
    Liang-Barsky clipping against cy's four half-planes (inside = cross <= -eps),
    and its shoelace contribution is cross(P(t0), P(t1)). Returns (..,) the sum
    over the four edges (signed; clockwise -> negative).
    """
    p = cx                                   # (.., 4, 2)
    q = jnp.roll(cx, -1, axis=-2)
    e1 = cy[..., None, :, :]                 # (.., 1, 4, 2) constraint edges
    e2 = jnp.roll(cy, -1, axis=-2)[..., None, :, :]
    pv = p[..., :, None, :]                  # (.., 4, 1, 2)
    qv = q[..., :, None, :]
    # half-plane value f(v) = cross(e2-e1, v-e1); inside (clockwise) = f <= -eps
    f_p = _cross2(e1, e2, pv) + eps          # (.., 4edge, 4constraint)
    f_q = _cross2(e1, e2, qv) + eps
    slope = f_q - f_p
    big = jnp.asarray(1e30, cx.dtype)
    safe = jnp.where(jnp.abs(slope) < 1e-12, 1e-12, slope)
    tstar = -f_p / safe
    degenerate = jnp.abs(slope) < 1e-12
    inside0 = f_p <= 0
    t_lo = jnp.where(degenerate, jnp.where(inside0, 0.0, big),
                     jnp.where(slope < 0, tstar, 0.0))
    t_hi = jnp.where(degenerate, jnp.where(inside0, 1.0, -big),
                     jnp.where(slope > 0, tstar, 1.0))
    t0 = jnp.clip(jnp.max(t_lo, axis=-1), 0.0, 1.0)     # (.., 4)
    t1 = jnp.clip(jnp.min(t_hi, axis=-1), 0.0, 1.0)
    valid = t1 > t0
    d = q - p
    p0 = p + t0[..., None] * d
    p1 = p + t1[..., None] * d
    contrib = p0[..., 0] * p1[..., 1] - p0[..., 1] * p1[..., 0]
    return jnp.sum(jnp.where(valid, contrib, 0.0), axis=-1)


def _pair_intersection_area(corners_a, corners_b):
    """Intersection area of two convex quads, (.., 4, 2) each -> (..,) scalar.

    Sort-free, scatter-free formulation (the TPU-fast path; replaces both the
    reference's CUDA Sutherland-Hodgman clip, iou3d_kernel.cu:14-220, and its
    numba-CUDA vertex-sort kernel, evaluate/rotate_iou.py:231-250): the boundary
    of A∩B consists of the parts of A's edges inside B plus the parts of B's
    edges inside A, so the shoelace area decomposes into per-edge line integrals
    of Liang-Barsky-clipped sub-segments — pure elementwise min/max arithmetic.

    Robustness: each pair is first shifted to its own local frame (f32
    catastrophic cancellation at ~80 m scene coordinates would otherwise put
    rounding/FMA noise near the clip margins), and the two passes use a
    symmetric ±margin — A's edges clip against a slightly *enlarged* B, B's
    edges against a slightly *shrunk* A — so exactly- or nearly-coincident
    boundaries (e.g. a prediction identical to its gt) are deterministically
    counted once rather than randomly zero or twice.
    """
    mid = 0.5 * (jnp.mean(corners_a, axis=-2, keepdims=True)
                 + jnp.mean(corners_b, axis=-2, keepdims=True))
    ca = corners_a - mid
    cb = corners_b - mid
    margin = 1e-4  # >> centered-frame f32 noise, << any real box dimension
    ia = _clipped_edge_integral(ca, cb, eps=-margin)
    ib = _clipped_edge_integral(cb, ca, eps=margin)
    return 0.5 * jnp.abs(ia + ib)


def _rect_area(boxes5):
    return boxes5[..., 2] * boxes5[..., 3]


@partial(jax.jit, static_argnames=("criterion",))
def rotated_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
                        criterion: int = -2) -> jnp.ndarray:
    """Pairwise rotated BEV overlap matrix.

    :param boxes_a: (N, 5) [xc, zc, l, w, ry]
    :param boxes_b: (M, 5)
    :param criterion: -2 -> raw intersection area (iou3d_cuda boxes_overlap_bev
        parity); -1 -> IoU; 0 -> inter/area_a; 1 -> inter/area_b
        (evaluate/rotate_iou.py devRotateIoUEval parity).
    :return: (N, M) float32
    """
    ca = _box_to_bev_corners(boxes_a)  # (N, 4, 2)
    cb = _box_to_bev_corners(boxes_b)  # (M, 4, 2)
    n, m = ca.shape[0], cb.shape[0]
    inter = _pair_intersection_area(
        jnp.broadcast_to(ca[:, None], (n, m, 4, 2)),
        jnp.broadcast_to(cb[None, :], (n, m, 4, 2)))  # (N, M)
    if criterion == -2:
        return inter
    area_a = _rect_area(boxes_a)[:, None]
    area_b = _rect_area(boxes_b)[None, :]
    if criterion == -1:
        return inter / jnp.maximum(area_a + area_b - inter, 1e-8)
    if criterion == 0:
        return inter / jnp.maximum(area_a, 1e-8)
    if criterion == 1:
        return inter / jnp.maximum(area_b, 1e-8)
    raise ValueError(f"bad criterion {criterion}")


@jax.jit
def boxes_iou_bev(boxes_a3d: jnp.ndarray, boxes_b3d: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) × (M, 7) -> (N, M) rotated BEV IoU (iou3d_cuda boxes_iou_bev role)."""
    return rotated_overlap_bev(boxes3d_to_bev5(boxes_a3d), boxes3d_to_bev5(boxes_b3d),
                               criterion=-1)


@jax.jit
def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) × (M, 7) -> (N, M) full 3D IoU with y-extent overlap
    (iou3d_cuda boxes_iou3d_gpu parity: height overlap × BEV intersection)."""
    inter_bev = rotated_overlap_bev(
        boxes3d_to_bev5(boxes_a), boxes3d_to_bev5(boxes_b), criterion=-2)
    # y points down; box spans [y - h, y]
    ymax = jnp.minimum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    ymin = jnp.maximum(boxes_a[:, None, 1] - boxes_a[:, None, 3],
                       boxes_b[None, :, 1] - boxes_b[None, :, 3])
    h_overlap = jnp.clip(ymax - ymin, 0.0, None)
    inter3d = inter_bev * h_overlap
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter3d / jnp.maximum(vol_a + vol_b - inter3d, 1e-8)


# ---------------------------------------------------------------------------
# numpy reference (test oracle + host-side callers like gt-database collision
# checks); mirrors the jax algorithm but written independently enough to count.
# ---------------------------------------------------------------------------

def _np_box_corners(box5):
    xc, zc, l, w, ry = box5
    local = np.array([[l / 2, w / 2], [l / 2, -w / 2], [-l / 2, -w / 2],
                      [-l / 2, w / 2]])
    c, s = np.cos(ry), np.sin(ry)
    x = c * local[:, 0] + s * local[:, 1] + xc
    z = -s * local[:, 0] + c * local[:, 1] + zc
    return np.stack([x, z], axis=1)


def _np_clip(poly: list, p1, p2) -> list:
    out = []
    n = len(poly)
    e = p2 - p1
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        side_c = e[0] * (cur[1] - p1[1]) - e[1] * (cur[0] - p1[0])
        side_n = e[0] * (nxt[1] - p1[1]) - e[1] * (nxt[0] - p1[0])
        if side_c <= 0:
            out.append(cur)
        if (side_c <= 0) != (side_n <= 0):
            t = side_c / (side_c - side_n)
            out.append(cur + t * (nxt - cur))
    return out


def _np_polygon_area(poly: list) -> float:
    if len(poly) < 3:
        return 0.0
    a = 0.0
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        a += cur[0] * nxt[1] - nxt[0] * cur[1]
    return abs(a) / 2.0


def rotated_intersection_numpy(box_a5, box_b5) -> float:
    """Intersection area of two [xc, zc, l, w, ry] boxes (host oracle)."""
    ca = _np_box_corners(np.asarray(box_a5, dtype=np.float64))
    cb = _np_box_corners(np.asarray(box_b5, dtype=np.float64))
    poly = [ca[i] for i in range(4)]
    for k in range(4):
        if not poly:
            return 0.0
        poly = _np_clip(poly, cb[k], cb[(k + 1) % 4])
    return _np_polygon_area(poly)


def rotated_iou_bev_numpy(boxes_a5: np.ndarray, boxes_b5: np.ndarray,
                          criterion: int = -1,
                          backend: str = "auto") -> np.ndarray:
    """(N, 5) × (M, 5) -> (N, M) rotated BEV IoU/overlap on host.

    backend "auto" uses the native C kernel (tpu3d/runtime/rotated_iou.c) when
    it builds; "python" forces the Sutherland-Hodgman oracle below (a genuinely
    independent algorithm, used as the test oracle).
    """
    boxes_a5 = np.ascontiguousarray(boxes_a5, dtype=np.float64)
    boxes_b5 = np.ascontiguousarray(boxes_b5, dtype=np.float64)
    if backend == "auto":
        from ..runtime.native import get_rotated_iou

        ffi, lib = get_rotated_iou()
        if lib is not None:
            out = np.zeros((len(boxes_a5), len(boxes_b5)), dtype=np.float64)
            lib.rotated_overlap_bev(
                ffi.cast("double *", boxes_a5.ctypes.data), len(boxes_a5),
                ffi.cast("double *", boxes_b5.ctypes.data), len(boxes_b5),
                int(criterion), ffi.cast("double *", out.ctypes.data))
            return out
    out = np.zeros((len(boxes_a5), len(boxes_b5)))
    for i in range(len(boxes_a5)):
        for j in range(len(boxes_b5)):
            inter = rotated_intersection_numpy(boxes_a5[i], boxes_b5[j])
            if criterion == -2:
                out[i, j] = inter
                continue
            area_a = boxes_a5[i, 2] * boxes_a5[i, 3]
            area_b = boxes_b5[j, 2] * boxes_b5[j, 3]
            if criterion == -1:
                out[i, j] = inter / max(area_a + area_b - inter, 1e-8)
            elif criterion == 0:
                out[i, j] = inter / max(area_a, 1e-8)
            elif criterion == 1:
                out[i, j] = inter / max(area_b, 1e-8)
    return out


def boxes_iou3d_numpy(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Host 3D IoU oracle, (N, 7) × (M, 7)."""
    boxes_a = np.asarray(boxes_a, dtype=np.float64)
    boxes_b = np.asarray(boxes_b, dtype=np.float64)
    bev_a = boxes_a[:, [0, 2, 5, 4, 6]]
    bev_b = boxes_b[:, [0, 2, 5, 4, 6]]
    inter_bev = rotated_iou_bev_numpy(bev_a, bev_b, criterion=-2)
    ymax = np.minimum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    ymin = np.maximum(boxes_a[:, None, 1] - boxes_a[:, None, 3],
                      boxes_b[None, :, 1] - boxes_b[None, :, 3])
    h_overlap = np.clip(ymax - ymin, 0.0, None)
    inter3d = inter_bev * h_overlap
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter3d / np.maximum(vol_a + vol_b - inter3d, 1e-8)
