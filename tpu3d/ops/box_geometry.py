"""JAX twins of the numpy box geometry in tpu3d.kitti.boxes.

All functions are jittable, fixed-shape, and follow the same
``(x, y, z, h, w, l, ry)`` bottom-center rect-camera convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# box-frame corner template signs (bottom face 0-3, top face 4-7); see
# tpu3d.kitti.boxes.corners_from_boxes3d for the convention. numpy so importing
# the module never initializes a jax backend.
_SX = np.array([1, 1, -1, -1, 1, 1, -1, -1], dtype=np.float32)
_SZ = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.float32)
_SY = np.array([0, 0, 0, 0, -1, -1, -1, -1], dtype=np.float32)


def rotate_points_along_y(pc: jnp.ndarray, angle) -> jnp.ndarray:
    """x' = cos·x − sin·z ; z' = sin·x + cos·z on the last-dim (x, *, z, ...) layout.

    ``angle`` broadcasts against ``pc[..., 0]``. Maps world points into the
    canonical frame of a box with yaw ``angle`` (see kitti.boxes).
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, z = pc[..., 0], pc[..., 2]
    new_x = c * x - s * z
    new_z = s * x + c * z
    return pc.at[..., 0].set(new_x).at[..., 2].set(new_z)


def corners_from_boxes3d(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 8, 3) corners (same order as the numpy twin)."""
    h, w, l, ry = boxes3d[..., 3], boxes3d[..., 4], boxes3d[..., 5], boxes3d[..., 6]
    xc = l[..., None] / 2.0 * _SX
    zc = w[..., None] / 2.0 * _SZ
    yc = h[..., None] * _SY
    c, s = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    x = c * xc + s * zc + boxes3d[..., 0:1]
    y = yc + boxes3d[..., 1:2]
    z = -s * xc + c * zc + boxes3d[..., 2:3]
    return jnp.stack([x, y, z], axis=-1)


def bev_corners_from_boxes3d(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 4, 2) BEV (x, z) corners of the bottom face, in the
    fixed clockwise order produced by the corner template."""
    corners = corners_from_boxes3d(boxes3d)
    return corners[..., 0:4, 0::2]


def points_in_boxes3d(pts: jnp.ndarray, boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) pts × (M, 7) boxes -> (N, M) bool analytic rotated-box test
    (jax twin of kitti.boxes.points_in_boxes3d)."""
    cx, cy, cz = boxes3d[:, 0], boxes3d[:, 1], boxes3d[:, 2]
    h, w, l, ry = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5], boxes3d[:, 6]
    dx = pts[:, None, 0] - cx[None, :]
    dy = pts[:, None, 1] - cy[None, :]
    dz = pts[:, None, 2] - cz[None, :]
    c, s = jnp.cos(ry)[None, :], jnp.sin(ry)[None, :]
    local_x = c * dx - s * dz
    local_z = s * dx + c * dz
    in_x = jnp.abs(local_x) <= l[None, :] / 2.0
    in_z = jnp.abs(local_z) <= w[None, :] / 2.0
    in_y = (dy <= 0) & (dy >= -h[None, :])
    return in_x & in_y & in_z


def enlarge_box3d(boxes3d: jnp.ndarray, extra_width: float) -> jnp.ndarray:
    large = boxes3d.at[..., 3:6].add(extra_width * 2)
    return large.at[..., 1].add(extra_width)
