"""Property/oracle tests for tpu3d.ops (run on CPU; see conftest)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu3d import ops
from tpu3d.kitti import boxes as npboxes


# ---------------------------------------------------------------- rotated IoU

def _mc_intersection(box_a, box_b, n=200_000, seed=0):
    """Monte-Carlo intersection area of two BEV5 boxes (independent oracle)."""
    rng = np.random.default_rng(seed)
    all_c = np.concatenate(
        [npboxes.corners_from_boxes3d(_bev5_to_box7(b)) for b in (box_a, box_b)]
    )[:, :, [0, 2]].reshape(-1, 2)
    lo, hi = all_c.min(0) - 0.1, all_c.max(0) + 0.1
    pts2 = rng.uniform(lo, hi, size=(n, 2))
    pts3 = np.stack([pts2[:, 0], -np.ones(n) * 0.5, pts2[:, 1]], axis=1)
    in_a = npboxes.points_in_boxes3d(pts3, _bev5_to_box7(box_a))[:, 0]
    in_b = npboxes.points_in_boxes3d(pts3, _bev5_to_box7(box_b))[:, 0]
    area = np.prod(hi - lo)
    return area * np.mean(in_a & in_b)


def _bev5_to_box7(b5):
    xc, zc, l, w, ry = b5
    return np.array([[xc, 0.0, zc, 2.0, w, l, ry]], dtype=np.float64)


def test_rotated_iou_axis_aligned():
    a = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 0.0, 4.0, 2.0, 0.0], [10.0, 10.0, 4.0, 2.0, 0.0]])
    iou = np.asarray(ops.rotated_overlap_bev(a, b, criterion=-1))
    # overlap = 3x2=6, union = 8+8-6=10
    assert iou[0, 0] == pytest.approx(0.6, abs=1e-5)
    assert iou[0, 1] == 0.0


def test_rotated_iou_45_degrees():
    # unit square vs itself rotated 45°: known intersection = 2*(sqrt2-1)
    a = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 1.0, math.pi / 4]])
    inter = float(ops.rotated_overlap_bev(a, b, criterion=-2)[0, 0])
    assert inter == pytest.approx(2 * (math.sqrt(2) - 1), abs=1e-5)


def test_rotated_iou_contained():
    a = jnp.array([[0.0, 0.0, 4.0, 4.0, 0.3]])
    b = jnp.array([[0.0, 0.0, 1.0, 1.0, 1.2]])  # fully inside
    inter = float(ops.rotated_overlap_bev(a, b, criterion=-2)[0, 0])
    assert inter == pytest.approx(1.0, abs=1e-5)
    # criterion 1: inter / area_b = 1
    c1 = float(ops.rotated_overlap_bev(a, b, criterion=1)[0, 0])
    assert c1 == pytest.approx(1.0, abs=1e-5)


def test_rotated_iou_identical():
    a = jnp.array([[1.0, 2.0, 3.9, 1.6, 0.7]])
    iou = float(ops.rotated_overlap_bev(a, a, criterion=-1)[0, 0])
    assert iou == pytest.approx(1.0, abs=1e-5)


def test_rotated_iou_vs_numpy_and_montecarlo(rng):
    boxes_a = np.stack(
        [
            rng.uniform(-5, 5, 8),
            rng.uniform(-5, 5, 8),
            rng.uniform(1, 5, 8),
            rng.uniform(1, 3, 8),
            rng.uniform(-math.pi, math.pi, 8),
        ],
        axis=1,
    )
    boxes_b = np.stack(
        [
            rng.uniform(-5, 5, 6),
            rng.uniform(-5, 5, 6),
            rng.uniform(1, 5, 6),
            rng.uniform(1, 3, 6),
            rng.uniform(-math.pi, math.pi, 6),
        ],
        axis=1,
    )
    jax_iou = np.asarray(
        ops.rotated_overlap_bev(jnp.asarray(boxes_a, jnp.float32),
                                jnp.asarray(boxes_b, jnp.float32), criterion=-1)
    )
    np_iou = ops.rotated_iou_bev_numpy(boxes_a, boxes_b, criterion=-1)
    np.testing.assert_allclose(jax_iou, np_iou, atol=2e-4)
    # Monte-Carlo spot check on the largest-overlap pair
    i, j = np.unravel_index(np.argmax(np_iou), np_iou.shape)
    if np_iou[i, j] > 0.05:
        inter_mc = _mc_intersection(boxes_a[i], boxes_b[j])
        inter_np = ops.rotated_iou_bev_numpy(
            boxes_a[i:i + 1], boxes_b[j:j + 1], criterion=-2)[0, 0]
        assert inter_np == pytest.approx(inter_mc, rel=0.03)


def test_boxes_iou3d_height_overlap():
    # identical BEV, y-extents half overlapping
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 1.0, 0.0, 2.0, 2.0, 2.0, 0.0]])  # shifted down 1m
    iou = float(ops.boxes_iou3d(a, b)[0, 0])
    # inter = 4 (bev) * 1 (h) = 4; union = 8+8-4 = 12
    assert iou == pytest.approx(4.0 / 12.0, abs=1e-5)
    got = ops.boxes_iou3d_numpy(np.asarray(a), np.asarray(b))[0, 0]
    assert got == pytest.approx(4.0 / 12.0, abs=1e-9)


# ----------------------------------------------------------------------- NMS

def test_nms_rotated_vs_numpy(rng):
    n = 64
    boxes = np.stack(
        [
            rng.uniform(-20, 20, n),
            rng.uniform(0, 40, n),
            rng.uniform(2, 5, n),
            rng.uniform(1, 2.5, n),
            rng.uniform(-math.pi, math.pi, n),
        ],
        axis=1,
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ref = ops.nms_numpy(boxes, scores, 0.3, rotated=True)
    idx, keep = ops.nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.3, 32)
    got = np.asarray(idx)[np.asarray(keep)]
    np.testing.assert_array_equal(got, ref[: len(got)])
    assert len(got) == min(len(ref), 32)


def test_nms_normal_vs_numpy(rng):
    n = 48
    boxes = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(0, 20, n),
            rng.uniform(2, 5, n),
            rng.uniform(1, 2.5, n),
            np.zeros(n),
        ],
        axis=1,
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ref = ops.nms_numpy(boxes, scores, 0.5, rotated=False)
    idx, keep = ops.nms_normal(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 48)
    got = np.asarray(idx)[np.asarray(keep)]
    np.testing.assert_array_equal(got, ref)


def test_nms_blocked_matches_streaming(rng):
    """nms_blocked_sorted (the proposal layer's slab walk) is bit-identical
    to the one-row-per-iteration streaming walk: same keep set, same order,
    across block sizes, rotated/aligned, validity holes, clustered (deep
    suppression-chain) and spread candidates, and early-exit max_out."""
    from tpu3d.ops.nms import nms_blocked_sorted, nms_streaming_sorted

    n = 384
    for trial in range(6):
        boxes = np.zeros((n, 5), np.float32)
        if trial % 2 == 0:  # clustered: near-duplicate boxes, deep chains
            centers = rng.uniform(-25, 25, (12, 2))
            ci = rng.integers(0, 12, n)
            boxes[:, :2] = centers[ci] + rng.normal(0, 0.5, (n, 2))
        else:
            boxes[:, :2] = rng.uniform(-35, 35, (n, 2))
        boxes[:, 2:4] = rng.uniform(1.5, 4.5, (n, 2))
        boxes[:, 4] = rng.uniform(-math.pi, math.pi, n)
        valid = rng.random(n) > 0.15
        sb, sv = jnp.asarray(boxes), jnp.asarray(valid)
        rot = trial % 2 == 0
        thresh = [0.3, 0.7, 0.85][trial % 3]
        for max_out in (16, 128):
            a_i, a_m = nms_streaming_sorted(sb, sv, thresh, max_out,
                                            rotated=rot)
            for block in (64, 256, 512):
                b_i, b_m = nms_blocked_sorted(sb, sv, thresh, max_out,
                                              rotated=rot, block=block)
                np.testing.assert_array_equal(np.asarray(a_m),
                                              np.asarray(b_m))
                np.testing.assert_array_equal(
                    np.asarray(a_i)[np.asarray(a_m)],
                    np.asarray(b_i)[np.asarray(b_m)])


def test_nms_blocked_vs_numpy_oracle(rng):
    """Blocked NMS against the host greedy oracle (sorted candidates, full
    output budget so the oracle's variable-length keep list is comparable)."""
    from tpu3d.ops.nms import nms_blocked_sorted

    n = 200
    boxes = np.stack([rng.uniform(-20, 20, n), rng.uniform(0, 40, n),
                      rng.uniform(2, 5, n), rng.uniform(1, 2.5, n),
                      rng.uniform(-math.pi, math.pi, n)], axis=1)
    boxes = boxes.astype(np.float32)
    scores = rng.permutation(n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    ref = ops.nms_numpy(boxes[order], scores[order], 0.4, rotated=True)
    idx, keep = nms_blocked_sorted(jnp.asarray(boxes[order]),
                                   jnp.ones(n, bool), 0.4, n, rotated=True,
                                   block=64)
    got = np.asarray(idx)[np.asarray(keep)]
    np.testing.assert_array_equal(got, ref)


def test_nms_respects_validity_mask():
    boxes = jnp.array(
        [[0.0, 0.0, 4.0, 2.0, 0.0], [100.0, 100.0, 4.0, 2.0, 0.0]]
    )
    scores = jnp.array([0.5, 0.9])
    idx, keep = ops.nms_rotated(boxes, scores, 0.5, 2,
                                valid=jnp.array([True, False]))
    assert np.asarray(keep).tolist() == [True, False]
    assert int(idx[0]) == 0


# ----------------------------------------------------------------------- FPS

def test_fps_matches_numpy(rng):
    xyz = rng.normal(size=(2, 256, 3)).astype(np.float32)
    ref = ops.furthest_point_sample_numpy(xyz, 32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 32))
    np.testing.assert_array_equal(got, ref)


def test_fps_spreads_points():
    # grid of 4 clusters: 16 picks must hit all clusters
    rng = np.random.default_rng(3)
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 0, 10], [10, 0, 10]], np.float32)
    pts = (centers[:, None] + rng.normal(scale=0.1, size=(4, 64, 3))).reshape(1, -1, 3)
    idx = np.asarray(ops.furthest_point_sample(jnp.asarray(pts, jnp.float32), 16))[0]
    picked = pts[0, idx]
    for c in centers:
        assert np.min(np.linalg.norm(picked - c, axis=1)) < 1.0


# ---------------------------------------------------------------- ball query

def test_ball_query_matches_numpy(rng):
    pts = rng.normal(scale=2.0, size=(2, 128, 3)).astype(np.float32)
    centers = pts[:, :32]
    ref = ops.ball_query_numpy(centers, pts, 1.0, 8)
    got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(pts), 1.0,
                                    8, method="first"))
    np.testing.assert_array_equal(got, ref)
    # chunked variant identical
    got_c = np.asarray(
        ops.ball_query(jnp.asarray(centers), jnp.asarray(pts), 1.0, 8,
                       query_chunk=8, method="first")
    )
    np.testing.assert_array_equal(got_c, ref)
    # default nearest mode: every returned neighbor is in radius (when the row
    # has any hit) and includes the query point itself (distance 0)
    near = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(pts),
                                     1.0, 8))
    for b in range(2):
        for m in range(32):
            d = np.linalg.norm(pts[b][near[b, m]] - centers[b, m], axis=-1)
            assert (d < 1.0).all()
            assert near[b, m, 0] == m  # the center is its own nearest point


def test_ball_query_auto_dispatch(rng):
    """'auto' (the default) resolves to an explicit rule per backend — on CPU
    to 'nearest' — and an explicitly named method is always honored (the
    neighbor-rule A/B studies pass method= and must get what they name)."""
    pts = rng.normal(scale=2.0, size=(2, 128, 3)).astype(np.float32)
    centers = pts[:, :32]
    auto = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(pts),
                                     1.0, 8, method="auto"))
    default = np.asarray(ops.ball_query(jnp.asarray(centers),
                                        jnp.asarray(pts), 1.0, 8))
    near = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(pts),
                                     1.0, 8, method="nearest"))
    first = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(pts),
                                      1.0, 8, method="first"))
    np.testing.assert_array_equal(auto, default)
    np.testing.assert_array_equal(auto, near)  # CPU auto -> nearest
    np.testing.assert_array_equal(first, ops.ball_query_numpy(
        centers, pts, 1.0, 8))
    assert not np.array_equal(near, first)  # the two rules genuinely differ


def test_ball_query_empty_and_pad():
    pts = jnp.asarray(np.array([[[0, 0, 0], [0.1, 0, 0], [5, 5, 5]]], np.float32))
    centers = jnp.asarray(np.array([[[0, 0, 0], [100, 100, 100]]], np.float32))
    got = np.asarray(ops.ball_query(centers, pts, 0.5, 4))
    # center 0: hits {0, 1}; pad with first hit 0
    np.testing.assert_array_equal(got[0, 0], [0, 1, 0, 0])
    # center 1: no hits -> zeros (CUDA parity)
    np.testing.assert_array_equal(got[0, 1], [0, 0, 0, 0])


def test_group_points():
    feats = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    idx = jnp.array([[[0, 2], [3, 3]], [[1, 0], [2, 1]]], dtype=jnp.int32)
    out = np.asarray(ops.group_points(feats, idx))
    assert out.shape == (2, 2, 2, 3)
    np.testing.assert_allclose(out[0, 0, 1], np.asarray(feats)[0, 2])
    np.testing.assert_allclose(out[1, 1, 0], np.asarray(feats)[1, 2])


# ------------------------------------------------------------------ three_nn

def test_three_nn_matches_numpy(rng):
    unknown = rng.normal(size=(2, 64, 3)).astype(np.float32)
    known = rng.normal(size=(2, 16, 3)).astype(np.float32)
    ref_d, ref_i = ops.three_nn_numpy(unknown, known)
    got_d, got_i = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    got_d, got_i = np.asarray(got_d), np.asarray(got_i)
    np.testing.assert_allclose(np.sort(got_d, axis=-1), np.sort(ref_d, axis=-1),
                               atol=1e-4)
    # same neighbor set (order may differ on exact ties)
    np.testing.assert_array_equal(np.sort(got_i, axis=-1), np.sort(ref_i, axis=-1))


def test_three_interpolate_weights():
    feats = jnp.asarray(np.array([[[1.0, 10.0], [2.0, 20.0], [3.0, 30.0]]],
                                 np.float32))
    idx = jnp.asarray(np.array([[[0, 1, 2]]], np.int32))
    w = jnp.asarray(np.array([[[0.5, 0.25, 0.25]]], np.float32))
    out = np.asarray(ops.three_interpolate(feats, idx, w))
    np.testing.assert_allclose(out[0, 0], [1.75, 17.5], atol=1e-6)
    # interpolation_weights: exact hit dominates
    d = jnp.asarray(np.array([[[1e-9, 1.0, 2.0]]], np.float32))
    wts = np.asarray(ops.interpolation_weights(d))
    assert wts[0, 0, 0] > 0.999




def test_three_interpolate_onehot_matches_gather(rng):
    """The MXU one-hot formulation must match the exact gather within bf16
    activation tolerance (it is the TPU dispatch of three_interpolate)."""
    from tpu3d.ops.interpolate import _three_interpolate_onehot

    B, N, M, C = 2, 96, 200, 32
    feats = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, M, 3)).astype(np.int32)
    w = rng.random((B, M, 3)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    exact = np.asarray(ops.three_interpolate(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    fast = np.asarray(_three_interpolate_onehot(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    # error budget = bf16 input rounding of the 3 gathered values (~0.4%
    # relative each); the matmul accumulates in f32
    err = np.abs(fast - exact)
    assert err.max() < 0.05
    assert (err / (np.abs(exact) + 1.0)).mean() < 0.005

@pytest.mark.parametrize("chunk_bytes", [None, 2 * 160 * 6 * 96,
                                         2 * 160 * 6 * 100])
def test_three_interpolate_mxu_vjp_matches_autodiff(rng, chunk_bytes,
                                                    monkeypatch):
    """The custom VJP (chunked one-hot MXU matmul feature grad + regather
    weight grad — the TPU N>1024 training path) must match the plain
    formulation's autodiff within bf16 matmul tolerance, chunked and not."""
    from tpu3d.ops import interpolate as interp_mod
    from tpu3d.ops.interpolate import (_three_interpolate_gather_mxu_vjp,
                                       _ti_gather_fwd_impl)

    if chunk_bytes is not None:
        # shrink the budget so the (M=384)-column grad runs as scan chunks;
        # the chunk=100 case doesn't divide M=384 and exercises the
        # pad-to-chunk-multiple path (sentinel index N, zero weight/cotangent)
        monkeypatch.setattr(interp_mod, "_ONEHOT_SLAB_BYTES", chunk_bytes)

    B, N, M, C = 2, 160, 384, 32
    feats = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, M, 3)).astype(np.int32)
    w = rng.random((B, M, 3)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    g = rng.normal(size=(B, M, C)).astype(np.float32)

    def ref_loss(f, wt):
        return jnp.sum(_ti_gather_fwd_impl(f, jnp.asarray(idx), wt)
                       * jnp.asarray(g))

    def custom_loss(f, wt):
        return jnp.sum(_three_interpolate_gather_mxu_vjp(
            f, jnp.asarray(idx), wt) * jnp.asarray(g))

    gf_ref, gw_ref = jax.grad(ref_loss, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w))
    gf, gw = jax.grad(custom_loss, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w))
    # weight grad is computed in f32 (regather + dot) — tight tolerance;
    # feature grad rides bf16 one-hot matmuls — bf16 rounding budget
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-5, atol=1e-5)
    err = np.abs(np.asarray(gf) - np.asarray(gf_ref))
    assert err.max() < 0.1
    assert (err / (np.abs(np.asarray(gf_ref)) + 1.0)).mean() < 0.01

    # forward value is the identical gather formulation
    np.testing.assert_array_equal(
        np.asarray(_three_interpolate_gather_mxu_vjp(
            jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))),
        np.asarray(_ti_gather_fwd_impl(
            jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))))


def test_three_interpolate_pallas_matches_gather(rng):
    """The fully-fused Pallas interpolation (in-kernel one-hot rows +
    VMEM accumulator backward; the FP_0 wide-table path) vs the plain
    gather formulation, forward and grads — interpret mode on CPU."""
    from tpu3d.ops.interpolate import (_three_interpolate_pallas,
                                       _ti_gather_fwd_impl)

    B, N, M, C = 2, 256, 264, 128  # M a non-128 multiple of 8
    feats = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, M, 3)).astype(np.int32)
    w = rng.random((B, M, 3)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    g = rng.normal(size=(B, M, C)).astype(np.float32)

    out = np.asarray(_three_interpolate_pallas(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w), True))
    ref = np.asarray(_ti_gather_fwd_impl(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    err = np.abs(out - ref)
    assert err.max() < 0.05, err.max()  # bf16 rows/features rounding

    def loss_pallas(f, wt):
        return jnp.sum(_three_interpolate_pallas(f, jnp.asarray(idx), wt,
                                                 True) * jnp.asarray(g))

    def loss_ref(f, wt):
        return jnp.sum(_ti_gather_fwd_impl(f, jnp.asarray(idx), wt)
                       * jnp.asarray(g))

    gf, gw = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(feats),
                                                   jnp.asarray(w))
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(feats),
                                                    jnp.asarray(w))
    for a, b, tol in ((gf, gf_r, 0.1), (gw, gw_r, 0.3)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        e = np.abs(a - b) / (np.abs(b).max() + 1e-3)
        assert e.max() < tol and e.mean() < 5e-3, (e.max(), e.mean())


@pytest.mark.parametrize("chunk_bytes", [None, 2 * 160 * 2 * 96,
                                         2 * 160 * 2 * 100])
def test_group_points_mxu_vjp_matches_autodiff(rng, chunk_bytes, monkeypatch):
    """The wide-table grouping gather's custom VJP (chunked one-hot MXU
    matmul feature grad — the TPU N>2048 training path) must match the plain
    gather's autodiff within bf16 matmul tolerance, chunked and not, and be
    bit-identical in the forward."""
    from tpu3d.ops import grouping as group_mod
    from tpu3d.ops.grouping import (_gp_gather_impl,
                                    _group_points_gather_mxu_vjp)

    if chunk_bytes is not None:
        # shrink the budget so the (M·S=384)-row grad runs as scan chunks;
        # chunk=100 doesn't divide 384 and exercises the pad-to-chunk path
        monkeypatch.setattr(group_mod, "_ONEHOT_SLAB_BYTES", chunk_bytes)

    B, N, M, S, C = 2, 160, 24, 16, 32
    feats = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, M, S)).astype(np.int32)
    g = rng.normal(size=(B, M, S, C)).astype(np.float32)

    def ref_loss(f):
        return jnp.sum(_gp_gather_impl(f, jnp.asarray(idx)) * jnp.asarray(g))

    def custom_loss(f):
        return jnp.sum(_group_points_gather_mxu_vjp(f, jnp.asarray(idx))
                       * jnp.asarray(g))

    gf_ref = jax.grad(ref_loss)(jnp.asarray(feats))
    gf = jax.grad(custom_loss)(jnp.asarray(feats))
    # feature grad rides bf16 one-hot matmuls (f32 accumulate) — bf16
    # rounding budget on the cotangent values
    err = np.abs(np.asarray(gf) - np.asarray(gf_ref))
    assert err.max() < 0.1
    assert (err / (np.abs(np.asarray(gf_ref)) + 1.0)).mean() < 0.01

    # forward value is the identical gather formulation
    np.testing.assert_array_equal(
        np.asarray(_group_points_gather_mxu_vjp(jnp.asarray(feats),
                                                jnp.asarray(idx))),
        np.asarray(_gp_gather_impl(jnp.asarray(feats), jnp.asarray(idx))))


# ------------------------------------------------------------------- roipool

def test_roipool_matches_numpy(rng):
    B, N, M, K = 2, 128, 4, 16
    pts = rng.uniform([-10, -1, 0], [10, 2, 30], size=(B, N, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, 2)).astype(np.float32)
    boxes = np.zeros((B, M, 7), np.float32)
    boxes[..., 0] = rng.uniform(-8, 8, (B, M))
    boxes[..., 1] = 1.5
    boxes[..., 2] = rng.uniform(5, 25, (B, M))
    boxes[..., 3:6] = [1.8, 3.0, 5.0]
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (B, M))
    ref_pool, ref_empty = ops.roipool3d_numpy(pts, feats, boxes, 1.0, K)
    got_pool, got_empty = ops.roipool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(boxes), 1.0, K)
    np.testing.assert_array_equal(np.asarray(got_empty), ref_empty)
    np.testing.assert_allclose(np.asarray(got_pool), ref_pool, atol=1e-5)


def test_roipool_wraparound():
    pts = jnp.asarray(np.array([[[0.0, -0.5, 0.0], [0.1, -0.5, 0.1],
                                 [50, 0, 50]]], np.float32))
    feats = jnp.asarray(np.array([[[1.0], [2.0], [3.0]]], np.float32))
    boxes = jnp.asarray(np.array([[[0, 0, 0, 2, 4, 4, 0.0]]], np.float32))
    pooled, empty = ops.roipool3d(pts, feats, boxes, 0.0, 5)
    pooled = np.asarray(pooled)
    assert not bool(empty[0, 0])
    # 2 hits wrap: slots = [0, 1, 0, 1, 0]
    np.testing.assert_allclose(pooled[0, 0, :, 3], [1, 2, 1, 2, 1])


# ----------------------------------------------------------- jax geometry twin

def test_jax_geometry_matches_numpy(rng):
    boxes = np.zeros((5, 7), np.float32)
    boxes[:, 0] = rng.uniform(-10, 10, 5)
    boxes[:, 1] = rng.uniform(0, 2, 5)
    boxes[:, 2] = rng.uniform(5, 40, 5)
    boxes[:, 3:6] = rng.uniform(1, 4, (5, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 5)
    np.testing.assert_allclose(
        np.asarray(ops.corners_from_boxes3d(jnp.asarray(boxes))),
        npboxes.corners_from_boxes3d(boxes), atol=1e-4)
    pts = rng.uniform([-10, -1, 0], [10, 2, 40], size=(256, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(ops.points_in_boxes3d(jnp.asarray(pts), jnp.asarray(boxes))),
        npboxes.points_in_boxes3d(pts, boxes))


def test_fps_pallas_interpret_matches_xla(rng):
    """The Pallas FPS kernel (interpret mode on CPU) must match the XLA path."""
    import jax.numpy as jnp

    from tpu3d.ops import sampling

    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
    ref = np.asarray(sampling._fps_xla(xyz, 64))
    got = np.asarray(sampling._fps_pallas(xyz, 64, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_rotated_iou_native_matches_python_oracle(rng):
    """The C host kernel must agree with the independent S-H python oracle."""
    import math as _math

    from tpu3d.runtime.native import get_rotated_iou

    assert get_rotated_iou()[1] is not None, "native rotated_iou failed to build"
    a = np.stack([rng.uniform(-5, 5, 16), rng.uniform(-5, 5, 16),
                  rng.uniform(1, 5, 16), rng.uniform(1, 3, 16),
                  rng.uniform(-_math.pi, _math.pi, 16)], axis=1)
    b = np.stack([rng.uniform(-5, 5, 12), rng.uniform(-5, 5, 12),
                  rng.uniform(1, 5, 12), rng.uniform(1, 3, 12),
                  rng.uniform(-_math.pi, _math.pi, 12)], axis=1)
    for crit in (-2, -1, 0, 1):
        native = ops.rotated_iou_bev_numpy(a, b, criterion=crit, backend="auto")
        oracle = ops.rotated_iou_bev_numpy(a, b, criterion=crit,
                                           backend="python")
        np.testing.assert_allclose(native, oracle, atol=1e-9,
                                   err_msg=f"criterion {crit}")
    # identical boxes -> IoU exactly 1 in the C kernel too
    same = ops.rotated_iou_bev_numpy(a[:3], a[:3].copy(), criterion=-1)
    np.testing.assert_allclose(np.diag(same), 1.0, atol=1e-9)


def test_group_points_onehot_path(rng):
    """The MXU one-hot gather path must equal the exact gather up to bf16
    rounding of the feature values."""
    from tpu3d.ops.grouping import _group_points_onehot

    feats = rng.normal(size=(2, 64, 32)).astype(np.float32)
    idx = rng.integers(0, 64, size=(2, 8, 4)).astype(np.int32)
    exact = np.asarray(ops.group_points(jnp.asarray(feats), jnp.asarray(idx)))
    fast = np.asarray(_group_points_onehot(jnp.asarray(feats),
                                           jnp.asarray(idx)))
    np.testing.assert_allclose(fast, exact, rtol=1e-2, atol=1e-2)
    # one-hot selection of bf16-rounded values is exact vs bf16 gather
    bf16_exact = np.asarray(jnp.asarray(feats, jnp.bfloat16).astype(
        jnp.float32))
    flat = idx.reshape(2, 32)
    ref = np.stack([bf16_exact[b][flat[b]] for b in range(2)]).reshape(
        2, 8, 4, 32)
    np.testing.assert_array_equal(fast, ref.astype(np.float32))


def test_three_nn_pallas_interpret_exact(rng):
    """The Pallas 3-NN kernel (interpret mode) must be bit-exact vs the
    numpy oracle — it replaced the 0.99-recall approx_min_k formulation
    (interpolate_gpu.cu:9-70 is exact; so are we now)."""
    from tpu3d.ops import interpolate

    for (B, M, N) in [(2, 256, 100), (2, 128, 64), (1, 384, 1024)]:
        u = rng.normal(size=(B, M, 3)).astype(np.float32) * 20
        k = rng.normal(size=(B, N, 3)).astype(np.float32) * 20
        idx = np.asarray(interpolate._three_nn_idx_pallas(
            jnp.asarray(u), jnp.asarray(k), interpret=True))
        _, i_ref = interpolate.three_nn_numpy(u, k)
        np.testing.assert_array_equal(idx, i_ref)


def test_nearest_k_pallas_interpret(rng):
    """The fused nearest-k kernel (interpret mode): returned distances must be
    the true distances of the returned indices (exact f32 VPU computation, up
    to summation order), rows must be sorted nearest-first, and recall vs the
    exact k-NN must be high (lane-collision approximation, same family as
    approx_min_k)."""
    from tpu3d.ops.grouping import _nearest_k_pallas

    for (B, M, N, K) in [(2, 256, 1024, 32), (1, 128, 640, 16),
                         (2, 200, 256, 8)]:
        c = (rng.normal(size=(B, M, 3)) * 20).astype(np.float32)
        p = (rng.normal(size=(B, N, 3)) * 20).astype(np.float32)
        d2, idx = _nearest_k_pallas(jnp.asarray(c), jnp.asarray(p), K,
                                    interpret=True)
        d2, idx = np.asarray(d2), np.asarray(idx)
        full = ((c[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
        true_d2 = np.take_along_axis(full, idx, axis=2)
        np.testing.assert_allclose(d2, true_d2, rtol=1e-6)
        assert (np.diff(d2, axis=2) >= 0).all()
        oidx = np.argsort(full, axis=2, kind="stable")[:, :, :K]
        recall = np.mean([len(set(idx[b, m]) & set(oidx[b, m])) / K
                          for b in range(B) for m in range(M)])
        assert recall > 0.93, recall


def test_ball_query_from_nearest_matches_ball_query(rng):
    """Prefix + radius filter of nearest-k candidates == the nearest-method
    ball query (shared-candidate path used by the MSG SA layers)."""
    from tpu3d.ops.grouping import ball_query_from_nearest, nearest_k

    c = (rng.normal(size=(2, 64, 3)) * 2).astype(np.float32)
    p = (rng.normal(size=(2, 512, 3)) * 2).astype(np.float32)
    d2, idx = nearest_k(jnp.asarray(c), jnp.asarray(p), 32)
    for radius, nsample in [(0.5, 16), (1.0, 32), (0.1, 8)]:
        got = np.asarray(ball_query_from_nearest(d2, idx, radius, nsample,
                                                 512))
        ref = np.asarray(ops.ball_query(jnp.asarray(c), jnp.asarray(p),
                                        radius, nsample))
        np.testing.assert_array_equal(got, ref)


def test_nearest_k_with_coords(rng):
    """with_coords returns the picked points' coordinates bit-identical to a
    gather of the returned indices (both the Pallas interpret path and the
    fallback)."""
    from tpu3d.ops.grouping import _nearest_k_pallas, nearest_k

    c = (rng.normal(size=(2, 128, 3)) * 10).astype(np.float32)
    p = (rng.normal(size=(2, 640, 3)) * 10).astype(np.float32)
    d2, idx, xyz = _nearest_k_pallas(jnp.asarray(c), jnp.asarray(p), 16,
                                     interpret=True, with_coords=True)
    d2, idx, xyz = map(np.asarray, (d2, idx, xyz))
    ref = np.stack([p[b][idx[b].reshape(-1)].reshape(128, 16, 3)
                    for b in range(2)])
    np.testing.assert_array_equal(xyz, ref)
    d2b, idxb = _nearest_k_pallas(jnp.asarray(c), jnp.asarray(p), 16,
                                  interpret=True)
    np.testing.assert_array_equal(idx, np.asarray(idxb))
    # fallback path agrees with its own indices too
    d2f, idxf, xyzf = nearest_k(jnp.asarray(c), jnp.asarray(p), 16,
                                with_coords=True)
    reff = np.stack([p[b][np.asarray(idxf)[b].reshape(-1)].reshape(128, 16, 3)
                     for b in range(2)])
    np.testing.assert_array_equal(np.asarray(xyzf), reff)


def test_nearest_k_windowed_interpret(rng):
    """The depth-windowed nearest-k kernel (interpret mode): every returned
    finite-distance slot must be a true distance of the returned index
    (proving the sorted-order index/row un-permutation is right), rows must
    be nearest-first, and every oracle in-radius neighbor must either be
    returned, shadowed by a nearer same-lane candidate (the documented mod-W
    collision), or crowded out by k nearer returned candidates."""
    from tpu3d.ops.grouping import (_nk_tiling, _round_up,
                                    ball_query_from_nearest,
                                    nearest_k_windowed)

    B, M, N, K = 2, 256, 2048, 16
    radius = 3.0
    # KITTI-like extents: z (the window axis) is the long axis
    p = np.stack([rng.uniform(-20, 20, size=(B, N)),
                  rng.uniform(-1, 2, size=(B, N)),
                  rng.uniform(0, 70, size=(B, N))], axis=-1).astype(np.float32)
    c = np.stack([rng.uniform(-20, 20, size=(B, M)),
                  rng.uniform(-1, 2, size=(B, M)),
                  rng.uniform(0, 70, size=(B, M))], axis=-1).astype(np.float32)
    d2, idx, xyz = nearest_k_windowed(jnp.asarray(c), jnp.asarray(p), K,
                                      radius, interpret=True,
                                      with_coords=True)
    d2, idx, xyz = map(np.asarray, (d2, idx, xyz))

    # windowed=True so the oracle's lane width tracks the kernel's actual
    # choice (including a TPU3D_NK_WIN_W override)
    W, _, _ = _nk_tiling(M, _round_up(N, 128), K, True, windowed=True)
    full = ((c[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
    finite = np.isfinite(d2)
    # returned distances/coords are the true ones for the returned indices
    true_d2 = np.take_along_axis(full, idx, axis=2)
    np.testing.assert_allclose(d2[finite], true_d2[finite], rtol=1e-6)
    np.testing.assert_array_equal(
        xyz[finite], np.stack([p[b][idx[b].reshape(-1)].reshape(M, K, 3)
                               for b in range(B)])[finite])
    # nearest-first among finite slots
    padded = np.where(finite, d2, np.inf)
    assert (np.diff(padded, axis=2) >= 0)[finite[:, :, 1:]].all()

    missed = total = 0
    for b in range(B):
        lane = np.empty(N, np.int64)  # lane of each point in sorted order
        lane[np.argsort(p[b, :, 2], kind="stable")] = np.arange(N) % W
        for m in range(M):
            hits = np.where(full[b, m] < radius * radius)[0]
            total += len(hits)
            got = set(idx[b, m][finite[b, m]])
            for q in hits:
                if q in got:
                    continue
                shadowed = any(lane[r] == lane[q]
                               and full[b, m, r] <= full[b, m, q]
                               for r in got)
                crowded = (finite[b, m].all()
                           and full[b, m, q] >= d2[b, m, -1])
                assert shadowed or crowded, (b, m, q)
                missed += not crowded  # pure lane collision
    assert missed <= max(2, 0.02 * total), (missed, total)  # collisions rare

    # the ball-query derivation returns only true in-radius neighbors
    bq = np.asarray(ball_query_from_nearest(
        jnp.asarray(d2), jnp.asarray(idx), radius, K, N))
    row_hit = d2[..., 0] < radius * radius
    picked_d2 = np.take_along_axis(full, bq, axis=2)
    assert (picked_d2[row_hit] < radius * radius).all()


def test_group_points_precise_matches_gather(rng):
    """The exact one-hot path (what precise=True routes to on TPU) must be
    bit-identical to the plain gather — it protects scene-frame pre-grouped
    activations from the bf16 rounding that the later center-term
    cancellation would amplify. Called directly because the group_points
    dispatch is backend-gated (on CPU precise falls through to the gather)."""
    from tpu3d.ops.grouping import _group_points_onehot_exact, group_points

    feats = (rng.normal(size=(2, 256, 32)) * 50).astype(np.float32)
    idx = rng.integers(0, 256, size=(2, 16, 8)).astype(np.int32)
    flat = idx.reshape(2, 16 * 8)
    ref = np.stack([feats[b][flat[b]] for b in range(2)]).reshape(2, 16, 8, 32)
    got = np.asarray(_group_points_onehot_exact(jnp.asarray(feats),
                                                jnp.asarray(idx)))
    np.testing.assert_array_equal(got, ref)
    # the public wrapper agrees on every backend
    np.testing.assert_array_equal(
        np.asarray(group_points(jnp.asarray(feats), jnp.asarray(idx),
                                precise=True)), ref)


def test_fps_with_3nn_fused_kernel_exact(rng):
    """The fused FPS+3NN Pallas kernel (interpret mode) is bit-exact against
    the FPS oracle and the stable-sort three_nn oracle, including duplicate
    points (distance ties break to the earlier pick / lower index)."""
    from tpu3d.ops.interpolate import three_nn_numpy
    from tpu3d.ops.sampling import _fps3nn_pallas, furthest_point_sample_numpy

    B, N, P = 2, 384, 96
    xyz = rng.normal(0, 10, (B, N, 3)).astype(np.float32)
    xyz[0, 7] = xyz[0, 3]  # duplicates: tie semantics
    xyz[1, 100:104] = xyz[1, 0]
    idx, d2, nni = _fps3nn_pallas(jnp.asarray(xyz), P, interpret=True)
    ref_idx = furthest_point_sample_numpy(xyz, P)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    centers = np.take_along_axis(xyz, ref_idx[..., None], axis=1)
    ref_d, ref_i = three_nn_numpy(xyz, centers)
    np.testing.assert_array_equal(np.asarray(nni), ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d,
                               rtol=1e-5, atol=1e-5)


def test_fps_with_3nn_fallback_matches(rng):
    """The non-Pallas fallback of furthest_point_sample_with_3nn returns the
    same indices and (squared) distances as separate FPS + three_nn."""
    from tpu3d.ops import (furthest_point_sample, gather_points,
                           furthest_point_sample_with_3nn, three_nn)

    xyz = jnp.asarray(rng.normal(0, 5, (2, 256, 3)), jnp.float32)
    idx, d2, nni = furthest_point_sample_with_3nn(xyz, 64)
    ref_idx = furthest_point_sample(xyz, 64)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    dist, ref_nn = three_nn(xyz, gather_points(xyz, ref_idx),
                            differentiable=False)
    np.testing.assert_array_equal(np.asarray(nni), np.asarray(ref_nn))
    np.testing.assert_allclose(np.asarray(d2),
                               np.asarray(dist) ** 2, rtol=1e-5, atol=1e-6)


def test_env_flag_falsy_values(monkeypatch):
    """FLAG=0 / false / off must read as OFF (knobs are A/B switches whose
    '0' setting has to mean 'default behavior', not 'truthy string')."""
    from tpu3d.ops.envflags import env_flag

    for v in ("0", "false", "False", "no", "off", ""):
        monkeypatch.setenv("TPU3D_BALLQ_NEAREST", v)
        assert not env_flag("TPU3D_BALLQ_NEAREST"), v
    for v in ("1", "true", "on", "yes"):
        monkeypatch.setenv("TPU3D_BALLQ_NEAREST", v)
        assert env_flag("TPU3D_BALLQ_NEAREST"), v
    monkeypatch.delenv("TPU3D_BALLQ_NEAREST")
    assert not env_flag("TPU3D_BALLQ_NEAREST")


def test_group_points_routing_table():
    """The pure routing decision behind group_points: the f32-parity gate
    (exact=True) must never route to a bf16-rounded path — neither the small-
    table bf16 one-hot forward nor the wide-table bf16 MXU backward — and the
    TPU fast paths must only engage on the TPU backend."""
    from tpu3d.ops.grouping import _gp_route

    # CPU backend: always the plain gather regardless of flags
    for precise in (False, True):
        for exact in (False, True):
            assert _gp_route("cpu", 512, 64, 8192, precise, exact) == "gather"

    # TPU small table: bf16 one-hot only for wide channels, non-precise,
    # non-exact, 8-aligned rows
    assert _gp_route("tpu", 512, 64, 8192, False, False) == "onehot_bf16"
    assert _gp_route("tpu", 512, 64, 8192, True, False) == "onehot_exact"
    assert _gp_route("tpu", 512, 64, 8192, False, True) == "onehot_exact"
    assert _gp_route("tpu", 512, 3, 8192, False, False) == "onehot_exact"
    assert _gp_route("tpu", 512, 64, 8191, False, False) == "gather"

    # TPU wide table: exact gather forward + bf16 MXU backward, EXCEPT under
    # the f32-parity gate
    assert _gp_route("tpu", 16384, 64, 8192, False, False) == "gather_mxu_bwd"
    assert _gp_route("tpu", 16384, 64, 8192, True, False) == "gather_mxu_bwd"
    assert _gp_route("tpu", 16384, 64, 8192, False, True) == "gather"
    assert _gp_route("tpu", 16384, 64, 8192, True, True) == "gather"
    # narrow channels never pay the one-hot movement FLOPs
    assert _gp_route("tpu", 16384, 8, 8192, False, False) == "gather"

    # explicit caller-side backward-precision choice: bf16_bwd=False keeps
    # the exact scatter VJP for any non-exact wide-table caller; True
    # consents to the MXU backward; None defers to the route default
    assert _gp_route("tpu", 16384, 64, 8192, True, False,
                     bf16_bwd=False) == "gather"
    assert _gp_route("tpu", 16384, 64, 8192, False, False,
                     bf16_bwd=False) == "gather"
    assert _gp_route("tpu", 16384, 64, 8192, True, False,
                     bf16_bwd=True) == "gather_mxu_bwd"
    # exact always wins over an (inconsistent) bf16_bwd=True
    assert _gp_route("tpu", 16384, 64, 8192, True, True,
                     bf16_bwd=True) == "gather"


def test_nk_win_w_knob_validation(monkeypatch):
    """TPU3D_NK_WIN_W must only take effect for positive multiples of 128
    that divide NPAD; negative, sub-tile, non-divisor, oversized, or
    non-numeric values are ignored (they would produce negative block ids,
    sub-lane tiles, or VMEM blowups)."""
    from tpu3d.ops.grouping import _nk_tiling

    M, NPAD, k = 256, 2048, 16
    base_w, base_nb, tile_m = _nk_tiling(M, NPAD, k, True, windowed=True)
    assert tile_m == 128
    for bad in ("-256", "64", "100", "4096", "banana", ""):
        monkeypatch.setenv("TPU3D_NK_WIN_W", bad)
        w, nb, _ = _nk_tiling(M, NPAD, k, True, windowed=True)
        assert (w, nb) == (base_w, base_nb), bad
    monkeypatch.setenv("TPU3D_NK_WIN_W", "128")
    w, nb, _ = _nk_tiling(M, NPAD, k, True, windowed=True)
    assert (w, nb) == (128, 16)
    # VMEM cap: with coords the kernel carries 9 live (128, W) f32 arrays,
    # so W=2048 (9.4MB of carries) exceeds the 8MB budget and is ignored;
    # without coords (6 carries, 6.3MB) the same W is accepted
    monkeypatch.setenv("TPU3D_NK_WIN_W", "2048")
    w, nb, _ = _nk_tiling(M, NPAD, k, True, windowed=True)
    assert (w, nb) == (base_w, base_nb)
    w, nb, _ = _nk_tiling(M, NPAD, k, False, windowed=True)
    assert (w, nb) == (2048, 1)
