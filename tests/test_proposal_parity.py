"""Distance-stratified proposal parity: jax fixed-shape vs numpy reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu3d.config import AttrDict
from tpu3d.models.proposal import distance_based_proposal
from tpu3d.ops.nms import nms_numpy


def _numpy_distance_based_proposal(scores, proposals, mode_cfg, nms_type):
    """Independent host re-derivation of the reference's
    distance_based_proposal (proposal_layer.py:58-119)."""
    pre_tot = mode_cfg.RPN_PRE_NMS_TOP_N
    post_tot = mode_cfg.RPN_POST_NMS_TOP_N
    pre_ks = [int(pre_tot * 0.7), pre_tot - int(pre_tot * 0.7)]
    post_ks = [int(post_tot * 0.7), post_tot - int(post_tot * 0.7)]
    order = np.argsort(-scores, kind="stable")
    s = scores[order]
    p = proposals[order]
    dist = p[:, 2]
    near = (dist > 0) & (dist <= 40.0)
    far = (dist > 40.0) & (dist <= 80.0)

    out_boxes, out_scores = [], []
    for i, band in enumerate((near, far)):
        if i == 1 and band.sum() == 0:
            # fallback: leftover near candidates beyond the near pre budget
            idxs = np.where(near)[0][pre_ks[0]:][:pre_ks[1]]
        else:
            idxs = np.where(band)[0][:pre_ks[i]]
        cand_b = p[idxs]
        cand_s = s[idxs]
        bev = np.stack([cand_b[:, 0], cand_b[:, 2], cand_b[:, 5],
                        cand_b[:, 4], cand_b[:, 6]], axis=1)
        keep = nms_numpy(bev, cand_s, mode_cfg.RPN_NMS_THRESH,
                         rotated=(nms_type == "rotate"))[:post_ks[i]]
        out_boxes.append(cand_b[keep])
        out_scores.append(cand_s[keep])
    return np.concatenate(out_boxes), np.concatenate(out_scores)


def _mode_cfg(pre, post, thresh):
    return AttrDict(RPN_PRE_NMS_TOP_N=pre, RPN_POST_NMS_TOP_N=post,
                    RPN_NMS_THRESH=thresh, RPN_DISTANCE_BASED_PROPOSE=True)


@pytest.mark.parametrize("nms_type", ["normal", "rotate"])
def test_distance_based_proposal_matches_numpy(rng, nms_type):
    n = 512
    proposals = np.zeros((n, 7), np.float32)
    proposals[:, 0] = rng.uniform(-30, 30, n)
    proposals[:, 1] = rng.uniform(0, 2, n)
    proposals[:, 2] = rng.uniform(1, 75, n)
    proposals[:, 3:6] = rng.uniform(1.2, 4.5, (n, 3))
    proposals[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.permutation(n).astype(np.float32)  # distinct, no tie issues
    mode_cfg = _mode_cfg(128, 32, 0.7)

    ref_boxes, ref_scores = _numpy_distance_based_proposal(
        scores, proposals, mode_cfg, nms_type)
    boxes, out_scores, mask = distance_based_proposal(
        jnp.asarray(scores), jnp.asarray(proposals), mode_cfg, nms_type)
    boxes = np.asarray(boxes)[np.asarray(mask)]
    out_scores = np.asarray(out_scores)[np.asarray(mask)]
    assert len(boxes) == len(ref_boxes)
    np.testing.assert_allclose(boxes, ref_boxes, atol=1e-5)
    np.testing.assert_allclose(out_scores, ref_scores, atol=1e-5)


def test_far_band_fallback(rng):
    """No far points: the far slot re-uses leftover near candidates
    (reference: proposal_layer.py:93-102)."""
    n = 256
    proposals = np.zeros((n, 7), np.float32)
    proposals[:, 2] = rng.uniform(1, 39, n)  # all near
    proposals[:, 0] = rng.uniform(-30, 30, n)
    proposals[:, 3:6] = rng.uniform(1.2, 4.5, (n, 3))
    proposals[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.permutation(n).astype(np.float32)
    mode_cfg = _mode_cfg(64, 16, 0.7)
    ref_boxes, _ = _numpy_distance_based_proposal(scores, proposals, mode_cfg,
                                                  "normal")
    boxes, _, mask = distance_based_proposal(
        jnp.asarray(scores), jnp.asarray(proposals), mode_cfg, "normal")
    boxes = np.asarray(boxes)[np.asarray(mask)]
    assert len(boxes) == len(ref_boxes)
    np.testing.assert_allclose(boxes, ref_boxes, atol=1e-5)
