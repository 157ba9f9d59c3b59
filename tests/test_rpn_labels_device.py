"""Device-side RPN label generation + device_prefetch staging.

`generate_rpn_labels_device` must be an exact twin of the host loader's
`KittiRCNNDataset.generate_rpn_training_labels` (reference:
lib/datasets/kitti_rcnn_dataset.py:384-414), including the per-box
last-write-wins overwrite semantics for overlapping boxes and the
xor-based ignore band. Moving it on-device cuts per-step host->device
traffic ~4x (the labels are (N,) int32 + (N, 7) f32 derived from ~11 KB
of gt boxes).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _random_scene(seed, n_pts=768, n_boxes=5, overlap=True, n_pad=3):
    """Random points + boxes with guaranteed interior points and (optionally)
    heavily overlapping boxes; returns (pts, boxes_unpadded, boxes_padded)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-20, -2, 0], [20, 3, 40],
                      size=(n_pts, 3)).astype(np.float32)
    centers = rng.uniform([-15, 0.0, 5], [15, 2.0, 35], size=(n_boxes, 3))
    if overlap and n_boxes >= 2:
        # make box pairs near-coincident so the per-box overwrite order and
        # the ignore-band overwrites actually matter
        centers[1::2] = (centers[0::2][: centers[1::2].shape[0]]
                         + rng.normal(0, 0.6, centers[1::2].shape))
    sizes = np.abs(rng.normal([1.5, 1.6, 3.8], 0.3, size=(n_boxes, 3)))
    ry = rng.uniform(-np.pi, np.pi, size=(n_boxes, 1))
    boxes = np.concatenate([centers, sizes, ry], axis=1).astype(np.float32)
    # inject interior points for every box (canonical frame -> world)
    for k in range(n_boxes):
        cx, cy, cz, h, w, l, yaw = boxes[k]
        lx = rng.uniform(-0.4, 0.4, 8) * l
        lz = rng.uniform(-0.4, 0.4, 8) * w
        ly = rng.uniform(-0.9, -0.1, 8) * h
        c, s = np.cos(yaw), np.sin(yaw)
        wx = c * lx + s * lz + cx
        wz = -s * lx + c * lz + cz
        pts[k * 8: (k + 1) * 8] = np.stack(
            [wx, ly + cy, wz], axis=1).astype(np.float32)
        # and one point in the 0.2 m extension band (outside the box,
        # inside its enlargement) so the ignore/-1 path is always exercised
        ex = (l / 2 + 0.1) * c + cx
        ez = -(l / 2 + 0.1) * s + cz
        pts[n_boxes * 8 + k] = np.array(
            [ex, cy - 0.3 * h, ez], np.float32)
    padded = np.zeros((n_boxes + n_pad, 7), np.float32)
    padded[:n_boxes] = boxes
    return pts, boxes, padded


@pytest.mark.parametrize("seed,overlap", [(0, False), (1, True), (2, True),
                                          (3, True)])
def test_device_labels_match_host(seed, overlap):
    from tpu3d.datasets.kitti_rcnn_dataset import KittiRCNNDataset
    from tpu3d.models.train_functions import generate_rpn_labels_device

    pts, boxes, padded = _random_scene(seed, overlap=overlap)
    cls_h, reg_h = KittiRCNNDataset.generate_rpn_training_labels(
        None, pts, boxes)
    assert (cls_h == 1).sum() > 10  # the scene actually has foreground
    if overlap:
        assert (cls_h == -1).sum() > 0  # and an ignore band

    cls_d, reg_d = generate_rpn_labels_device(pts, padded)
    np.testing.assert_array_equal(np.asarray(cls_d), cls_h)
    np.testing.assert_array_equal(np.asarray(reg_d), reg_h)


def test_device_labels_empty_gt():
    from tpu3d.models.train_functions import generate_rpn_labels_device

    pts = np.random.default_rng(0).uniform(
        -10, 10, size=(256, 3)).astype(np.float32)
    cls_d, reg_d = generate_rpn_labels_device(pts, np.zeros((8, 7), np.float32))
    assert not np.asarray(cls_d).any()
    assert not np.asarray(reg_d).any()


def test_train_step_derives_labels_on_device(tmp_path):
    """A batch WITHOUT rpn_cls_label/rpn_reg_label trains identically to the
    same batch carrying the device-generated labels explicitly (the injection
    path in make_train_step), and the dataset's device_rpn_labels flag
    actually drops the keys from loader batches."""
    import jax
    import jax.numpy as jnp
    from test_model import small_cfg

    from tpu3d.datasets import (BatchLoader, KittiRCNNDataset,
                                create_synthetic_kitti)
    from tpu3d.models import PointRCNN
    from tpu3d.models.train_functions import generate_rpn_labels_device
    from tpu3d.parallel import create_train_state, make_train_step

    root = str(tmp_path / "synth")
    create_synthetic_kitti(root, n_frames=4, seed=3, image_files=True)
    c = small_cfg(rcnn=True)
    c.GT_AUG_ENABLED = False
    ds = KittiRCNNDataset(root_dir=root, npoints=c.RPN.NUM_POINTS,
                          split="train", mode="TRAIN", cfg=c,
                          device_rpn_labels=True)
    assert "rpn_cls_label" not in ds[0]
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()
             if k in ("pts_input", "gt_boxes3d")}

    model = PointRCNN(cfg=c, mode="TRAIN")
    state = create_train_state(
        c, model, {"pts_input": batch["pts_input"][:1],
                   "gt_boxes3d": batch["gt_boxes3d"][:1]},
        jax.random.PRNGKey(0), 1, 1)
    step = jax.jit(make_train_step(c, model))

    _, tb_derived = step(state, batch, jax.random.PRNGKey(1),
                         jnp.float32(0.9))
    cls_l, reg_l = jax.vmap(generate_rpn_labels_device)(
        batch["pts_input"][..., :3], batch["gt_boxes3d"])
    _, tb_explicit = step(
        state, dict(batch, rpn_cls_label=cls_l, rpn_reg_label=reg_l),
        jax.random.PRNGKey(1), jnp.float32(0.9))
    assert float(tb_derived["loss"]) == pytest.approx(
        float(tb_explicit["loss"]), abs=1e-6)
    assert float(tb_derived["rpn_loss_cls"]) > 0


def test_device_labels_match_host_on_loader_scenes(tmp_path):
    """Host vs device labels on real loader scenes (synthetic KITTI with
    surface points): mismatches can only come from host-numpy vs XLA trig
    ulp differences at box boundaries — require them to be negligible."""
    from test_model import small_cfg

    from tpu3d.datasets import KittiRCNNDataset, create_synthetic_kitti
    from tpu3d.models.train_functions import generate_rpn_labels_device

    root = str(tmp_path / "synth")
    create_synthetic_kitti(root, n_frames=4, seed=5, image_files=True)
    c = small_cfg()
    c.GT_AUG_ENABLED = False
    ds = KittiRCNNDataset(root_dir=root, npoints=c.RPN.NUM_POINTS,
                          split="train", mode="TRAIN", cfg=c)
    total = mismatch = 0
    for i in range(len(ds)):
        s = ds[i]
        cls_d, _ = generate_rpn_labels_device(
            s["pts_input"][:, :3], s["gt_boxes3d"])
        total += s["rpn_cls_label"].size
        mismatch += int((np.asarray(cls_d) != s["rpn_cls_label"]).sum())
    assert total > 0
    assert mismatch / total < 1e-3, (mismatch, total)


def test_device_prefetch_order_filter_and_errors():
    from tpu3d.datasets import device_prefetch

    batches = [{"a": np.full((4,), i, np.float32),
                "b": np.ones((2, 2), np.int32) * i,
                "sample_id": [f"s{i}"]} for i in range(7)]
    out = list(device_prefetch(iter(batches), size=2, keys=("a", "b")))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert set(b.keys()) == {"a", "b"}
        np.testing.assert_array_equal(np.asarray(b["a"]), batches[i]["a"])
        np.testing.assert_array_equal(np.asarray(b["b"]), batches[i]["b"])

    def boom():
        yield batches[0]
        raise RuntimeError("loader died")

    with pytest.raises(RuntimeError, match="loader died"):
        list(device_prefetch(boom(), size=1, keys=("a",)))
