"""Pipeline tests: dataset, loader, gt-database/aug tools, trainer plumbing."""

import os

import numpy as np
import pytest

from tpu3d.config import fresh_cfg
from tpu3d.datasets import BatchLoader, KittiRCNNDataset, create_synthetic_kitti


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    create_synthetic_kitti(str(root), n_frames=6, image_files=True, seed=1)
    return str(root)


def _cfg():
    c = fresh_cfg()
    c.GT_AUG_ENABLED = False
    c.RPN.USE_INTENSITY = False
    c.RPN.NUM_POINTS = 1024
    return c


def test_rpn_sample_shapes_and_labels(synth_root):
    c = _cfg()
    ds = KittiRCNNDataset(root_dir=synth_root, npoints=1024, split="train",
                          mode="TRAIN", cfg=c)
    assert len(ds) > 0
    s = ds[0]
    assert s["pts_input"].shape == (1024, 3)
    assert s["rpn_cls_label"].shape == (1024,)
    assert s["rpn_reg_label"].shape == (1024, 7)
    assert s["gt_boxes3d"].shape[1] == 7
    # synthetic cars put dense surface points inside boxes -> fg labels exist
    assert (s["rpn_cls_label"] == 1).sum() > 10
    # fg reg targets point at the box center: dy = center_y - pt_y, |dy| < h
    fg = s["rpn_cls_label"] == 1
    assert np.all(np.abs(s["rpn_reg_label"][fg, 0]) < 4.0)
    assert np.all(s["rpn_reg_label"][fg, 3] > 1.0)  # h
    # deterministic per (seed, epoch, index)
    s2 = ds[0]
    np.testing.assert_array_equal(s["pts_input"], s2["pts_input"])
    ds.epoch = 1
    s3 = ds[0]
    assert not np.array_equal(s["pts_input"], s3["pts_input"])


def test_batch_loader_padding(synth_root):
    c = _cfg()
    ds = KittiRCNNDataset(root_dir=synth_root, npoints=1024, split="train",
                          mode="TRAIN", cfg=c)
    loader = BatchLoader(ds, batch_size=4, shuffle=False)
    batches = list(loader)
    assert all(b["pts_input"].shape[0] == 4 for b in batches)
    # final short batch is padded with batch_valid=False rows
    last = batches[-1]
    assert last["batch_valid"].dtype == bool
    total_valid = sum(int(b["batch_valid"].sum()) for b in batches)
    assert total_valid == len(ds)



def test_batch_loader_process_mode_matches_thread(synth_root):
    """Fork-based process workers produce the same batches as thread workers
    (same deterministic per-(seed, epoch, index) samples), across epochs."""
    c = _cfg()
    ds = KittiRCNNDataset(root_dir=synth_root, npoints=1024, split="train",
                          mode="TRAIN", cfg=c, seed=11)
    lt = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1)
    lp = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1,
                     worker_mode="process")
    try:
        for epoch in (0, 1):
            lt.set_epoch(epoch)
            lp.set_epoch(epoch)
            bt, bp = list(lt), list(lp)
            assert len(bt) == len(bp)
            for a, b in zip(bt, bp):
                assert sorted(a.keys()) == sorted(b.keys())
                for k in a:
                    if isinstance(a[k], np.ndarray):
                        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
                    else:  # ragged python lists (aug_method)
                        assert a[k] == b[k], k
    finally:
        lp.close()

def test_gt_database_and_aug_scene(synth_root, tmp_path):
    from tpu3d.tools.generate_gt_database import GTDatabaseGenerator

    gen = GTDatabaseGenerator(root_dir=synth_root, split="train")
    db_file = gen.generate_gt_database(str(tmp_path), "train")
    import pickle

    with open(db_file, "rb") as f:
        db = pickle.load(f)
    assert len(db) > 0
    entry = db[0]
    assert set(entry) >= {"sample_id", "cls_type", "gt_box3d", "points",
                          "intensity", "obj"}
    assert entry["points"].shape[1] == 3
    assert len(entry["points"]) > 10  # synthetic cars are dense

    # gt-aug in the dataset consumes the database
    c = _cfg()
    c.GT_AUG_ENABLED = True
    c.GT_AUG_APPLY_PROB = 1.0
    c.GT_AUG_RAND_NUM = False
    c.GT_EXTRA_NUM = 5
    c.GT_AUG_HARD_RATIO = 0.0
    ds = KittiRCNNDataset(root_dir=synth_root, npoints=1024, split="train",
                          mode="TRAIN", cfg=c, gt_database_dir=db_file)
    s = ds[0]
    n_gt = int((np.abs(s["gt_boxes3d"]).sum(axis=1) > 0).sum())
    assert n_gt >= 2  # original cars (pasting may add more)

    # aug-scene generator writes the offline layout
    from tpu3d.tools.generate_aug_scene import AugSceneGenerator

    aug = AugSceneGenerator(root_dir=synth_root, gt_database=db,
                            split="train")
    out_dir = tmp_path / "aug_scene"
    split_file = aug.generate_aug_scene(str(out_dir), aug_times=1)
    ids = [x for x in open(split_file).read().split() if x]
    assert any(int(x) >= 400000 for x in ids)
    big_id = next(x for x in ids if int(x) >= 400000)
    assert (out_dir / "rectified_data" / f"{big_id}.bin").exists()
    assert (out_dir / "aug_label" / f"{big_id}.txt").exists()


def test_lr_and_momentum_schedules():
    from tpu3d.parallel import make_lr_schedule, make_momentum_schedule

    c = fresh_cfg()
    c.TRAIN.OPTIMIZER = "adam_onecycle"
    c.TRAIN.LR = 0.002
    c.TRAIN.DIV_FACTOR = 10.0
    c.TRAIN.PCT_START = 0.4
    sched = make_lr_schedule(c, steps_per_epoch=10, total_epochs=10)
    assert float(sched(0)) == pytest.approx(0.0002, rel=1e-3)
    assert float(sched(40)) == pytest.approx(0.002, rel=1e-3)
    assert float(sched(99)) < 1e-5
    mom = make_momentum_schedule(c, 10, 10)
    assert float(mom(0)) == pytest.approx(0.95, abs=1e-3)
    assert float(mom(40)) == pytest.approx(0.85, abs=1e-3)
    assert float(mom(99)) == pytest.approx(0.95, abs=5e-3)
    # step-decay mode
    c2 = fresh_cfg()
    c2.TRAIN.OPTIMIZER = "adam"
    c2.TRAIN.DECAY_STEP_LIST = [2, 4]
    sched2 = make_lr_schedule(c2, steps_per_epoch=10, total_epochs=10)
    assert float(sched2(0)) == pytest.approx(0.002)
    assert float(sched2(25)) == pytest.approx(0.001)
    assert float(sched2(45)) == pytest.approx(0.0005)


def test_checkpoint_roundtrip_and_partial(tmp_path):
    import jax

    from tpu3d.models import PointRCNN
    from tpu3d.parallel import create_train_state
    from tpu3d.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                        load_part_ckpt, save_checkpoint)
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_model import small_cfg, _pts

    rng = np.random.default_rng(0)
    c = small_cfg()
    model = PointRCNN(cfg=c, mode="TRAIN")
    pts = _pts(rng, 1, c.RPN.NUM_POINTS)
    state = create_train_state(c, model, {"pts_input": pts},
                               jax.random.PRNGKey(0), 2, 2)
    path = save_checkpoint(str(tmp_path), state, epoch=7)
    assert latest_checkpoint(str(tmp_path)) == path
    state2 = create_train_state(c, model, {"pts_input": pts},
                                jax.random.PRNGKey(1), 2, 2)
    restored, epoch = load_checkpoint(path, state2)
    assert epoch == 7
    leaf_a = jax.tree_util.tree_leaves(state.params)[0]
    leaf_b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))

    # partial load into a DIFFERENT architecture (rcnn heads added): only
    # matching rpn subtrees graft
    c2 = small_cfg(rcnn=True)
    model2 = PointRCNN(cfg=c2, mode="TRAIN")
    gt = np.zeros((1, 3, 7), np.float32)
    gt[:, 0] = [0, 1.6, 20, 1.5, 1.6, 3.9, 0.3]
    state3 = create_train_state(
        c2, model2, {"pts_input": pts, "gt_boxes3d": gt},
        jax.random.PRNGKey(2), 2, 2)
    merged = load_part_ckpt(path, state3)
    a = np.asarray(jax.tree_util.tree_leaves(
        {"rpn": merged.params["rpn"]})[0])
    b = np.asarray(jax.tree_util.tree_leaves(
        {"rpn": state.params["rpn"]})[0])
    np.testing.assert_array_equal(a, b)
    # rcnn params untouched
    r_new = jax.tree_util.tree_leaves({"rcnn_net": merged.params["rcnn_net"]})
    r_old = jax.tree_util.tree_leaves({"rcnn_net": state3.params["rcnn_net"]})
    np.testing.assert_array_equal(np.asarray(r_new[0]), np.asarray(r_old[0]))


def test_checkpoint_opt_state_structure_fallback(tmp_path):
    """A checkpoint whose optimizer-state structure no longer matches the
    current optax chain (e.g. the round-4 removal of the weight-decay mask)
    must still restore params/batch_stats/step, re-initializing opt_state
    with a warning."""
    import warnings as _warnings

    import jax
    import optax

    from tpu3d.models import PointRCNN
    from tpu3d.parallel import create_train_state
    from tpu3d.parallel.train_state import _wd_mask
    from tpu3d.utils.checkpoint import load_checkpoint, save_checkpoint
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_model import small_cfg, _pts

    rng = np.random.default_rng(0)
    c = small_cfg()
    model = PointRCNN(cfg=c, mode="TRAIN")
    pts = _pts(rng, 1, c.RPN.NUM_POINTS)
    state = create_train_state(c, model, {"pts_input": pts},
                               jax.random.PRNGKey(0), 2, 2)
    # legacy structure: masked weight decay wraps the adam state
    legacy_tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-3, mask=_wd_mask(state.params)))
    legacy = state.replace(tx=legacy_tx,
                           opt_state=legacy_tx.init(state.params))
    path = save_checkpoint(str(tmp_path), legacy, epoch=3)

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        restored, epoch = load_checkpoint(path, state)
    assert epoch == 3
    assert any("optimizer-state structure" in str(w.message) for w in caught)
    leaf_a = jax.tree_util.tree_leaves(legacy.params)[0]
    leaf_b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))


def test_config_yaml_and_overrides(tmp_path):
    from tpu3d.config import cfg_from_file, cfg_from_list, fresh_cfg

    c = fresh_cfg()
    yaml_file = tmp_path / "t.yaml"
    yaml_file.write_text("CLASSES: Cyclist\nRPN:\n    NUM_POINTS: 2048\n")
    cfg_from_file(str(yaml_file), target=c)
    assert c.CLASSES == "Cyclist" and c.RPN.NUM_POINTS == 2048
    cfg_from_list(["TRAIN.LR", "0.01", "RPN.NMS_TYPE", "rotate"], target=c)
    assert c.TRAIN.LR == 0.01 and c.RPN.NMS_TYPE == "rotate"
    with pytest.raises(KeyError):
        yaml_file.write_text("NOT_A_KEY: 1\n")
        cfg_from_file(str(yaml_file), target=c)


def test_batch_inference_dry_run(capsys):
    """batch_inference generates the 5x5 matrix eval commands (dry run)
    (reference: pointrcnn/tools/batch_inference.py gen_cmd/gen_commands)."""
    from tpu3d.tools import batch_inference as bi

    bi.main(["--models", "kitti=ck/kitti.msgpack", "waymo=ck/waymo.msgpack",
             "--datasets", "kitti", "nusc", "argo",
             "--far_points", "4000", "8000", "--dry_run"])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2 * 3 * 2  # models x datasets x far_points
    assert all("eval_rcnn" in line and "--eval_mode rcnn" in line
               for line in out)
    assert any("multi_data/argo" in line and "--dataset argo" in line
               for line in out)
    # one2one pairs models with datasets instead of the full product
    bi.main(["--models", "kitti=a", "waymo=b", "--datasets", "kitti", "waymo",
             "--one2one", "--far_points", "4000", "--dry_run"])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2


def test_multiclass_dataset_and_classes(tmp_path):
    """Synthetic scenes with Pedestrian/Cyclist objects exercise the
    reference's default_cyclist / default_people class configurations
    (reference: lib/datasets/kitti_rcnn_dataset.py class filtering)."""
    root = str(tmp_path / "mc")
    create_synthetic_kitti(root, n_frames=4, seed=5, image_files=True,
                           extra_classes=("Pedestrian", "Cyclist"))
    from tpu3d.kitti import read_label

    label_dir = os.path.join(root, "KITTI", "object", "training", "label_2")
    all_classes = {o.cls_type for f in sorted(os.listdir(label_dir))
                   for o in read_label(os.path.join(label_dir, f))}
    assert {"Car", "Pedestrian", "Cyclist"} <= all_classes

    c = _cfg()
    for classes, wanted in [("Cyclist", {"Cyclist"}),
                            ("People", {"Pedestrian", "Cyclist"}),
                            ("Car", {"Car", "Van"})]:
        c.CLASSES = classes
        ds = KittiRCNNDataset(root_dir=root, npoints=1024, split="train",
                              mode="TRAIN", cfg=c, classes=classes)
        assert len(ds) > 0, classes
        s = ds[0]
        # every gt box in the sample belongs to the selected class set
        gt = s["gt_boxes3d"]
        gt = gt[np.abs(gt).sum(axis=1) > 0]
        assert len(gt) >= 1, classes
        # per-point fg labels exist for the class's objects
        assert (s["rpn_cls_label"] == 1).sum() > 0, classes


def test_multiclass_train_step(tmp_path):
    """One joint train step with CLASSES=Cyclist runs end to end on the
    multi-class synthetic data (tiny model)."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(__file__))
    from test_model import small_cfg

    from tpu3d.models import PointRCNN
    from tpu3d.parallel import create_train_state, make_train_step

    root = str(tmp_path / "mc2")
    create_synthetic_kitti(root, n_frames=2, seed=6, image_files=True,
                           extra_classes=("Cyclist",))
    c = small_cfg(rcnn=True)
    c.GT_AUG_ENABLED = False
    c.CLASSES = "Cyclist"
    ds = KittiRCNNDataset(root_dir=root, npoints=c.RPN.NUM_POINTS,
                          split="train", mode="TRAIN", cfg=c,
                          classes="Cyclist")
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    model = PointRCNN(cfg=c, mode="TRAIN")
    state = create_train_state(
        c, model, {"pts_input": batch["pts_input"][:1],
                   "gt_boxes3d": jnp.asarray(batch["gt_boxes3d"][:1])},
        jax.random.PRNGKey(0), 1, 1)
    step = jax.jit(make_train_step(c, model))
    _, tb = step(state, {k: jnp.asarray(v) for k, v in batch.items()
                         if k != "sample_id" and hasattr(v, "shape")},
                 jax.random.PRNGKey(1), jnp.float32(0.9))
    assert np.isfinite(float(tb["loss"]))
