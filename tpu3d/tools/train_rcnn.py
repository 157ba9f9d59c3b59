"""Training CLI for PointRCNN (rpn / rcnn / joint modes).

Reference parity: pointrcnn/tools/train_rcnn.py — same flags, modes
(rpn: RPN only; rcnn: joint with RPN fixed from a checkpoint; joint: both),
yaml config + --set overrides, run-dir layout with logs/tensorboard/checkpoints.
TPU-native training loop: one jitted train step over a data-parallel mesh,
orbax checkpoints, one-cycle optax schedule, BN momentum schedule.

    python -m tpu3d.tools.train_rcnn --cfg_file configs/default.yaml \
        --train_mode rpn --data_root <root> [--synthetic] [--epochs N]
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil

import jax
import numpy as np

from ..config import cfg, cfg_from_file, cfg_from_list, save_config_to_file
from ..datasets import (BatchLoader, KittiRCNNDataset, create_synthetic_kitti,
                        device_prefetch)
from ..models import PointRCNN
from ..parallel import (
    bn_momentum_at_epoch,
    create_train_state,
    make_eval_loss_step,
    make_mesh,
    make_train_step,
    shard_batch,
)
from ..utils.checkpoint import load_checkpoint, load_part_ckpt, save_checkpoint
from ..utils.logging import create_logger, create_tb_writer


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="train PointRCNN (tpu)")
    parser.add_argument("--cfg_file", type=str, default=None)
    parser.add_argument("--train_mode", type=str, default="rpn",
                        choices=["rpn", "rcnn", "joint", "rcnn_offline"])
    parser.add_argument("--rcnn_training_roi_dir", type=str, default=None,
                        help="saved RPN proposals (KITTI label files) for "
                             "rcnn_offline training")
    parser.add_argument("--rcnn_training_feature_dir", type=str, default=None,
                        help="dumped RPN backbone features for rcnn_offline "
                             "training")
    parser.add_argument("--train_with_eval", action="store_true",
                        help="evaluate loss/recall on the val split during "
                             "training (reference --train_with_eval/eval_epoch)")
    parser.add_argument("--eval_frequency", type=int, default=1,
                        help="epochs between in-training evals")
    parser.add_argument("--rcnn_eval_roi_dir", type=str, default=None,
                        help="saved proposals for the val split "
                             "(rcnn_offline + --train_with_eval)")
    parser.add_argument("--rcnn_eval_feature_dir", type=str, default=None,
                        help="dumped features for the val split "
                             "(rcnn_offline + --train_with_eval)")
    parser.add_argument("--data_root", type=str, default=None,
                        help="dataset root containing KITTI/ (default: "
                             "multi_data/<dataset>)")
    parser.add_argument("--dataset", type=str, default="kitti")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint to resume from")
    parser.add_argument("--rpn_ckpt", type=str, default=None,
                        help="RPN checkpoint for rcnn mode (partial load)")
    parser.add_argument("--gt_database", type=str, default=None)
    parser.add_argument("--ckpt_save_interval", type=int, default=5)
    parser.add_argument("--subsample", type=int, default=-1)
    parser.add_argument("--shuffle_subsample", type=str, default=None)
    parser.add_argument("--seed", type=int, default=19260817)
    parser.add_argument("--device_labels", action="store_true",
                        help="derive RPN cls/reg labels on device inside the "
                             "jitted train step (from gt_boxes3d) instead of "
                             "on host loader workers — cuts host->device "
                             "batch traffic ~4x; exact parity with the host "
                             "path (tests/test_rpn_labels_device.py)")
    parser.add_argument("--synthetic", action="store_true",
                        help="generate and train on a synthetic KITTI dataset")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax profiler trace of steps 10-15 into "
                             "<output_dir>/profile (view with xprof/tensorboard)")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=
                        argparse.REMAINDER, help="set extra config keys")
    return parser.parse_args(argv)


def configure_mode(train_mode: str):
    """Mode toggles (reference: train_rcnn.py:159-172)."""
    if train_mode == "rpn":
        cfg.RPN.ENABLED = True
        cfg.RCNN.ENABLED = False
    elif train_mode == "rcnn":
        cfg.RCNN.ENABLED = True
        cfg.RPN.ENABLED = True
        cfg.RPN.FIXED = True
    elif train_mode == "joint":
        cfg.RPN.ENABLED = cfg.RCNN.ENABLED = True
        cfg.RPN.FIXED = False
    elif train_mode == "rcnn_offline":
        cfg.RCNN.ENABLED = True
        cfg.RPN.ENABLED = False
    else:
        raise ValueError(train_mode)


def main(argv=None):
    import os as _os

    import jax as _jax

    # TPU3D_PLATFORM=cpu forces the CPU backend (the axon plugin
    # overrides JAX_PLATFORMS, so use jax.config)
    if _os.environ.get("TPU3D_PLATFORM"):
        _jax.config.update("jax_platforms",
                           _os.environ["TPU3D_PLATFORM"])
    # persistent XLA compilation cache (first full-model compile is minutes)
    try:
        _cache = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__)))), ".jax_cache")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    args = parse_args(argv)
    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    configure_mode(args.train_mode)
    cfg.TAG = (os.path.splitext(os.path.basename(args.cfg_file))[0]
               if args.cfg_file else "default")

    root = args.output_dir or os.path.join("output", args.train_mode, cfg.TAG)
    os.makedirs(root, exist_ok=True)
    ckpt_dir = os.path.join(root, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = create_logger(os.path.join(root, "log_train.txt"))
    logger.info("**********************Start logging**********************")
    for key, val in vars(args).items():
        logger.info("{:16} {}".format(key, val))
    save_config_to_file(cfg, logger=logger)
    # source snapshot (reference: train_rcnn.py:192-196)
    backup_dir = os.path.join(root, "backup_files")
    os.makedirs(backup_dir, exist_ok=True)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.make_archive(os.path.join(backup_dir, "tpu3d_src"), "zip", pkg_root)

    if args.synthetic:
        data_root = os.path.join(root, "synthetic_data")
        if not os.path.exists(os.path.join(data_root, "KITTI")):
            create_synthetic_kitti(data_root, n_frames=32, image_files=True)
        args.data_root = data_root
    data_root = args.data_root or os.path.join("multi_data", args.dataset)

    if args.train_mode == "rcnn_offline":
        assert args.rcnn_training_roi_dir and args.rcnn_training_feature_dir, \
            "rcnn_offline needs --rcnn_training_roi_dir and " \
            "--rcnn_training_feature_dir (dumped by eval_rcnn --eval_mode rpn " \
            "--save_rpn_feature --save_result)"
    dataset = KittiRCNNDataset(
        root_dir=data_root, npoints=cfg.RPN.NUM_POINTS, split=cfg.TRAIN.SPLIT,
        mode="TRAIN", classes=cfg.CLASSES, cfg=cfg, logger=logger,
        gt_database_dir=args.gt_database, subsample=args.subsample,
        rcnn_training_roi_dir=args.rcnn_training_roi_dir,
        rcnn_training_feature_dir=args.rcnn_training_feature_dir,
        shuffle_subsample=args.shuffle_subsample, seed=args.seed,
        device_rpn_labels=args.device_labels)
    loader = BatchLoader(dataset, args.batch_size, shuffle=True,
                         num_workers=args.workers, drop_last=True,
                         seed=args.seed)
    steps_per_epoch = max(1, len(loader))
    logger.info(f"dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch")

    val_loader = None
    if args.train_with_eval:
        # in-training validation (reference: train_rcnn.py:83-93 test_loader)
        val_dataset = KittiRCNNDataset(
            root_dir=data_root, npoints=cfg.RPN.NUM_POINTS,
            split=cfg.TRAIN.VAL_SPLIT, mode="EVAL", classes=cfg.CLASSES,
            cfg=cfg, logger=logger, seed=args.seed,
            rcnn_eval_roi_dir=args.rcnn_eval_roi_dir,
            rcnn_eval_feature_dir=args.rcnn_eval_feature_dir)
        val_loader = BatchLoader(val_dataset,
                                 min(args.batch_size, len(val_dataset)),
                                 shuffle=False, num_workers=args.workers,
                                 drop_last=True)
        logger.info(f"val dataset: {len(val_dataset)} samples")

    mesh = make_mesh(batch_size=args.batch_size)
    logger.info(f"mesh: {mesh}")
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    sample = next(iter(loader))
    pts = sample["pts_input"]
    if args.train_mode == "rcnn_offline":  # (B, R, K, C) -> (B·R, K, C)
        pts = pts.reshape(-1, pts.shape[-2], pts.shape[-1])
    sample_input = {"pts_input": pts}
    if "gt_boxes3d" in sample and args.train_mode != "rcnn_offline":
        sample_input["gt_boxes3d"] = sample["gt_boxes3d"]
    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(cfg, model, sample_input, rng, steps_per_epoch,
                               args.epochs)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"model parameters: {n_params / 1e6:.2f}M")

    start_epoch = 0
    if args.ckpt:
        state, start_epoch = load_checkpoint(args.ckpt, state)
        logger.info(f"resumed from {args.ckpt} at epoch {start_epoch}")
    elif args.rpn_ckpt:
        state = load_part_ckpt(args.rpn_ckpt, state)
        logger.info(f"partial-loaded RPN weights from {args.rpn_ckpt}")

    train_step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
    eval_loss_step = (jax.jit(make_eval_loss_step(cfg, model))
                      if val_loader is not None else None)
    tb = create_tb_writer(os.path.join(root, "tensorboard"))
    step_rng = jax.random.PRNGKey(args.seed + 1)

    VAL_KEYS = ("pts_input", "gt_boxes3d", "rpn_cls_label", "rpn_reg_label",
                "gt_iou", "roi_valid", "roi_boxes3d", "gt_boxes3d_ct")

    def eval_epoch(state, epoch):
        """Average val metrics over the loader (reference: eval_epoch,
        train_utils.py:140-168)."""
        sums, count = {}, 0
        val_mesh = make_mesh(batch_size=val_loader.batch_size)
        for vbatch in val_loader:
            vb = shard_batch(val_mesh, {k: v for k, v in vbatch.items()
                                        if k in VAL_KEYS})
            metrics = jax.device_get(eval_loss_step(state, vb))
            count += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        out = {k: v / max(count, 1) for k, v in sums.items()}
        if "gt_cnt" in sums and sums["gt_cnt"] > 0:
            out["recall"] = sums["recalled_cnt"] / sums["gt_cnt"]
        logger.info("epoch %d val: %s" % (epoch, " ".join(
            f"{k}={v:.4f}" for k, v in sorted(out.items()))))
        if tb:
            for k, v in out.items():
                tb.add_scalar(f"val/{k}", v, int(state.step))
        return out

    TRAIN_KEYS = ("pts_input", "gt_boxes3d", "rpn_cls_label",
                  "rpn_reg_label", "cls_label", "reg_valid_mask",
                  "gt_boxes3d_ct", "roi_boxes3d")
    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        bn_m = bn_momentum_at_epoch(cfg, epoch)
        # device_prefetch: a staging thread starts each batch's (sharded)
        # host->device transfer while the device runs the previous step
        for it, batch in enumerate(device_prefetch(
                loader, size=2, keys=TRAIN_KEYS,
                put=lambda b: shard_batch(mesh, b))):
            gstep0 = int(state.step)
            if args.profile and gstep0 == 10:
                jax.profiler.start_trace(os.path.join(root, "profile"))
            state, metrics = train_step(state, batch, step_rng, bn_m)
            if args.profile and gstep0 == 15:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s" %
                            os.path.join(root, "profile"))
            if it % 10 == 0:
                loss = float(metrics["loss"])
                logger.info(f"epoch {epoch} it {it}/{steps_per_epoch} "
                            f"loss {loss:.4f}")
                if tb:
                    gstep = int(state.step)
                    for k, v in metrics.items():
                        tb.add_scalar(f"train/{k}", float(v), gstep)
        if (epoch + 1) % args.ckpt_save_interval == 0 or epoch == args.epochs - 1:
            path = save_checkpoint(ckpt_dir, state, epoch + 1)
            logger.info(f"checkpoint saved: {path}")
        if val_loader is not None and epoch % args.eval_frequency == 0:
            eval_epoch(state, epoch)
    logger.info("**********************End training**********************")
    return state


if __name__ == "__main__":
    main()
