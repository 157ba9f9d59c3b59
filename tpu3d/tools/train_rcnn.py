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
from ..datasets import BatchLoader, KittiRCNNDataset, create_synthetic_kitti
from ..models import PointRCNN
from ..parallel import (
    bn_momentum_at_epoch,
    create_train_state,
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
                        choices=["rpn", "rcnn", "joint"])
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
            create_synthetic_kitti(data_root, n_frames=8, image_files=True)
        args.data_root = data_root
    data_root = args.data_root or os.path.join("multi_data", args.dataset)

    dataset = KittiRCNNDataset(
        root_dir=data_root, npoints=cfg.RPN.NUM_POINTS, split=cfg.TRAIN.SPLIT,
        mode="TRAIN", classes=cfg.CLASSES, cfg=cfg, logger=logger,
        gt_database_dir=args.gt_database, subsample=args.subsample,
        shuffle_subsample=args.shuffle_subsample, seed=args.seed)
    loader = BatchLoader(dataset, args.batch_size, shuffle=True,
                         num_workers=args.workers, drop_last=True,
                         seed=args.seed)
    steps_per_epoch = max(1, len(loader))
    logger.info(f"dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch")

    mesh = make_mesh()
    logger.info(f"mesh: {mesh}")
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    sample = next(iter(loader))
    sample_input = {"pts_input": sample["pts_input"]}
    if "gt_boxes3d" in sample:
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
    tb = create_tb_writer(os.path.join(root, "tensorboard"))
    step_rng = jax.random.PRNGKey(args.seed + 1)

    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        bn_m = bn_momentum_at_epoch(cfg, epoch)
        for it, batch in enumerate(loader):
            batch = shard_batch(mesh, {
                k: v for k, v in batch.items()
                if k in ("pts_input", "gt_boxes3d", "rpn_cls_label",
                         "rpn_reg_label")})
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
    logger.info("**********************End training**********************")
    return state


if __name__ == "__main__":
    main()
