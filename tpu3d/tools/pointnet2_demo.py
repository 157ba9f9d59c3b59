"""Standalone PointNet++ foreground-segmentation harness — the ops sanity check.

Reference parity: pointrcnn/pointnet2_lib/tools/train_and_eval.py (+ its mini
dataset/model): trains a small Pointnet2MSG with a per-point segmentation head
and DiceLoss on KITTI-format scenes (or the built-in synthetic generator) and
reports foreground IoU. This exercises every PointNet++ primitive (FPS, ball
query, grouping, three-NN propagation) end-to-end with gradients, independent of
the detector.

    python -m tpu3d.tools.pointnet2_demo --synthetic --epochs 2
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

import flax.linen as nn

from ..datasets import BatchLoader, KittiRCNNDataset, create_synthetic_kitti
from ..config import fresh_cfg
from ..models.losses import dice_loss
from ..models.pointnet2 import Pointnet2MSG, SharedMLP
from ..utils.logging import create_logger


class PointnetSeg(nn.Module):
    """Small MSG backbone + pointwise seg head (reference:
    pointnet2_lib/tools/pointnet2_msg.py)."""

    npoints: tuple = (256, 64, 32, 16)

    @nn.compact
    def __call__(self, pts, train=False):
        xyz, feats = Pointnet2MSG(
            npoints=self.npoints,
            radii=((0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0)),
            nsamples=((16, 32),) * 4,
            sa_mlps=(((8, 8), (8, 8)), ((8, 16), (8, 16)),
                     ((16, 16), (16, 16)), ((16, 32), (16, 32))),
            fp_mlps=((32, 32), (32, 32), (32, 32), (64, 64)),
            bn=True, name="backbone")(pts, train=train)
        h = SharedMLP((32,), bn=True, name="head")(feats, train=train)
        return nn.Dense(1, name="out")(h)[..., 0]  # (B, N) logits


def main(argv=None):
    if os.environ.get("TPU3D_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TPU3D_PLATFORM"])
    parser = argparse.ArgumentParser(description="pointnet2 seg demo")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--output_dir", type=str, default="output/pointnet2_demo")
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--npoints", type=int, default=1024)
    parser.add_argument("--lr", type=float, default=0.002)
    args = parser.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    logger = create_logger(os.path.join(args.output_dir, "log.txt"),
                           name="pointnet2_demo")

    if args.synthetic or args.data_root is None:
        args.data_root = os.path.join(args.output_dir, "synthetic_data")
        if not os.path.exists(os.path.join(args.data_root, "KITTI")):
            create_synthetic_kitti(args.data_root, n_frames=8, image_files=True)

    cfg = fresh_cfg()
    cfg.GT_AUG_ENABLED = False
    cfg.RPN.USE_INTENSITY = False
    cfg.RPN.NUM_POINTS = args.npoints
    train_set = KittiRCNNDataset(root_dir=args.data_root, npoints=args.npoints,
                                 split="train", mode="TRAIN", cfg=cfg,
                                 logger=logger)
    val_set = KittiRCNNDataset(root_dir=args.data_root, npoints=args.npoints,
                               split="val", mode="EVAL", cfg=cfg, logger=logger)
    train_loader = BatchLoader(train_set, args.batch_size, shuffle=True,
                               drop_last=True)
    val_loader = BatchLoader(val_set, args.batch_size)

    model = PointnetSeg()
    sample = next(iter(train_loader))
    variables = jax.jit(functools.partial(model.init, train=True))(
        jax.random.PRNGKey(0), jnp.asarray(sample["pts_input"]))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(params, batch_stats, opt_state, pts, labels):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, pts, train=True,
                mutable=["batch_stats"])
            return dice_loss(logits, labels), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, pts, labels):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             pts, train=False)
        pred = jax.nn.sigmoid(logits) > 0.5
        fg = labels > 0
        inter = jnp.sum(pred & fg)
        union = jnp.sum(pred | fg)
        return inter / jnp.clip(union, 1, None)

    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    for epoch in range(args.epochs):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(batch["pts_input"]),
                jnp.asarray(batch["rpn_cls_label"]))
        logger.info(f"epoch {epoch}: loss {float(loss):.4f}")
        ious = [float(eval_step(params, batch_stats,
                                jnp.asarray(b["pts_input"]),
                                jnp.asarray(b["rpn_cls_label"])))
                for b in val_loader]
        logger.info(f"epoch {epoch}: val fg IoU {np.mean(ious):.4f}")
    return float(np.mean(ious))


if __name__ == "__main__":
    main()
