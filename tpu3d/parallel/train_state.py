"""Training state, optimizer (adam / adam_onecycle), and jitted train/eval steps.

Replaces the reference's fastai OptimWrapper + OneCycle stack
(tools/train_utils/{fastai_optim.py,learning_schedules_fastai.py}) with optax:
- 'adam_onecycle': cosine one-cycle LR (peak cfg.TRAIN.LR, div_factor, pct_start,
  final 1e4 further down — the fastai phases) with the b1-momentum counter-cycle
  (MOMS high->low->high), true weight decay on non-BN/bias kernels only;
- 'adam': step-decay LR over DECAY_STEP_LIST with optional linear warmup;
- global-norm gradient clipping (cfg.TRAIN.GRAD_NORM_CLIP, train_utils.py:136);
- BN momentum schedule (BNMomentumScheduler parity) as a traced scalar.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.train_functions import generate_rpn_labels_device, model_loss


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: Any = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=batch_stats,
                            opt_state=new_opt_state)


def _wd_mask(params):
    """(Unused by the default optimizer — kept for A/B studies.) Kernel-only
    weight-decay mask. The reference's OptimWrapper is created with
    bn_wd=True (train_rcnn.py:115), so its true weight decay multiplies
    EVERY parameter group — kernels, biases, and BN scale/bias alike — by
    (1 - wd*lr) each step (fastai_optim.py:133-147); make_optimizer
    therefore applies adamw's decoupled decay unmasked."""
    def mask_leaf(path, _):
        return path[-1].key == "kernel"

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_lr_schedule(cfg, steps_per_epoch: int, total_epochs: int):
    train = cfg.TRAIN
    total_steps = max(1, steps_per_epoch * total_epochs)
    if train.OPTIMIZER == "adam_onecycle":
        # optax's onecycle divides by the warmup/decay interval lengths
        # int(ts·pct) and ts − int(ts·pct); at tiny step counts (smoke runs)
        # either can round to zero and the whole schedule turns NaN
        # clamp: pct 0 or 1 would make one phase empty at ANY step count and
        # the widening loop below would never terminate
        pct = min(max(float(train.PCT_START), 0.01), 0.99)
        while (int(total_steps * pct) < 1
               or total_steps - int(total_steps * pct) < 1):
            total_steps += 1
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=train.LR,
            pct_start=pct, div_factor=train.DIV_FACTOR,
            final_div_factor=1e4)
    # step decay (+ optional warmup), reference: train_rcnn.py lr_lbmd/CosineWarmupLR
    boundaries = {e * steps_per_epoch: train.LR_DECAY
                  for e in train.DECAY_STEP_LIST}
    base = optax.piecewise_constant_schedule(train.LR, boundaries)

    def sched(step):
        lr = jnp.maximum(base(step), train.LR_CLIP)
        if train.LR_WARMUP and train.WARMUP_EPOCH > 0:
            warm_steps = train.WARMUP_EPOCH * steps_per_epoch
            frac = jnp.clip(step / max(warm_steps, 1), 0.0, 1.0)
            warm_lr = train.WARMUP_MIN + (train.LR - train.WARMUP_MIN) * frac
            lr = jnp.where(step < warm_steps, warm_lr, lr)
        return lr

    return sched


def make_momentum_schedule(cfg, steps_per_epoch: int, total_epochs: int):
    """fastai one-cycle momentum: MOMS[0] -> MOMS[1] -> MOMS[0] cosine."""
    train = cfg.TRAIN
    if train.OPTIMIZER != "adam_onecycle":
        return lambda step: train.MOMENTUM
    total_steps = max(1, steps_per_epoch * total_epochs)
    up = int(total_steps * train.PCT_START)
    hi, lo = train.MOMS

    def sched(step):
        phase1 = 0.5 * (hi - lo) * (1 + jnp.cos(jnp.pi * step / max(up, 1))) + lo
        t = (step - up) / max(total_steps - up, 1)
        phase2 = 0.5 * (hi - lo) * (1 - jnp.cos(jnp.pi * t)) + lo
        return jnp.where(step < up, phase1, phase2)

    return sched


def make_optimizer(cfg, steps_per_epoch: int, total_epochs: int,
                   params=None) -> optax.GradientTransformation:
    """Mirrors the reference's create_optimizer (train_rcnn.py:96-116)
    branch by branch. ``params`` is unused (kept for signature stability;
    the old kernel-masked decay needed it — see _wd_mask)."""
    train = cfg.TRAIN
    lr = make_lr_schedule(cfg, steps_per_epoch, total_epochs)
    wd = float(train.WEIGHT_DECAY)
    clip = optax.clip_by_global_norm(train.GRAD_NORM_CLIP)
    if train.OPTIMIZER == "adam_onecycle":
        # b2=0.99: the reference builds this Adam with betas=(0.9, 0.99)
        # (train_rcnn.py:113 optimizer_func); b1 is the scheduled momentum.
        # Decay is DECOUPLED (OptimWrapper true_wd p.mul_(1 - wd*lr)) and
        # unmasked (bn_wd=True decays every group; see _wd_mask). All three
        # pinned by the training-trajectory differential
        # (tests/test_train_trajectory_reference_diff.py).
        mom = make_momentum_schedule(cfg, steps_per_epoch, total_epochs)
        adam = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=mom, b2=0.99, weight_decay=wd)
        return optax.chain(clip, adam)
    # plain torch optimizers: weight decay is L2 folded INTO the gradient
    # (not decoupled), applied after the grad-norm clip, torch default betas
    l2 = [optax.add_decayed_weights(wd)] if wd > 0 else []
    if train.OPTIMIZER == "sgd":
        return optax.chain(clip, *l2,
                           optax.sgd(lr, momentum=float(train.MOMENTUM)))
    if train.OPTIMIZER == "adam":
        return optax.chain(clip, *l2, optax.adam(lr))
    raise NotImplementedError(f"TRAIN.OPTIMIZER={train.OPTIMIZER!r}")


def create_train_state(cfg, model, sample_input, rng, steps_per_epoch: int,
                       total_epochs: int, train: bool = True) -> TrainState:
    p_rng, d_rng, t_rng = jax.random.split(rng, 3)
    # init under jit — eager init would execute the whole forward op-by-op
    init_fn = jax.jit(functools.partial(model.init, train=train))
    variables = init_fn(
        {"params": p_rng, "dropout": d_rng, "target": t_rng}, sample_input)
    tx = make_optimizer(cfg, steps_per_epoch, total_epochs,
                        variables["params"])
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]), tx=tx)


def bn_momentum_at_epoch(cfg, epoch: int) -> float:
    """flax-convention BN momentum following the reference's BNMomentumScheduler
    (train_utils.py:24-45): torch momentum BN_MOMENTUM·BN_DECAY^k (clipped at
    BNM_CLIP), k = #decay steps passed."""
    train = cfg.TRAIN
    k = sum(1 for e in train.BN_DECAY_STEP_LIST if epoch >= e)
    torch_m = max(train.BN_MOMENTUM * train.BN_DECAY ** k, train.BNM_CLIP)
    return 1.0 - torch_m


def make_train_step(cfg, model):
    """Returns train_step(state, batch, rng, bn_momentum) -> (state, metrics)."""

    offline_rcnn = bool(cfg.RCNN.ENABLED and not cfg.RPN.ENABLED)

    def train_step(state, batch, rng, bn_momentum):
        d_rng, t_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        pts = batch["pts_input"]
        if offline_rcnn:
            # (B, R, K, C) loader batches -> the (B·R, K, C) the RCNN head eats
            pts = pts.reshape(-1, pts.shape[-2], pts.shape[-1])
        input_dict = {"pts_input": pts}
        if "gt_boxes3d" in batch:
            input_dict["gt_boxes3d"] = batch["gt_boxes3d"]
        if (cfg.RPN.ENABLED and not cfg.RPN.FIXED
                and "rpn_cls_label" not in batch):
            # loader shipped no host labels (device_rpn_labels mode): derive
            # them on device from the zero-padded gt boxes — ~8 MB/step less
            # host->device traffic at default.yaml batch 16 (see
            # generate_rpn_labels_device)
            cls_l, reg_l = jax.vmap(generate_rpn_labels_device)(
                pts[..., :3], batch["gt_boxes3d"])
            batch = dict(batch, rpn_cls_label=cls_l, rpn_reg_label=reg_l)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                input_dict, train=True, bn_momentum=bn_momentum,
                mutable=["batch_stats"],
                rngs={"dropout": d_rng, "target": t_rng})
            loss, tb = model_loss(cfg, out, batch)
            return loss, (mutated["batch_stats"], tb)

        (loss, (new_bs, tb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        tb["grad_norm"] = optax.global_norm(grads)
        return new_state, tb

    return train_step


def make_eval_step(cfg, model):
    def eval_step(state, batch):
        input_dict = {"pts_input": batch["pts_input"]}
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            input_dict, train=False)
        return out

    return eval_step


def make_eval_loss_step(cfg, model):
    """Validation pass for --train_with_eval (reference:
    train_utils.py:140-168 Trainer.eval_epoch + train_rcnn.py:83): eval-mode
    forward (running BN stats, no dropout), losses from the batch labels, plus
    proposal recall@0.7 when the two-stage path runs. Returns a metrics dict;
    the caller averages over the val loader."""
    from ..models.train_functions import get_rcnn_loss, get_rpn_loss
    from ..ops.rotated_iou import boxes_iou3d

    offline_rcnn = bool(cfg.RCNN.ENABLED and not cfg.RPN.ENABLED)

    def eval_step(state, batch):
        pts = batch["pts_input"]
        if offline_rcnn:
            pts = pts.reshape(-1, pts.shape[-2], pts.shape[-1])
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            {"pts_input": pts}, train=False)
        tb = {}
        loss = jnp.zeros(())
        if cfg.RPN.ENABLED and not cfg.RPN.FIXED:
            rpn_loss, tb_rpn = get_rpn_loss(
                cfg, out["rpn_cls"], out["rpn_reg"],
                batch["rpn_cls_label"], batch["rpn_reg_label"])
            loss = loss + rpn_loss
            tb.update(tb_rpn)
        if offline_rcnn:
            # labels derived from saved-proposal IoU (reference
            # eval_rcnn.py:361-366): fg above CLS_FG, bg below CLS_BG
            gt_iou = batch["gt_iou"].reshape(-1)
            cls_label = jnp.where(
                gt_iou > cfg.RCNN.CLS_FG_THRESH, 1,
                jnp.where(gt_iou < cfg.RCNN.CLS_BG_THRESH, 0, -1))
            cls_label = jnp.where(batch["roi_valid"].reshape(-1), cls_label,
                                  -1)
            ret = dict(out)
            ret["cls_label"] = cls_label
            # real reg loss on fg ROIs (reference eval_epoch runs the full
            # loss): valid ROIs whose matched-gt IoU clears REG_FG_THRESH,
            # targets = the loader's canonical-frame matched gt
            ret["reg_valid_mask"] = (
                (gt_iou > cfg.RCNN.REG_FG_THRESH)
                & batch["roi_valid"].reshape(-1)).astype(jnp.int32)
            ret["roi_boxes3d"] = batch["roi_boxes3d"].reshape(-1, 7)
            ret["gt_of_rois"] = batch["gt_boxes3d_ct"].reshape(-1, 7)
            rcnn_loss, tb_rcnn = get_rcnn_loss(cfg, ret)
            loss = loss + rcnn_loss
            tb.update(tb_rcnn)
        if cfg.RPN.ENABLED and cfg.RCNN.ENABLED and "rois" in out:
            gt = batch["gt_boxes3d"]
            gt_valid = jnp.abs(gt).sum(axis=-1) > 0

            def recall_one(rois, valid, gt_b, gt_v):
                iou = boxes_iou3d(rois, gt_b)  # (M, G)
                iou = jnp.where(valid[:, None], iou, 0.0)
                gt_max = jnp.max(iou, axis=0)
                return jnp.sum((gt_max > 0.7) & gt_v), jnp.sum(gt_v)

            rec, cnt = jax.vmap(recall_one)(
                out["rois"], out["roi_valid"], gt, gt_valid)
            tb["recalled_cnt"] = jnp.sum(rec)
            tb["gt_cnt"] = jnp.sum(cnt)
        tb["loss"] = loss
        return tb

    return eval_step
