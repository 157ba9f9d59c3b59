"""Checkpoint save / load / partial-load.

Reference parity: tools/train_utils/train_utils.py:60-111 — checkpoints carry
{epoch, step, params, batch_stats, opt_state}; ``load_part_ckpt`` grafts only the
parameter subtrees whose paths exist in both (the reference's intersect-state-dict
partial load, used to warm-start the RCNN stage from an RPN checkpoint and for
cross-domain fine-tunes). Serialization is flax msgpack (no torch pickles).
"""

from __future__ import annotations

import os
import re

import warnings

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np


_PRE_KERNEL = re.compile(r"^(mlp_\d+)_pre_kernel$")
_PRE_BIAS = re.compile(r"^(mlp_\d+)_pre_bias$")
_PRE_BN = re.compile(r"^(mlp_\d+)_pre_bn$")
_PRE_REST = re.compile(r"^(mlp_\d+)_rest$")
_LAYER = re.compile(r"^(dense|bn)_(\d+)$")


def migrate_pregroup_params(tree):
    """Rename the pre-round-3 pre-grouped SA parameter layout
    (``mlp_i_pre_kernel`` / ``mlp_i_pre_bn`` / ``mlp_i_rest``) into the
    unified ``mlp_i/dense_j`` + ``mlp_i/bn_j`` tree that both execution
    strategies now share. Applied recursively, so it also fixes the
    mirrored trees inside optimizer state. No-op on current checkpoints."""
    if not isinstance(tree, dict):
        return tree
    out = {}

    def _deep_merge(dst, sub):
        for k, v in sub.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                _deep_merge(dst[k], v)
            else:
                dst[k] = v

    def _merge(name, sub):
        _deep_merge(out.setdefault(name, {}), sub)

    for k, v in tree.items():
        m = _PRE_KERNEL.match(k)
        if m:
            _merge(m.group(1), {"dense_0": {"kernel": v}})
            continue
        m = _PRE_BIAS.match(k)
        if m:
            dst = out.setdefault(m.group(1), {}).setdefault("dense_0", {})
            dst["bias"] = v
            continue
        m = _PRE_BN.match(k)
        if m:
            _merge(m.group(1), {"bn_0": migrate_pregroup_params(v)})
            continue
        m = _PRE_REST.match(k)
        if m and isinstance(v, dict):
            shifted = {}
            for lk, lv in v.items():
                lm = _LAYER.match(lk)
                if lm:
                    shifted[f"{lm.group(1)}_{int(lm.group(2)) + 1}"] = \
                        migrate_pregroup_params(lv)
                else:
                    shifted[lk] = migrate_pregroup_params(lv)
            _merge(m.group(1), shifted)
            continue
        if isinstance(v, dict) and k in out:
            _merge(k, migrate_pregroup_params(v))
        else:
            out[k] = migrate_pregroup_params(v)
    return out


def checkpoint_state(state, epoch: int) -> dict:
    return {
        "epoch": np.int32(epoch),
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }


def save_checkpoint(ckpt_dir: str, state, epoch: int) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"checkpoint_epoch_{epoch}.msgpack")
    payload = flax.serialization.to_bytes(checkpoint_state(state, epoch))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, state):
    """Full restore (params + optimizer + step); returns (state, epoch).

    When the checkpoint's optimizer-state STRUCTURE no longer matches the
    current optimizer (the optax chain changed between releases — e.g. the
    round-4 removal of the weight-decay mask), fall back to restoring
    params/batch_stats/step and keep the freshly-initialized opt_state:
    evaluation and fine-tune warm starts keep working from old checkpoints,
    and a resumed run restarts its Adam moments (reference load_checkpoint
    has the same weak spot — torch load_state_dict on a changed optimizer
    raises; train_utils.py:78-93)."""
    with open(path, "rb") as f:
        payload = f.read()
    template = checkpoint_state(state, 0)
    raw = migrate_pregroup_params(flax.serialization.msgpack_restore(payload))
    try:
        restored = flax.serialization.from_state_dict(template, raw)
        opt_state = restored["opt_state"]
    except ValueError:
        template_no_opt = {k: v for k, v in template.items()
                           if k != "opt_state"}
        raw_no_opt = {k: v for k, v in raw.items() if k != "opt_state"}
        restored = flax.serialization.from_state_dict(template_no_opt,
                                                      raw_no_opt)
        opt_state = state.opt_state
        warnings.warn(
            f"{path}: optimizer-state structure does not match the current "
            "optimizer; restored params/batch_stats/step and re-initialized "
            "the optimizer state")
    state = state.replace(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=opt_state,
    )
    return state, int(restored["epoch"])


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
        return out
    return {prefix: tree}


def _unflatten_into(tree, flat):
    if isinstance(tree, dict):
        return {k: _unflatten_into(v, {p[1:]: x for p, x in flat.items()
                                       if p and p[0] == k})
                for k, v in tree.items()}
    return flat.get((), tree)


def load_part_ckpt(path: str, state, logger=None):
    """Graft matching (path, shape) params/batch_stats from a checkpoint
    (reference: train_utils.py:95-111 load_part_ckpt)."""
    with open(path, "rb") as f:
        payload = f.read()
    raw = migrate_pregroup_params(flax.serialization.msgpack_restore(payload))
    updated = 0
    new_state = {}
    for field in ("params", "batch_stats"):
        current = jax.device_get(getattr(state, field))
        have = _flatten(raw.get(field, {}))
        cur_flat = _flatten(current)
        merged = {}
        for p, v in cur_flat.items():
            if p in have and np.shape(have[p]) == np.shape(v):
                merged[p] = np.asarray(have[p], dtype=np.asarray(v).dtype)
                updated += 1
            else:
                merged[p] = v
        new_state[field] = _unflatten_into(current, merged)
    if logger:
        logger.info(f"load_part_ckpt: grafted {updated} arrays from {path}")
    return state.replace(params=new_state["params"],
                         batch_stats=new_state["batch_stats"])


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_epoch = None, -1
    for fname in os.listdir(ckpt_dir):
        m = re.match(r"checkpoint_epoch_(\d+)\.msgpack$", fname)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(ckpt_dir, fname)
    return best
