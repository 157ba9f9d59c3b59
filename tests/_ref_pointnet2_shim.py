"""Pure-torch stand-in for the reference's ``pointnet2_utils`` module.

The reference's pointnet2 ops are CUDA extensions
(`/root/reference/pointrcnn/pointnet2_lib/pointnet2/pointnet2_utils.py`
imports ``pointnet2_cuda`` at module load), so the reference backbone can't
execute on CPU as written. This module re-implements the op surface in pure
torch, delegating the pick semantics (FPS start-at-0 argmax chain, ball
query first-hits fill, 3-NN stable ordering) to our host numpy oracles —
the same oracles our jitted TPU ops are differentially tested against in
tests/test_ops.py — so a forward differential against our model compares
the NETWORK math (towers, BN, heads, feature plumbing) under identical
neighbor picks.

Install with ``install(sys.modules)`` BEFORE importing
``pointnet2_lib.pointnet2.pointnet2_modules`` (which does
``import pointnet2_lib.pointnet2.pointnet2_utils``).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

from tpu3d.ops.grouping import ball_query_numpy
from tpu3d.ops.interpolate import three_nn_numpy
from tpu3d.ops.sampling import furthest_point_sample_numpy


def furthest_point_sample(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    return torch.from_numpy(
        furthest_point_sample_numpy(xyz.detach().numpy(), npoint)).int()


def gather_operation(features: torch.Tensor, idx: torch.Tensor):
    """(B, C, N), (B, M) -> (B, C, M)."""
    return torch.gather(
        features, 2,
        idx.long().unsqueeze(1).expand(-1, features.shape[1], -1))


def grouping_operation(features: torch.Tensor, idx: torch.Tensor):
    """(B, C, N), (B, M, S) -> (B, C, M, S)."""
    B, C, N = features.shape
    _, M, S = idx.shape
    flat = idx.reshape(B, 1, M * S).long().expand(-1, C, -1)
    return torch.gather(features, 2, flat).reshape(B, C, M, S)


def three_nn(unknown: torch.Tensor, known: torch.Tensor):
    d, i = three_nn_numpy(unknown.detach().numpy(), known.detach().numpy())
    # keep the caller's float width (f64 gradient differentials)
    return (torch.from_numpy(d.astype(unknown.detach().numpy().dtype)),
            torch.from_numpy(i).int())


def three_interpolate(features: torch.Tensor, idx: torch.Tensor,
                      weight: torch.Tensor):
    """(B, C, m), (B, n, 3), (B, n, 3) -> (B, C, n)."""
    g = grouping_operation(features, idx)  # (B, C, n, 3)
    return torch.sum(g * weight.unsqueeze(1), dim=-1)


def ball_query(radius: float, nsample: int, xyz: torch.Tensor,
               new_xyz: torch.Tensor):
    return torch.from_numpy(ball_query_numpy(
        new_xyz.detach().numpy(), xyz.detach().numpy(), radius, nsample))


class QueryAndGroup(nn.Module):
    """Reference pointnet2_utils.py:231-264 semantics in pure torch."""

    def __init__(self, radius: float, nsample: int, use_xyz: bool = True):
        super().__init__()
        self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz

    def forward(self, xyz, new_xyz, features=None):
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
        grouped_xyz = grouping_operation(
            xyz.transpose(1, 2).contiguous(), idx)
        grouped_xyz = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
        if features is not None:
            grouped = grouping_operation(features, idx)
            return (torch.cat([grouped_xyz, grouped], dim=1)
                    if self.use_xyz else grouped)
        assert self.use_xyz
        return grouped_xyz


class GroupAll(nn.Module):
    """Reference pointnet2_utils.py:267-289."""

    def __init__(self, use_xyz: bool = True):
        super().__init__()
        self.use_xyz = use_xyz

    def forward(self, xyz, new_xyz, features=None):
        grouped_xyz = xyz.transpose(1, 2).unsqueeze(2)
        if features is not None:
            grouped = features.unsqueeze(2)
            return (torch.cat([grouped_xyz, grouped], dim=1)
                    if self.use_xyz else grouped)
        return grouped_xyz


def make_module() -> types.ModuleType:
    mod = types.ModuleType("pointnet2_lib.pointnet2.pointnet2_utils")
    for name in ("furthest_point_sample", "gather_operation",
                 "grouping_operation", "three_nn", "three_interpolate",
                 "ball_query", "QueryAndGroup", "GroupAll"):
        setattr(mod, name, globals()[name])
    return mod


def install(ref_root: str):
    """Register package stubs + the shim so the reference's
    ``pointnet2_modules`` / ``pytorch_utils`` import cleanly from source.
    Returns the names added to sys.modules (for cleanup)."""
    import importlib.util
    import os

    added = []

    def _add(name, mod):
        sys.modules[name] = mod
        added.append(name)

    pkg = types.ModuleType("pointnet2_lib")
    pkg.__path__ = [os.path.join(ref_root, "pointnet2_lib")]
    sub = types.ModuleType("pointnet2_lib.pointnet2")
    sub.__path__ = [os.path.join(ref_root, "pointnet2_lib", "pointnet2")]
    _add("pointnet2_lib", pkg)
    _add("pointnet2_lib.pointnet2", sub)
    _add("pointnet2_lib.pointnet2.pointnet2_utils", make_module())
    for name in ("pytorch_utils", "pointnet2_modules"):
        full = f"pointnet2_lib.pointnet2.{name}"
        spec = importlib.util.spec_from_file_location(
            full, os.path.join(ref_root, "pointnet2_lib", "pointnet2",
                               f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        _add(full, mod)
        spec.loader.exec_module(mod)
    return added
