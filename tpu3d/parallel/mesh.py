"""Device mesh + sharding helpers — the framework's scaling substrate.

The reference's only multi-device path is single-process nn.DataParallel
(tools/train_rcnn.py:206-208). TPU-native replacement: a jax.sharding.Mesh over
the slice with a 'data' axis; batches are sharded on axis 0, parameters/optimizer
state replicated, and XLA inserts the gradient all-reduce over ICI
(SURVEY.md §2.6). The same helpers serve 1-chip, v5e-8, or multi-host slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data",
              batch_size: int | None = None) -> Mesh:
    """Data-parallel mesh over the slice. When ``batch_size`` is given, use the
    largest device prefix whose count divides it (XLA shards batches evenly;
    an indivisible batch is a hard error, so degrade gracefully instead)."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devices = devices[:n]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host numpy batch onto the mesh, sharded along axis 0."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
