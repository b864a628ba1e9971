"""Device-mesh scaling primitives.

The reference is single-device (SURVEY.md §2.2: its WORLD_SIZE/RANK env
reads are vestigial).  This framework scales the batched pipeline and the
trainers the TPU-native way: a ``jax.sharding.Mesh`` with a ``data`` axis
(batch sharding; params replicated) and an optional ``model`` axis kept for
larger backbones (identity sharding for the deployed ~25M-param CNN — ICI
collectives would cost more than they save at this size).

XLA inserts the cross-device collectives (gradient psum etc.) from the
sharding annotations; nothing here issues explicit collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """1-D (or trailing-identity N-D) mesh over the first ``n_devices``."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names=tuple(axes))


def shard_batch_spec(mesh: Mesh, ndim: int, batch_axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the batch axis, replicate the rest."""
    return NamedSharding(mesh, P(batch_axis, *([None] * (ndim - 1))))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of host arrays with dim-0 sharded over ``data``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard_batch_spec(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated_spec(mesh))
