"""Device mesh and sharding helpers.

The model is ~30-60 M params, so the scaling strategy is pure data
parallelism over ICI: batch sharded on the ``data`` axis, parameters and
optimizer state replicated.  Gradients are combined by XLA's all-reduce —
inserted automatically when the jitted train step's outputs are required
replicated — i.e. psum over ICI replaces the reference's absent NCCL
(the reference is explicitly single-GPU; SURVEY.md §2.8).

The same helpers serve batched multi-chip inference fan-out (shard the
request batch over ``data``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
