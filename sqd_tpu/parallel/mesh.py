# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Device-mesh helpers for sharded SQD execution."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["default_mesh", "batch_sharding"]


def default_mesh(axis_name: str = "batch", devices=None) -> Mesh:
    """A 1-D mesh over all local devices (the batch fan-out axis)."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "batch"):
    """NamedSharding that splits the leading (batch) axis across the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(axis_name))
