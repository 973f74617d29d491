"""Device mesh construction + distributed runtime init.

No reference counterpart (the reference is single-process single-device,
task/Task.py:187-190; SURVEY §2.10/§5.8) — this layer IS the TPU-native
equivalent of a distributed backend: `jax.distributed` over ICI/DCN, one
``Mesh`` per run with a ``data`` axis (batch sharding, dense DP) and an
optional ``model`` axis (embedding-table row sharding).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(**kwargs) -> None:
    """Per-host runtime init for multi-host pods (no-op if single process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:  # already initialized / single host
        logger.debug("jax.distributed.initialize skipped: %s", e)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data=None`` uses every device not consumed by the model axis. With
    ``model=1`` the mesh is pure data-parallel; the model axis shards
    embedding-table rows (SURVEY §5.8 layout: collectives ride ICI).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim split over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
