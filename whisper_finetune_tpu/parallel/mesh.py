"""Device mesh construction and sharding helpers.

The reference's only parallelism strategy is data-parallel DDP over NCCL
(reference src/whisper_finetune/scripts/finetune.py:694-710, runtime.py:19-48).
The TPU-native equivalent is a 1-D ``data`` mesh over all chips (ICI within a
slice, DCN across slices handled transparently by jax.distributed), with the
train step ``shard_map``-ped over it — gradients are averaged with one
``lax.pmean`` per optimizer step instead of bucketed allreduce hooks.

The mesh is deliberately N-D-ready: ``get_data_mesh`` returns a Mesh whose
single axis can be extended with model axes (tensor/sequence) without
touching the step function signatures.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis_index: int = 0) -> NamedSharding:
    """Shard the given array axis over the data mesh axis."""
    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))
