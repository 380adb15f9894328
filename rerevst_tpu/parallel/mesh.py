"""Device mesh + sharding helpers.

The reference has no distributed layer at all (single GPU pinned via
CUDA_VISIBLE_DEVICES, ``train/train.py:166-168``); this module supplies the
TPU-native one.  The workload is frame/batch-parallel, so the canonical mesh
is one 'data' axis over all chips; collectives ride ICI via
``psum/pmin/pmax`` inside ``shard_map``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def frame_mesh(n_devices: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over (the first n) local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def sharded_batch(mesh: Mesh) -> NamedSharding:
    """Leading (frame/batch) axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x, mult: int, axis: int = 0):
    """Pad `x` along `axis` (repeating the last slice) to a multiple of
    `mult`; returns (padded, valid_mask [padded_len])."""
    import jax.numpy as jnp

    n = x.shape[axis]
    pad = (-n) % mult
    mask = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    if pad:
        last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        reps = jnp.concatenate([last] * pad, axis=axis)
        x = jnp.concatenate([x, reps], axis=axis)
    return x, mask
