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


def distributed_init(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Multi-process (multi-host) runtime init.

    After this, ``jax.devices()`` is the GLOBAL device list and
    ``frame_mesh()`` spans every host: collectives ride ICI within a host's
    slice and DCN across hosts, with each process feeding only its local
    input shard (``local_batch_to_global``) — the multi-host input-pipeline
    design SURVEY §5 calls for.  On the CPU backend (tests / dry runs) the
    cross-process collectives use gloo.

    No-op for ``num_processes <= 1``.
    """
    if num_processes <= 1:
        return
    try:
        # Only affects the CPU backend; required for cross-process CPU
        # collectives in tests/dryruns, ignored by TPU.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jax without the option
        pass
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)


def frame_mesh(n_devices: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over (the first n) devices.

    After ``distributed_init`` the default device list is global, so the
    mesh spans all hosts."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def mesh_process_count(mesh: Mesh) -> int:
    """Number of distinct processes owning this mesh's devices."""
    return len({d.process_index for d in mesh.devices.flat})


def local_device_count_in(mesh: Mesh) -> int:
    """This process's device count within `mesh`."""
    me = jax.process_index()
    return sum(1 for d in mesh.devices.flat if d.process_index == me)


def local_batch_to_global(mesh: Mesh, x, axis_name: str = DATA_AXIS):
    """Per-process LOCAL batch -> one global batch-sharded jax.Array.

    The multi-host input pipeline: every process contributes its own shard
    (shards concatenate in process order along axis 0); no host ever
    materializes the global batch.
    """
    sh = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sh, np.asarray(x))


def lift_local(mesh: Mesh, x, *, pad: bool = False, what: str = "batch"):
    """The multi-host input lift, in one place: this process's LOCAL
    batch-axis array -> the GLOBAL batch-sharded array for `mesh`.

    Call when ``mesh_process_count(mesh) > 1``.  Cross-host padding would
    need eager ops on non-addressable arrays, so padding happens LOCALLY to
    this process's device multiple:

    - ``pad=True``: pad (repeating the last slice) and return
      ``(x_global, mask_global)`` — the mask keeps pad rows out of every
      downstream reduction (inference statistics).
    - ``pad=False``: return ``x_global``, raising ValueError on a
      non-divisible local batch (training, where silent padding would bias
      the pmean'd gradients).
    """
    per = local_device_count_in(mesh)
    if pad:
        x, mask = pad_to_multiple(x, per, axis=0)
        return (local_batch_to_global(mesh, x),
                local_batch_to_global(mesh, mask))
    if x.shape[0] % per:
        raise ValueError(
            f"multi-host {what} must be divisible by this process's "
            f"{per} mesh devices; got {x.shape[0]}")
    return local_batch_to_global(mesh, x)


def sharded_batch(mesh: Mesh) -> NamedSharding:
    """Leading (frame/batch) axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x, mult: int, axis: int = 0):
    """Pad `x` along `axis` (repeating the last slice) to a multiple of
    `mult`; returns (padded, valid_mask [padded_len]).

    numpy in, numpy out (host-side chunk feeds pad BEFORE the single
    sharded device_put, so padding must not bounce through the default
    device); jax arrays stay jax."""
    import numpy as np

    import jax.numpy as jnp

    xp = np if isinstance(x, np.ndarray) else jnp
    n = x.shape[axis]
    pad = (-n) % mult
    mask = xp.concatenate(
        [xp.ones((n,), xp.float32), xp.zeros((pad,), xp.float32)])
    if pad:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(n - 1, n)
        x = xp.concatenate([x] + [x[tuple(idx)]] * pad, axis=axis)
    return x, mask
