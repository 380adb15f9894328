"""Sharded sequence-statistics collection (Pass 1 across chips).

The reference materializes a concat of all sampled-frame features and runs
the decoder's compute pass over it on one GPU
(``test/style_network_global.py:477-478``) — its long-video fallback spills
per-frame features to disk (``test/style_network.py:540-574``, broken).
Here the frame axis is sharded over the mesh and every norm/extremum/filter
reduction becomes a ``psum``/``pmin``/``pmax`` over ICI: no concat, no disk,
any sequence length.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.transformer import SeqStats, StyleFeatures, collect_stats
from rerevst_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple


def collect_stats_sharded(params_dec, feats, style: StyleFeatures,
                          cfg: ModelConfig, mesh: Mesh) -> SeqStats:
    """collect_stats with the frame axis sharded over `mesh`.

    Exactness: frames that pad the batch up to a device-count multiple are
    masked out of every reduction, so the result matches the single-device
    unpadded collection up to fp reassociation.
    """
    ndev = mesh.shape[DATA_AXIS]

    def local(params_dec, feats_l, mask_l, style):
        reduce_fns = (
            partial(lax.psum, axis_name=DATA_AXIS),
            partial(lax.pmin, axis_name=DATA_AXIS),
            partial(lax.pmax, axis_name=DATA_AXIS),
        )
        return collect_stats(params_dec, feats_l, style, cfg,
                             reduce_fns=reduce_fns, mask=mask_l)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    from rerevst_tpu.parallel.mesh import (
        local_batch_to_global,
        local_device_count_in,
        mesh_process_count,
    )

    if mesh_process_count(mesh) > 1:
        # Multi-host: `feats` is this process's LOCAL shard.  Pad LOCALLY to
        # the per-process device multiple (eager ops on non-addressable
        # global arrays are illegal), lift both to one global array, and run
        # jitted so execution is a single SPMD program; the mask keeps the
        # padding out of every reduction, as in the single-host path.
        per = local_device_count_in(mesh)
        feats_l, mask_l = pad_to_multiple(feats, per, axis=0)
        feats_g = local_batch_to_global(mesh, feats_l)
        mask_g = local_batch_to_global(mesh, mask_l)
        return jax.jit(fn)(params_dec, feats_g, mask_g, style)

    feats, mask = pad_to_multiple(feats, ndev, axis=0)
    return fn(params_dec, feats, mask, style)
