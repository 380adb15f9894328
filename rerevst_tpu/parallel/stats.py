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
    from rerevst_tpu.parallel.mesh import lift_local, mesh_process_count

    if mesh_process_count(mesh) > 1:
        # Multi-host: `feats` is this process's LOCAL shard; lift_local
        # pads it locally and masks the padding out of every reduction.
        # Run jitted so execution is a single SPMD program.
        feats_g, mask_g = lift_local(mesh, feats, pad=True)
        return jax.jit(fn)(params_dec, feats_g, mask_g, style)

    feats, mask = pad_to_multiple(feats, ndev, axis=0)
    return fn(params_dec, feats, mask, style)
