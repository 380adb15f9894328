"""Intra-frame (spatial) sharded Pass 2 — halo-exchange parallelism.

Batch sharding (``parallel/pipeline.py``) only helps when there are frames
to spread: a batch-1 frame — the live-serving latency point — used ONE chip
however many the mesh had, and a frame too big for one chip's HBM had no
path at all.  This module shards the FRAME: the H axis of the input splits
across the mesh and XLA's SPMD partitioner propagates that sharding through
the whole encoder+decoder, inserting **collective-permute halo exchanges**
at every conv/pool/upsample boundary.

Why this is exact and why GSPMD (not hand-rolled ``shard_map``) is the
right tool: under frozen sequence statistics the Pass-2 graph
(``test/style_network_global.py:441-451``) has no cross-spatial reductions
— every op is H-local — so spatial partitioning needs only
nearest-neighbor row exchanges, a pattern GSPMD was designed for (spatial
partitioning of image models).  Measured on the 8-device mesh: the
compiled module contains ONLY collective-permutes (132 of them; zero
all-gathers/all-reduces), and the sharded pixels are **bit-identical** to
the single-device ones (tests/test_spatial.py).  A hand-written shard_map
mirror of the graph would duplicate every layer's halo bookkeeping for no
additional exactness.

Hybrid batch x spatial: for 1 < B < n_devices the mesh folds to
(B, n/B) and both axes shard — every chip stays busy at any batch size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.transformer import (
    SeqStats,
    StyleFeatures,
    blend_pytrees,
    blend_pytrees_batched,
    decode_global,
    encode_content,
)
from rerevst_tpu.parallel.mesh import mesh_process_count

BATCH_AXIS = "sp_batch"
H_AXIS = "sp_h"


def spatial_ok(batch: int, h: int, mesh: Mesh) -> bool:
    """Whether the spatial (or hybrid batch x spatial) sharding applies:
    single-process mesh, the device count folds over (batch, H rows), and
    every H shard keeps >= 8 rows (one relu4_1 row after the three /2
    pools; thinner shards would leave chips holding zero rows of the
    deepest feature maps)."""
    n = mesh.devices.size
    if n <= 1 or mesh_process_count(mesh) > 1:
        return False
    if batch >= n or n % batch:
        return False
    rows = n // batch
    return h % rows == 0 and (h // rows) >= 8


def _folded_mesh(mesh: Mesh, batch: int) -> Mesh:
    devs = np.asarray(list(mesh.devices.flat))
    return Mesh(devs.reshape(batch, -1), (BATCH_AXIS, H_AXIS))


@functools.lru_cache(maxsize=None)
def _jitted(cfg: ModelConfig, mesh: Mesh, batch: int):
    """One jitted program + shardings per (config, mesh, batch) — cached so
    the hot loop never rebuilds the jit wrapper (a fresh ``jax.jit`` per
    call would retrace/recompile every frame)."""
    if cfg.spatial_tiles > 1:
        # H-tiling (ops/tiling.py) dynamic-slices along the very axis this
        # path shards — each slab read would gather rows across chips.
        # Sharding already bounds the per-chip working set at 1/n, which is
        # the only thing the tiles buy, so drop them here.
        import dataclasses

        cfg = dataclasses.replace(cfg, spatial_tiles=1)
    m = _folded_mesh(mesh, batch)
    xsh = NamedSharding(m, P(BATCH_AXIS, H_AXIS))
    rep = NamedSharding(m, P())

    def run(params, frames, style, stats):
        f = encode_content(params, frames, cfg, desaturate=True)
        return decode_global(params["decoder"], f, style, stats, cfg)

    return (jax.jit(run, in_shardings=(rep, xsh, rep, rep),
                    out_shardings=xsh), xsh, rep)


def spatial_feats_ok(batch: int, fh: int, mesh: Mesh) -> bool:
    """`multistyle_decode_spatial` applicability: like ``spatial_ok`` but
    for a /8-resolution FEATURE map (the multi-style session caches relu4_1
    features, not frames): every H shard keeps >= 2 feature rows."""
    n = mesh.devices.size
    if n <= 1 or mesh_process_count(mesh) > 1:
        return False
    if batch >= n or n % batch:
        return False
    rows = n // batch
    return fh % rows == 0 and (fh // rows) >= 2


@functools.lru_cache(maxsize=None)
def _jitted_multistyle(cfg: ModelConfig, mesh: Mesh, batch: int,
                       batched_weights: bool):
    if cfg.spatial_tiles > 1:
        import dataclasses

        cfg = dataclasses.replace(cfg, spatial_tiles=1)  # see _jitted
    m = _folded_mesh(mesh, batch)
    fsh = NamedSharding(m, P(BATCH_AXIS, H_AXIS))
    rep = NamedSharding(m, P())
    wsh = NamedSharding(m, P(BATCH_AXIS)) if batched_weights else rep
    blend = blend_pytrees_batched if batched_weights else blend_pytrees

    def run(params, feats, styles, stats, weights):
        sf = blend(styles, weights)
        st = blend(stats, weights)
        return decode_global(params["decoder"], feats, sf, st, cfg)

    return (jax.jit(run, in_shardings=(rep, fsh, rep, rep, wsh),
                    out_shardings=fsh), fsh, rep, wsh)


def multistyle_decode_spatial(params, feats, styles, stats, weights,
                              cfg: ModelConfig, mesh: Mesh):
    """Multi-style blended decode with the FEATURE map's H axis (and, for
    B > 1, the batch) sharded over `mesh` — the multi-style analog of
    ``stylize_spatial_sharded`` (the session caches relu4_1 features and
    decodes them per weight row, ``multistyle.py``).  `weights`: [S] scalars
    (one blend for the whole batch) or a [B, S] array (per-frame blends —
    sharded with the batch).  Call only when ``spatial_feats_ok``."""
    w = jnp.asarray(weights, jnp.float32)
    batched = w.ndim == 2
    run, fsh, rep, wsh = _jitted_multistyle(cfg, mesh, feats.shape[0],
                                            batched)
    feats = jax.device_put(feats, fsh)
    params, styles, stats = jax.device_put((params, styles, stats), rep)
    w = jax.device_put(w if batched else list(np.asarray(weights)), wsh)
    return run(params, feats, styles, stats, w)


def stylize_spatial_sharded(params, frames, style: StyleFeatures,
                            stats: SeqStats, cfg: ModelConfig, mesh: Mesh):
    """Stylize `frames` [B,H,W,3] with H (and, for B > 1, the batch too)
    sharded over `mesh`; params/style/stats replicate.  Returns the styled
    batch, sharded the same way (slice/fetch as usual — XLA gathers rows on
    demand).  Call only when ``spatial_ok(B, H, mesh)``.
    """
    run, xsh, rep = _jitted(cfg, mesh, frames.shape[0])
    frames = jax.device_put(frames, xsh)
    params, style, stats = jax.device_put((params, style, stats), rep)
    return run(params, frames, style, stats)
