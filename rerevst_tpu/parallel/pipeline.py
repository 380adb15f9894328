"""Frame-parallel stylization (Pass 2 across chips).

Pass 2 is embarrassingly parallel over frames once the sequence statistics
are frozen: shard the frame batch, replicate params/style/stats, and let XLA
partition the whole encoder+decoder — zero collectives in the hot loop.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.transformer import (
    SeqStats,
    StyleFeatures,
    decode_global,
    encode_content,
)
from rerevst_tpu.parallel.mesh import pad_to_multiple, replicated, sharded_batch


@functools.lru_cache(maxsize=None)
def _run_fn(cfg: ModelConfig):
    # One jitted program per model config — reused across every call so the
    # hot loop never retraces (ModelConfig is a frozen, hashable dataclass).
    @jax.jit
    def run(params, frames, style, stats):
        f = encode_content(params, frames, cfg, desaturate=True)
        return decode_global(params["decoder"], f, style, stats, cfg)

    return run


def stylize_frames_sharded(params, frames, style: StyleFeatures,
                           stats: SeqStats, cfg: ModelConfig, mesh: Mesh):
    """Stylize a frame batch with the batch axis sharded over `mesh`.

    `frames` [N,H,W,3] normalized RGB; returns [N,H,W,3].  N is padded to a
    device multiple internally and cropped back.  device_put is a no-op for
    operands already laid out correctly, so repeated calls only move the new
    frame batch.
    """
    from rerevst_tpu.parallel.mesh import lift_local, mesh_process_count

    if mesh_process_count(mesh) > 1:
        # Multi-host: `frames` is this process's LOCAL shard; each process
        # must feed a local-device multiple (lift_local raises otherwise —
        # padding styled OUTPUT frames, unlike statistics, can't be masked
        # away).  The jitted program follows the global array's batch
        # sharding, params/style/stats replicate.
        frames_g = lift_local(mesh, frames, what="Pass 2 frame batch")
        # Returns the GLOBAL batch-sharded array; read your process's part
        # via .addressable_shards (fetching the whole array cross-host is
        # exactly the transfer this layout avoids).
        return _run_fn(cfg)(params, frames_g, style, stats)

    ndev = mesh.devices.size
    n = frames.shape[0]
    frames, _ = pad_to_multiple(frames, ndev, axis=0)

    frames = jax.device_put(frames, sharded_batch(mesh))
    params, style, stats = jax.device_put((params, style, stats),
                                          replicated(mesh))
    out = _run_fn(cfg)(params, frames, style, stats)
    return out[:n]
