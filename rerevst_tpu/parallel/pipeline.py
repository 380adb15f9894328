"""Frame-parallel stylization (Pass 2 across chips).

Pass 2 is embarrassingly parallel over frames once the sequence statistics
are frozen: shard the frame batch, replicate params/style/stats, and let XLA
partition the whole encoder+decoder — zero collectives in the hot loop.
"""

from __future__ import annotations

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


def stylize_frames_sharded(params, frames, style: StyleFeatures,
                           stats: SeqStats, cfg: ModelConfig, mesh: Mesh):
    """Stylize a frame batch with the batch axis sharded over `mesh`.

    `frames` [N,H,W,3] normalized RGB; returns [N,H,W,3].  N is padded to a
    device multiple internally and cropped back.
    """
    ndev = mesh.devices.size
    n = frames.shape[0]
    frames, _ = pad_to_multiple(frames, ndev, axis=0)

    @jax.jit
    def run(params, frames, style, stats):
        f = encode_content(params, frames, cfg, desaturate=True)
        return decode_global(params["decoder"], f, style, stats, cfg)

    frames = jax.device_put(frames, sharded_batch(mesh))
    params, style, stats = jax.device_put((params, style, stats),
                                          replicated(mesh))
    out = run(params, frames, style, stats)
    return out[:n]
