"""Exact overlap-and-discard spatial tiling of H-local regions.

The sequence-global Pass 2 graph has NO cross-spatial reductions (every
norm uses frozen per-sequence statistics, ``test/style_network_global.py:
43-57``), so any contiguous region of it — convs with SAME zero padding,
pools, nearest-2x upsamples, elementwise — is H-local: output rows depend
only on input rows within the region's receptive field.  That makes
overlap-and-discard tiling EXACT (not approximate): evaluate the region on
overlapping H-slabs and keep only each slab's interior.

Why: the full-resolution stages are the HBM ceiling.  At true 1080p
(2048x1216 padded) the encoder conv1 block and the decoder res2+out tail
each materialize two f16[B,1216,2048,64] temps — 9.5 GB apiece at batch 12,
a compile-time OOM on a 16 GB chip (PERF.md round-4 geometry matrix).
Tiling those regions T ways bounds their working set at 1/T while the rest
of the network (<= half resolution) runs untiled.

Exactness at image boundaries: edge tiles are SHIFTED INWARD to a uniform
slab size, so the first/last slab's outer edge coincides with the true
image edge — the convs' own zero padding there is the correct boundary
behavior, and no fake zero rows are ever treated as content.  At interior
slab edges the zero padding is wrong, but its contamination penetrates at
most the region's receptive field, and the kept interior sits >= `halo`
rows away.  ``tests/test_tiling.py`` asserts tiled == untiled to fp32
tolerance on every geometry case (interior tiles, shifted edge tiles,
up/down scaling regions).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def can_tile_h(h: int, n_tiles: int, halo: int, scale: Tuple[int, int],
               align: int = 1) -> bool:
    """Whether ``tiled_over_h`` is applicable: H divides into `n_tiles`
    aligned tiles big enough to shift edge slabs inward (`th >= 2*halo`
    keeps every kept region >= halo rows from interior slab edges even on
    the shifted edge tiles)."""
    if n_tiles <= 1 or h % n_tiles:
        return False
    th = h // n_tiles
    num, den = scale
    return (th >= 2 * halo and th % align == 0 and halo % align == 0
            and (th * num) % den == 0 and (halo * num) % den == 0)


def tiled_over_h(fn: Callable, x, n_tiles: int, halo: int,
                 scale: Tuple[int, int] = (1, 1)):
    """Evaluate the H-local region `fn` over `n_tiles` overlapping H-slabs.

    `fn`: [B, hs, W, C] -> [B, hs*num/den, W', C'] — any H-local map whose
    output rows scale H by `scale` (e.g. (2, 1) for a 2x-upsampling decoder
    tail, (1, 2) for a pooling encoder head) and whose receptive field along
    H is <= `halo` input rows.  Runs under ``lax.fori_loop`` so XLA sizes
    the region's intermediates per-slab and reuses the buffers across tiles
    (a Python loop would let the scheduler interleave tiles and keep all
    their temps live).

    Slab t covers input rows [clip(t*th - halo, 0, H - slab), +slab) with
    slab = th + 2*halo; the kept output rows are slab-relative
    [(t*th - start) * num/den, + th*num/den).  Requires ``can_tile_h``.
    """
    B, H, W, C = x.shape
    if n_tiles <= 1:
        return fn(x)
    num, den = scale
    th = H // n_tiles
    slab = th + 2 * halo
    assert can_tile_h(H, n_tiles, halo, scale), (H, n_tiles, halo, scale)
    out_th = th * num // den
    oshape = jax.eval_shape(
        fn, jax.ShapeDtypeStruct((B, slab, W, C), x.dtype))
    tail_dims = oshape.shape[2:]
    out = jnp.zeros((B, H * num // den) + tail_dims, oshape.dtype)

    def body(t, out):
        start = jnp.clip(t * th - halo, 0, H - slab)
        xt = lax.dynamic_slice(x, (0, start, 0, 0), (B, slab, W, C))
        yt = fn(xt)
        off = (t * th - start) * num // den
        kept = lax.dynamic_slice(yt, (0, off, 0, 0),
                                 (B, out_th) + tail_dims)
        return lax.dynamic_update_slice(out, kept, (0, t * out_th, 0, 0))

    return lax.fori_loop(0, n_tiles, body, out)
