"""Resizing ops matching torch ``F.interpolate`` semantics (NHWC).

* ``upsample_nearest_2x`` — decoder upsampling
  (``test/style_network_global.py:113``): exact 2x repeat.
* ``resize_bilinear`` — half-pixel bilinear without antialiasing, the exact
  formula of torch ``F.interpolate(mode='bilinear', align_corners=False)`` and
  of ``cv2.resize(INTER_LINEAR)``; used by the relaxed-style flow upsampling
  (``train/style_networks.py:548``) and fake-flow generation
  (``train/loss_networks.py:77``).

Both are separable gathers — XLA fuses them into the surrounding elementwise
work; the nearest-2x repeat compiles to a broadcast-reshape (no gather).
"""

from __future__ import annotations

import jax.numpy as jnp


def upsample_nearest_2x(x):
    """NHWC nearest-neighbor 2x upsample (exact repeat)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def _linear_weights(out_size: int, in_size: int):
    """Source indices and weights for 1-D half-pixel linear interpolation."""
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    frac = src - i0
    return i0, i1, frac


def resize_bilinear(x, out_h: int, out_w: int):
    """Resize NHWC to (out_h, out_w), torch bilinear/align_corners=False."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    i0, i1, fy = _linear_weights(out_h, h)
    rows0 = jnp.take(xf, i0, axis=1)
    rows1 = jnp.take(xf, i1, axis=1)
    xf = rows0 + (rows1 - rows0) * fy[None, :, None, None]

    j0, j1, fx = _linear_weights(out_w, w)
    cols0 = jnp.take(xf, j0, axis=2)
    cols1 = jnp.take(xf, j1, axis=2)
    out = cols0 + (cols1 - cols0) * fx[None, None, :, None]
    return out.astype(dtype)
