"""Separable blurs (NHWC, depthwise).

* ``gaussian_blur`` — kornia ``GaussianBlur2d((101,101),(50.5,50.5))``
  equivalent used to smooth the relaxed-style flow
  (``train/style_networks.py:469,551``).  Kornia default border is
  'reflect' (REFLECT_101) and the 1-D kernel is
  exp(-(x - ksize//2)^2 / (2 sigma^2)) normalized to sum 1.
* ``box_blur`` — ``cv2.blur(ksize)`` equivalent used by fake-flow generation
  (``train/loss_networks.py:80``); OpenCV anchors even kernels at
  ksize//2, so padding is asymmetric (left=k//2, right=k-1-k//2), border
  REFLECT_101.

Both are two 1-D depthwise convolutions; XLA maps them onto the conv path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - ksize // 2
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _depthwise_1d(x, kernel_1d, axis: int, pad_lo: int, pad_hi: int,
                  border: str = "reflect"):
    """Convolve NHWC along one spatial axis with a shared 1-D kernel."""
    n, h, w, c = x.shape
    k = kernel_1d.shape[0]
    pads = [(0, 0)] * 4
    pads[axis] = (pad_lo, pad_hi)
    xp = jnp.pad(x, pads, mode=border)
    if axis == 1:
        kshape = (k, 1, 1, 1)
        window = "HWIO"
    else:
        kshape = (1, k, 1, 1)
        window = "HWIO"
    kern = jnp.asarray(kernel_1d, x.dtype).reshape(kshape)
    kern = jnp.broadcast_to(kern, kshape[:2] + (1, c)).reshape(
        kshape[0], kshape[1], 1, c
    )
    # HIGHEST: the surrounding losses need fp32 accumulation; the default
    # matmul/conv precision on TPU-targeting builds is bf16.
    return lax.conv_general_dilated(
        xp, kern,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", window, "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def gaussian_blur(x, ksize: int = 101, sigma: float = 50.5):
    """Depthwise Gaussian blur with REFLECT_101 border (kornia-compatible)."""
    k = gaussian_kernel_1d(ksize, sigma)
    pad = ksize // 2
    x = _depthwise_1d(x, k, axis=1, pad_lo=pad, pad_hi=ksize - 1 - pad)
    x = _depthwise_1d(x, k, axis=2, pad_lo=pad, pad_hi=ksize - 1 - pad)
    return x


def box_blur(x, ksize: int = 100):
    """Depthwise box blur with REFLECT_101 border (cv2.blur-compatible)."""
    k = np.full(ksize, 1.0 / ksize, dtype=np.float32)
    anchor = ksize // 2
    x = _depthwise_1d(x, k, axis=1, pad_lo=anchor, pad_hi=ksize - 1 - anchor)
    x = _depthwise_1d(x, k, axis=2, pad_lo=anchor, pad_hi=ksize - 1 - anchor)
    return x
