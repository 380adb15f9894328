"""Moment/extremum reductions used by normalization layers.

Two distinct statistics appear in the reference and must not be conflated:

* ``instance_moments`` — biased variance via mean-of-squares with eps inside
  rsqrt (InstanceNorm, ``train/style_networks.py:122-126`` /
  ``test/style_network_global.py:59-65``).
* ``mean_std`` — *unbiased* variance (torch ``var`` default) with eps added to
  the variance before sqrt (cal_mean_std, ``train/style_networks.py:95-103``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def instance_moments(x, axes, eps: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (mean, rstd) over `axes` with keepdims, InstanceNorm-style.

    rstd = rsqrt(E[(x-mean)^2] + eps) — biased second moment.
    Reductions run in fp32 regardless of input dtype.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axes, keepdims=True)
    rstd = lax.rsqrt(var + eps)
    return mean, rstd


def instance_norm(x, axes=(1, 2), eps: float = 1e-8):
    """Stateless instance norm: (x - mean) * rsqrt(var + eps).

    With axes=(1,2) on NHWC this is per-(sample, channel) normalization over
    H,W — the training-mode InstanceNorm (``train/style_networks.py:113-126``).
    """
    mean, rstd = instance_moments(x, axes, eps)
    return ((x.astype(jnp.float32) - mean) * rstd).astype(x.dtype)


def mean_std(feat, eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(sample, channel) mean/std over spatial dims, torch-var semantics.

    Mirrors cal_mean_std (``train/style_networks.py:95-103``): unbiased
    variance over the flattened H*W axis, eps added to variance, then sqrt.
    Input NHWC; returns two [N, 1, 1, C] arrays (broadcastable).
    """
    n, h, w, c = feat.shape
    xf = feat.astype(jnp.float32)
    m = jnp.mean(xf, (1, 2), keepdims=True)
    # Unbiased: sum of squared deviations / (HW - 1).
    denom = max(h * w - 1, 1)
    var = jnp.sum(jnp.square(xf - m), (1, 2), keepdims=True) / denom
    std = jnp.sqrt(var + eps)
    return m.astype(feat.dtype), std.astype(feat.dtype)


def channel_minmax(x, axes=(0, 1, 2)) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel (min, max) over `axes` of NHWC, keepdims.

    The global InstanceNorm clamps each frame's normalized activations to the
    per-channel extrema observed across all sampled frames
    (``test/style_network_global.py:67-74``).
    """
    xmin = jnp.min(x, axes, keepdims=True)
    xmax = jnp.max(x, axes, keepdims=True)
    return xmin, xmax
