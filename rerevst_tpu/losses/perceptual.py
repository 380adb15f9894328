"""Perceptual losses: style (mean/std matching), content, total variation.

Mirrors ``train/style_networks.py:503-516`` (style/content) and
``train/train.py:261-265`` (TV).  Note the reference's ``calc_mean_std``
returns *std* (sqrt of unbiased var + eps) despite the local name ``var_x``
— the style loss matches means and **stds**, and we keep that.
"""

from __future__ import annotations

import jax.numpy as jnp

from rerevst_tpu.models.vgg import VggFeatures
from rerevst_tpu.ops.stats import mean_std


def _mse(a, b):
    return jnp.mean(jnp.square(a - b))


def style_loss(feats_x: VggFeatures, feats_style: VggFeatures,
               eps: float = 1e-5):
    """Sum over relu taps of MSE(mean) + MSE(std)
    (``train/style_networks.py:503-512``)."""
    total = 0.0
    for fx, fs in zip(feats_x, feats_style):
        mx, sx = mean_std(fx, eps)
        ms, ss = mean_std(fs, eps)
        total = total + _mse(mx, ms) + _mse(sx, ss)
    return total


def content_loss(feats_x: VggFeatures, feats_content: VggFeatures):
    """MSE on relu4_1 (``train/style_networks.py:514-516``)."""
    return _mse(feats_x.relu4_1, feats_content.relu4_1)


def tv_loss(x):
    """Anisotropic TV, mean-abs form (``train/train.py:261-265``), NHWC."""
    h_tv = jnp.mean(jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]))
    w_tv = jnp.mean(jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return h_tv + w_tv
