"""GAN objectives (``train/other_networks.py:75-134``): lsgan / vanilla / wgangp."""

from __future__ import annotations

import jax.numpy as jnp


def gan_loss(prediction, target_is_real: bool, mode: str = "lsgan"):
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(prediction - target))
    if mode == "vanilla":
        target = 1.0 if target_is_real else 0.0
        # BCE-with-logits, mean reduction.
        p = prediction
        return jnp.mean(jnp.maximum(p, 0) - p * target + jnp.log1p(jnp.exp(-jnp.abs(p))))
    if mode == "wgangp":
        m = jnp.mean(prediction)
        return -m if target_is_real else m
    raise NotImplementedError(f"gan mode {mode!r}")
