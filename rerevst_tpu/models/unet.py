"""U-Net generator (inventory parity with ``train/other_networks.py:137-296``).

The reference carries a progressive-growing UnetGenerator that no driver ever
calls (define_G is dead code, ``train/other_networks.py:56-60``); it is kept
for component-inventory completeness.  This is a functional NHWC re-design:
`num_downs` conv(k4,s2)+leaky encoder levels mirrored by nearest-up + conv
decoder levels with skip concatenation, tanh output.

Channel plan (ngf=64, num_downs=n): encoder widths w_i = min(64*2^i, 512);
decoder level i outputs w_{i-1} (ngf at i=0) and consumes its skip
concatenated with the level below.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from rerevst_tpu.models.layers import leaky_relu
from rerevst_tpu.ops.resize import upsample_nearest_2x


def _widths(ngf: int, num_downs: int):
    return [min(ngf * (2 ** i), ngf * 8) for i in range(num_downs)]


def init_unet_params(key, in_ch: int = 3, out_ch: int = 3, ngf: int = 64,
                     num_downs: int = 8, dtype=jnp.float32) -> Dict:
    w = _widths(ngf, num_downs)
    keys = jax.random.split(key, 2 * num_downs + 1)

    def conv(k, ksize, cin, cout):
        return {"w": jax.random.normal(k, (ksize, ksize, cin, cout),
                                       dtype) * 0.02,
                "b": jnp.zeros((cout,), dtype)}

    params: Dict = {}
    cin = in_ch
    for i in range(num_downs):
        params[f"down{i}"] = conv(keys[i], 4, cin, w[i])
        cin = w[i]
    for i in range(num_downs):
        cin_i = w[i] + (w[i] if i < num_downs - 1 else 0)
        cout_i = w[i - 1] if i > 0 else ngf
        params[f"up{i}"] = conv(keys[num_downs + i], 3, cin_i, cout_i)
    params["out"] = conv(keys[-1], 3, ngf, out_ch)
    return params


def _conv(p, x, stride=1, padding=1, precision=None):
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return out + p["b"].astype(x.dtype)


def unet(params: Dict, x, num_downs: int = 8, precision=None):
    """Forward pass; input spatial dims must be divisible by 2**num_downs."""
    skips = []
    h = x
    for i in range(num_downs):
        h = leaky_relu(_conv(params[f"down{i}"], h, stride=2, padding=1,
                             precision=precision))
        skips.append(h)
    for i in reversed(range(num_downs)):
        if i < num_downs - 1:
            h = jnp.concatenate([h, skips[i]], axis=-1)
        h = upsample_nearest_2x(h)
        h = leaky_relu(_conv(params[f"up{i}"], h, precision=precision))
    return jnp.tanh(_conv(params["out"], h, precision=precision))
