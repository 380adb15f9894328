"""70x70 PatchGAN discriminator + init (optional LSGAN path, off by default).

Re-design of ``train/other_networks.py:300-344`` (define_D at ``:63-67``):
conv(3->64,k4,s2)+lrelu, then [conv(k4,s2,no-bias)+BN+lrelu] x2 doubling
channels, conv(->512,k4,s1,no-bias)+BN+lrelu, conv(->1,k4,s1).  BatchNorm
('batch' norm layer, affine) uses batch statistics — exactly what torch does
in train mode, and the discriminator is never run in eval mode in the
reference (``train/train.py:278``), so no running stats are kept.

Init implements all four init_weights schemes
(``train/other_networks.py:28-49``, applied at ``train/train.py:277`` with
the default 'normal'): convs normal(0, gain) / xavier / kaiming /
orthogonal, BN scale N(1, 0.02) + zero biases regardless of scheme
(torch's BatchNorm branch ignores init_type).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from rerevst_tpu.models.layers import leaky_relu

INIT_SCHEMES = ("normal", "xavier", "kaiming", "orthogonal")


def init_conv_weight(key, shape, scheme: str = "normal", gain: float = 0.02,
                     dtype=jnp.float32):
    """One conv weight [kh,kw,cin,cout] with torch init_weights semantics
    (``train/other_networks.py:31-41``): 'normal' N(0,gain); 'xavier'
    xavier_normal_(gain); 'kaiming' kaiming_normal_(a=0, fan_in);
    'orthogonal' orthogonal_(gain) over the (cout, rest) flattening."""
    kh, kw, cin, cout = shape
    fan_in, fan_out = kh * kw * cin, kh * kw * cout
    if scheme == "normal":
        return jax.random.normal(key, shape, dtype) * gain
    if scheme == "xavier":
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std
    if scheme == "kaiming":
        std = np.sqrt(2.0 / fan_in)  # a=0 leaky_relu gain over fan_in
        return jax.random.normal(key, shape, dtype) * std
    if scheme == "orthogonal":
        rows, cols = cout, kh * kw * cin
        tall = (max(rows, cols), min(rows, cols))
        a = jax.random.normal(key, tall, jnp.float32)
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))  # unique/uniform sign, like torch
        w2d = q.T if rows < cols else q   # (rows, cols), semi-orthogonal
        w = (gain * w2d).reshape(cout, cin, kh, kw)
        return jnp.transpose(w, (2, 3, 1, 0)).astype(dtype)
    raise ValueError(f"unknown init scheme {scheme!r} "
                     f"(choose from {INIT_SCHEMES})")


def init_discriminator_params(key, in_ch: int = 3, ndf: int = 64,
                              n_layers: int = 3, dtype=jnp.float32,
                              scheme: str = "normal",
                              gain: float = 0.02) -> Dict:
    keys = jax.random.split(key, n_layers + 3)
    params: Dict = {}

    def conv(k, kh, kw, cin, cout, bias):
        p = {"w": init_conv_weight(k, (kh, kw, cin, cout), scheme, gain,
                                   dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def bn(k, c):
        return {"scale": 1.0 + jax.random.normal(k, (c,), dtype) * 0.02,
                "bias": jnp.zeros((c,), dtype)}

    params["conv0"] = conv(keys[0], 4, 4, in_ch, ndf, bias=True)
    nf_prev = 1
    for n in range(1, n_layers):
        nf = min(2 ** n, 8)
        k1, k2 = jax.random.split(keys[n])
        params[f"conv{n}"] = conv(k1, 4, 4, ndf * nf_prev, ndf * nf,
                                  bias=False)
        params[f"bn{n}"] = bn(k2, ndf * nf)
        nf_prev = nf
    nf = min(2 ** n_layers, 8)
    k1, k2 = jax.random.split(keys[n_layers])
    params[f"conv{n_layers}"] = conv(k1, 4, 4, ndf * nf_prev, ndf * nf,
                                     bias=False)
    params[f"bn{n_layers}"] = bn(k2, ndf * nf)
    params["conv_out"] = conv(keys[n_layers + 1], 4, 4, ndf * nf, 1, bias=True)
    return params


def _conv(p, x, stride, precision=None):
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _batch_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, (0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), (0, 1, 2), keepdims=True)
    xn = (xf - mean) * lax.rsqrt(var + eps)
    out = xn * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def discriminator(params: Dict, x, n_layers: int = 3, precision=None):
    """PatchGAN logits [B, H/8-ish, W/8-ish, 1] (no sigmoid — LSGAN)."""
    h = leaky_relu(_conv(params["conv0"], x, 2, precision))
    for n in range(1, n_layers):
        h = _conv(params[f"conv{n}"], h, 2, precision)
        h = leaky_relu(_batch_norm(params[f"bn{n}"], h))
    h = _conv(params[f"conv{n_layers}"], h, 1, precision)
    h = leaky_relu(_batch_norm(params[f"bn{n_layers}"], h))
    return _conv(params["conv_out"], h, 1, precision)
