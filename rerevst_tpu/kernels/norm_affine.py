"""Fused frozen-stats normalize + clamp + style affine (one VMEM pass).

The global decoder's AdaIN sites compute
``clip((x-mean)*rstd, xmin, xmax) * style_std + style_mean``
(``test/style_network_global.py:43-57`` + ``:357-364``) — five elementwise
stages over large activations.  This kernel folds the whole chain into two
effective per-channel affines plus a clamp, computed in one tiled VMEM pass:

    y = clip(x * a0 + b0, lo, hi) * a1 + b1

with a0 = rstd, b0 = -mean*rstd, a1 = style_std, b1 = style_mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512


def norm_affine_clamp_xla(x, st, style_std, style_mean):
    """Reference implementation (what decode_global does inline)."""
    xf = (x - st.mean.astype(x.dtype)) * st.rstd.astype(x.dtype)
    xf = jnp.clip(xf, st.xmin.astype(x.dtype), st.xmax.astype(x.dtype))
    return xf * style_std.astype(x.dtype) + style_mean.astype(x.dtype)


def _kernel(x_ref, a0_ref, b0_ref, lo_ref, hi_ref, a1_ref, b1_ref, o_ref):
    x = x_ref[:]
    y = x * a0_ref[:] + b0_ref[:]
    y = jnp.minimum(jnp.maximum(y, lo_ref[:]), hi_ref[:])
    o_ref[:] = y * a1_ref[:] + b1_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def norm_affine_clamp(x, st, style_std, style_mean, interpret: bool = False):
    """x: [B,H,W,C]; st: NormStats; style_*: [1,1,1,C] (broadcast affine)."""
    b, h, w, c = x.shape
    dt = x.dtype
    a0 = st.rstd.reshape(1, c).astype(dt)
    b0 = (-st.mean * st.rstd).reshape(1, c).astype(dt)
    lo = st.xmin.reshape(1, c).astype(dt)
    hi = st.xmax.reshape(1, c).astype(dt)
    if style_std.reshape(-1, c).shape[0] != 1:
        raise ValueError(
            "norm_affine_clamp supports a single shared style affine "
            "([1,1,1,C]); per-sample stats need norm_affine_clamp_xla")
    a1 = style_std.reshape(1, c).astype(dt)
    b1 = style_mean.reshape(1, c).astype(dt)

    # Pack channels into full 128-wide lanes: view [M, C] as [M/k, 128] with
    # the per-channel vectors tiled k times, so the VPU runs at full width
    # for C < 128.
    k = max(128 // c, 1)
    a0, b0, lo, hi, a1, b1 = (jnp.tile(v, (1, k)) for v in
                              (a0, b0, lo, hi, a1, b1))
    cw = c * k
    m = b * h * w
    xf = x.reshape(m, c)
    pad_rows = (-m) % (_TILE * k)
    if pad_rows:
        xf = jnp.pad(xf, ((0, pad_rows), (0, 0)))
    xf = xf.reshape(-1, cw)
    grid = (xf.shape[0] // _TILE,)
    vec = pl.BlockSpec((1, cw), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((_TILE, cw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec, vec, vec, vec, vec, vec],
        out_specs=pl.BlockSpec((_TILE, cw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, dt),
        interpret=interpret,
    )(xf, a0, b0, lo, hi, a1, b1)

    out = out.reshape(-1, c)
    if pad_rows:
        out = out[:m]
    return out.reshape(b, h, w, c)
