"""Fused dynamic-filter pair: y = leaky(x @ f1^T) @ f2^T in one VMEM pass.

The decoder's AdaIN_filter applies two predicted 1x1 filters back-to-back
with a LeakyReLU between (``test/style_network_global.py:210-217``); under
XLA the intermediate [B,H,W,32] round-trips HBM between the two matmuls
(about 26 MB per 640^2 frame, three times per decode).  This kernel tiles
the flattened pixel axis, keeps both 32x32 filter matrices resident in VMEM,
and chains matmul -> leaky -> matmul entirely on-chip.

Semantics match ``apply_dynamic_filter`` exactly: out_p = sum_q x_q f[p,q],
i.e. x @ f.T per sample, with a shared [1,P,Q] filter broadcast over the
batch (the global-inference case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rerevst_tpu.models.layers import leaky_relu

_TILE = 1024  # pixel rows per block: [1024, C] fp32 = 128 KB at C=32


def dynamic_filter_pair_xla(x, f1, f2, precision=None):
    """Reference implementation (two einsums + leaky)."""
    from rerevst_tpu.models.layers import apply_dynamic_filter

    h = leaky_relu(apply_dynamic_filter(x, f1, precision))
    return apply_dynamic_filter(h, f2, precision)


def _kernel(x_ref, f1_ref, f2_ref, o_ref):
    x = x_ref[:]
    # out = x @ f.T  (f: [P,Q] maps q -> p)
    h = jax.lax.dot_general(
        x, f1_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = jnp.where(h >= 0, h, h * 0.2)
    o = jax.lax.dot_general(
        h.astype(x.dtype), f2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dynamic_filter_pair(x, f1, f2, interpret: bool = False):
    """x: [B,H,W,C]; f1, f2: [1,C,C] (sequence-frozen filters).

    Returns leaky(x@f1^T)@f2^T with the intermediate kept in VMEM.
    """
    b, h, w, c = x.shape
    m = b * h * w
    xf = x.reshape(m, c)
    pad = (-m) % _TILE
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    grid = (xf.shape[0] // _TILE,)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        interpret=interpret,
    )(xf, f1[0].astype(x.dtype), f2[0].astype(x.dtype))

    if pad:
        out = out[:m]
    return out.reshape(b, h, w, c)
