"""Implicit-GEMM 3x3 conv for the high-res small-channel boundary layers.

XLA's TPU conv lowering sits at 18% MFU on 640^2 x 64->64 and 2.2 TF/s on
640^2 x 64->3 (PERF.md microbench table) — the two layers that dominate the
decoder's roofline deficit.  This kernel reformulates the conv as nine
accumulated MXU matmuls over row tiles:

    out[th*W, O] = sum_{dy,dx} slab[dy:dy+th, dx:dx+W, :] @ W[dy, dx]

with the input slab (row tile + 1-row halo on each side, spatially
pre-padded) DMA'd HBM->VMEM per grid step and a float32 VMEM accumulator.
The 64-channel contraction uses half the MXU's K dim — the question this
kernel answers by MEASUREMENT (scripts/bench_conv3x3.py, real chip) is
whether that beats XLA's conv tiling on these shapes (VERDICT round-2 #3:
"an estimate is not a measurement").

Semantics: SAME-padded 3x3 conv, NHWC, optional bias; exact vs
``lax.conv_general_dilated`` up to fp accumulation order
(tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, w_ref, b_ref, o_ref, slab, sem, *, tile_h, W, C,
            Opad, out_dtype):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    # Halo'd row slab for this tile: rows [ti*tile_h, ti*tile_h + tile_h+2)
    # of the spatially pre-padded input.
    dma = pltpu.make_async_copy(
        xp_ref.at[bi, pl.ds(ti * tile_h, tile_h + 2)], slab, sem)
    dma.start()
    dma.wait()

    a = b_ref[:].astype(jnp.float32)  # [1, Opad] bias (zeros when absent)
    a = jnp.broadcast_to(a, (tile_h * W, Opad))
    for dy in range(3):
        for dx in range(3):
            xs = slab[pl.ds(dy, tile_h), pl.ds(dx, W), :]
            xs = xs.reshape(tile_h * W, C)
            a = a + jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = a.reshape(tile_h, W, Opad).astype(out_dtype)[None]


def conv3x3_implicit_gemm(x, w, b=None, tile_h: int = 8,
                          interpret: bool = False):
    """SAME 3x3 conv, NHWC x HWIO -> NHWC, via tiled implicit GEMM.

    `x` [B,H,W,C], `w` [3,3,C,O]; H must divide tile_h.  O is padded to a
    lane multiple internally (the MXU runs 128 lanes regardless — this is
    what makes the 64->3 output conv a candidate: XLA's direct lowering
    achieves 2.2 TF/s on it).
    """
    B, H, W, C = x.shape
    O = w.shape[-1]
    if H % tile_h:
        raise ValueError(f"H={H} not divisible by tile_h={tile_h}")
    Opad = max(128, ((O + 127) // 128) * 128) if O < 128 else O
    if Opad != O:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, Opad - O)))
    bias = jnp.zeros((1, Opad), x.dtype) if b is None else jnp.pad(
        b.reshape(1, O).astype(x.dtype), ((0, 0), (0, Opad - O)))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    kern = functools.partial(_kernel, tile_h=tile_h, W=W, C=C, Opad=Opad,
                             out_dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(B, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM; manual DMA
            pl.BlockSpec((3, 3, C, Opad), lambda bi, ti: (0, 0, 0, 0)),
            pl.BlockSpec((1, Opad), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, Opad),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Opad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, W + 2, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w.astype(x.dtype), bias)
    return out[..., :O] if Opad != O else out


def conv3x3_nine_shift(x, w, b=None, precision=None):
    """Pure-XLA control formulation: nine shifted [M,C]@[C,O] dots (lets
    XLA's *matmul* path handle the layer instead of its conv path)."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, O), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            acc = acc + jnp.einsum(
                "bhwc,co->bhwo", xs, w[dy, dx],
                precision=precision,
                preferred_element_type=jnp.float32)
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(x.dtype)
