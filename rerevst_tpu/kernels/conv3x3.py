"""Implicit-GEMM 3x3 conv for the high-res small-channel boundary layers.

XLA's TPU conv lowering sits at 18% MFU on 640^2 x 64->64 and 2.2 TF/s on
640^2 x 64->3 (PERF.md microbench table) — the two layers that dominate the
decoder's roofline deficit.  This kernel reformulates the conv as nine
accumulated MXU matmuls over row tiles:

    out[th*W, O] = sum_{dy,dx} slab[dy:dy+th, dx:dx+W, :] @ W[dy, dx]

with the input slab (row tile + 1-row halo on each side, spatially
pre-padded) double-buffer DMA'd HBM->VMEM (tile i+1's slab prefetches while
tile i computes) and float32 accumulation.  The 64-channel contraction pads
to the 128-lane DMA/tile granule — zeros are free on the MXU systolic passes
but the formulation is stuck at 9 K-passes per tile where the true work is
4.5; reaching the 4.5-5 pass floor needs an im2col/pair-packed layout whose
pack/unpack relayouts are exactly what the measured parity-packing negative
result documents.  MEASURED on the real chip (scripts/bench_conv3x3.py —
VERDICT round-2 #3 demanded a measurement, not an estimate): see the
PERF.md round-3 table; XLA's direct conv wins and stays the production path.

Semantics: SAME-padded 3x3 conv, NHWC, optional bias; exact vs
``lax.conv_general_dilated`` up to fp accumulation order
(tests/test_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, w_ref, b_ref, o_ref, slab, sem, *, tile_h, W, Wp, C,
            Opad, out_dtype, n_tiles):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    step = bi * n_tiles + ti
    total = pl.num_programs(0) * n_tiles
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def copy_for(b_idx, t_idx, s):
        # Halo'd row slab for tile (b_idx, t_idx): rows
        # [t_idx*tile_h, t_idx*tile_h + tile_h+2) of the pre-padded input.
        return pltpu.make_async_copy(
            xp_ref.at[b_idx, pl.ds(t_idx * tile_h, tile_h + 2)],
            slab.at[s], sem.at[s])

    @pl.when(step == 0)
    def _():
        copy_for(bi, ti, slot).start()

    # Double buffering: prefetch the NEXT tile's slab while this one
    # computes (the serial start->wait->compute version measured ~25%
    # slower end to end).
    @pl.when(step + 1 < total)
    def _():
        nbi = jax.lax.select(ti == n_tiles - 1, bi + 1, bi)
        nti = jax.lax.select(ti == n_tiles - 1, 0, ti + 1)
        copy_for(nbi, nti, nslot).start()

    copy_for(bi, ti, slot).wait()

    a = b_ref[:].astype(jnp.float32)  # [1, Opad] bias (zeros when absent)
    a = jnp.broadcast_to(a, (tile_h * W, Opad))
    for dy in range(3):
        for dx in range(3):
            xs = slab[slot, pl.ds(dy, tile_h), pl.ds(dx, W), :]
            xs = xs.reshape(tile_h * W, C)
            a = a + jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = a.reshape(tile_h, W, Opad).astype(out_dtype)[None]


def conv3x3_implicit_gemm(x, w, b=None, tile_h: int = 8,
                          interpret: bool = False):
    """SAME 3x3 conv, NHWC x HWIO -> NHWC, via tiled implicit GEMM.

    `x` [B,H,W,C], `w` [3,3,C,O]; H must divide tile_h.  O pads to 64 or a
    128 multiple (N <= 128 occupies one MXU pass either way; only the
    output-write bytes differ).
    """
    B, H, W, C = x.shape
    O = w.shape[-1]
    if H % tile_h:
        raise ValueError(f"H={H} not divisible by tile_h={tile_h}")
    if O <= 64:
        Opad = 64
    else:
        Opad = ((O + 127) // 128) * 128
    if Opad != O:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, Opad - O)))
    bias = jnp.zeros((1, Opad), x.dtype) if b is None else jnp.pad(
        b.reshape(1, O).astype(x.dtype), ((0, 0), (0, Opad - O)))
    # Width pads to halo+left AND up to a sublane multiple; channels pad to
    # a full lane tile: Mosaic requires DMA slice extents on the tiled dims
    # to be (8, 128)-aligned.  The channel zeros are FREE on the MXU (a
    # K=64 contraction occupies the same systolic passes as K=128) — the
    # cost is 2x input DMA bytes, which the measurement prices in.
    Wp = ((W + 2 + 7) // 8) * 8
    Cpad = ((C + 127) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, Cpad - C)))
    if Cpad != C:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cpad - C), (0, 0)))

    n_tiles = H // tile_h
    kern = functools.partial(_kernel, tile_h=tile_h, W=W, Wp=Wp, C=Cpad,
                             Opad=Opad, out_dtype=x.dtype, n_tiles=n_tiles)
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; manual DMA
            pl.BlockSpec((3, 3, Cpad, Opad), lambda bi, ti: (0, 0, 0, 0)),
            pl.BlockSpec((1, Opad), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, Opad),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Opad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, Wp, Cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w.astype(x.dtype), bias)
    return out[..., :O] if Opad != O else out


def _pair_weights(w, dtype):
    """Fuse the conv kernel for the pair-lane formulation.

    Input ``w`` [3, 3, 64, O<=64]; output ``w2`` [3, 3, 128, 128] where
    block (dy, dpi) maps an input PAIR-fused vector
    [x(2(p+dpi-1)), x(2(p+dpi-1)+1)] (2x64 lanes) to the output pair
    [out(2p), out(2p+1)] (cols pos*64+o).  Each original tap appears twice
    (once per output position) and 6 of the 18 half-blocks are zero — the
    2x padded-FLOP cost that buys full 128-lane K AND N utilization.
    """
    O = w.shape[-1]
    w = w.astype(dtype)
    z = jnp.zeros((3, 3, 128, 128), dtype)
    for dy in range(3):
        # dpi=0 (input pair p-1): col 2p-1 = half 1, feeds pos 0 via dx=0.
        z = z.at[dy, 0, 64:128, 0:O].set(w[dy, 0])
        # dpi=1 (input pair p): both halves feed both positions.
        z = z.at[dy, 1, 0:64, 0:O].set(w[dy, 1])
        z = z.at[dy, 1, 64:128, 0:O].set(w[dy, 2])
        z = z.at[dy, 1, 0:64, 64:64 + O].set(w[dy, 0])
        z = z.at[dy, 1, 64:128, 64:64 + O].set(w[dy, 1])
        # dpi=2 (input pair p+1): col 2p+2 = half 0, feeds pos 1 via dx=2.
        z = z.at[dy, 2, 0:64, 64:64 + O].set(w[dy, 2])
    return z


def _kernel_pair(xp_ref, w_ref, b_ref, o_ref, slab, sem, *, tile_h, W2,
                 out_dtype, n_tiles):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    step = bi * n_tiles + ti
    total = pl.num_programs(0) * n_tiles
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def copy_for(b_idx, t_idx, s):
        return pltpu.make_async_copy(
            xp_ref.at[b_idx, pl.ds(t_idx * tile_h, tile_h + 2)],
            slab.at[s], sem.at[s])

    @pl.when(step == 0)
    def _():
        copy_for(bi, ti, slot).start()

    @pl.when(step + 1 < total)
    def _():
        nbi = jax.lax.select(ti == n_tiles - 1, bi + 1, bi)
        nti = jax.lax.select(ti == n_tiles - 1, 0, ti + 1)
        copy_for(nbi, nti, nslot).start()

    copy_for(bi, ti, slot).wait()

    # Mosaic has no f16 MXU path: f16 slabs are DMA'd at 2 B/elem and cast
    # to bf16 in-register for the dot (f32 accumulation throughout).  This
    # rounds the two boundary-layer INPUTS to bf16 in f16 sessions — priced
    # into the measured end-to-end parity (PERF.md).
    a = b_ref[:].astype(jnp.float32)  # [1, 128] pos-fused bias
    a = jnp.broadcast_to(a, (tile_h * W2, 128))
    for dy in range(3):
        for dpi in range(3):
            xs = slab[slot, pl.ds(dy, tile_h), pl.ds(dpi, W2), :]
            xs = xs.reshape(tile_h * W2, 128)
            a = a + jax.lax.dot_general(
                xs, w_ref[dy, dpi],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = a.reshape(tile_h, W2, 128).astype(out_dtype)[None]


def pallas_interpret_default() -> bool:
    """Pallas TPU (Mosaic) kernels need the interpreter off-TPU — this is
    what lets the pair-lane model paths run under the CPU test mesh."""
    return jax.default_backend() != "tpu"


def conv3x3_pairlane(x, w, b=None, tile_h: int = 8,
                     interpret: Optional[bool] = None,
                     fused_io: bool = False):
    """SAME 3x3 conv for C=64, O<=64 via the PAIR-LANE implicit GEMM.

    The previous igemm formulation (`conv3x3_implicit_gemm`) wastes half of
    both MXU dimensions on this layer: K = 64 channels padded to the
    128-lane granule and N = 64 output channels on 128 lanes.  Here two
    horizontally adjacent pixels fuse into the lane dim — [B,H,W,64] viewed
    as [B,H,W/2,128], a CONTIGUOUS reshape in NHWC, not a space-to-depth
    relayout — so each of the nine (dy, pair-offset) matmuls is a fully
    dense [M,128]x[128,128] MXU pass computing TWO output pixels per row.
    MXU-pass floor: 9 * H*W/2 rows vs the igemm's 9 * H*W — half — at the
    price of 6 half-zero weight blocks (2x padded FLOPs vs the true work,
    but 2x fewer systolic passes, which is what costs time at K,N<=128).

    MEASURED (v5e, batch 16, 640^2x64->64, scripts/bench_conv3x3.py): the
    first Pallas formulation in this repo to beat XLA's isolated conv —
    7.8 vs 13.9 ms (57 TF/s effective).  Composed into the real pipeline it
    still LOSES (PERF.md round-3 pair-lane section): in-context XLA fuses
    the surrounding elementwise chain into its convs and runs them ~2x
    faster than their isolated microbenches, which a custom call forfeits.
    Kept in-tree, equality-tested, off by default (ModelConfig.pairlane).

    `fused_io=True` takes/returns the pair-fused layout directly
    ([B,H,W/2,128] in, [B,H,W/2,128] out with cols = pos*64+o) so a fused
    region never pays the boundary reshapes.
    """
    if interpret is None:
        interpret = pallas_interpret_default()
    if x.dtype == jnp.float16:
        # Mosaic rejects f16 outright ("Unsupported type in mosaic dialect")
        # — callers cast the fused region to bf16 (model integration) or f32.
        raise TypeError("conv3x3_pairlane: Mosaic has no f16 support; cast "
                        "the operand to bfloat16 or float32 first")
    if fused_io:
        B, H, W2, CL = x.shape
        if CL != 128:
            raise ValueError("fused_io expects [B,H,W/2,128]")
    else:
        B, H, W, C = x.shape
        if C != 64 or W % 2:
            raise ValueError("pair-lane kernel needs C=64 and even W")
        W2 = W // 2
        x = x.reshape(B, H, W2, 128)
    O = w.shape[-1]
    if O > 64:
        raise ValueError("pair-lane kernel needs O<=64")
    if H % tile_h:
        raise ValueError(f"H={H} not divisible by tile_h={tile_h}")

    w2 = _pair_weights(w, x.dtype)
    if b is None:
        b2 = jnp.zeros((1, 128), x.dtype)
    else:
        bo = jnp.pad(b.reshape(O).astype(x.dtype), (0, 64 - O))
        b2 = jnp.concatenate([bo, bo]).reshape(1, 128)

    # One zero PAIR of halo on each side covers input cols [-1, W]; pad the
    # pair dim up to the sublane granule so the DMA extents stay aligned.
    sub = {jnp.dtype(jnp.float32): 8}.get(jnp.dtype(x.dtype), 16)
    P = ((W2 + 2 + sub - 1) // sub) * sub
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, P - W2 - 1), (0, 0)))

    n_tiles = H // tile_h
    kern = functools.partial(_kernel_pair, tile_h=tile_h, W2=W2,
                             out_dtype=x.dtype, n_tiles=n_tiles)
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # HBM; manual slab DMA
            pl.BlockSpec((3, 3, 128, 128), lambda bi, ti: (0, 0, 0, 0)),
            pl.BlockSpec((1, 128), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W2, 128),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W2, 128), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, P, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w2, b2)
    if fused_io:
        return out
    out = out.reshape(B, H, W2 * 2, 64)
    return out[..., :O] if O != 64 else out


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
