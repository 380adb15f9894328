"""Parameterized layers as pure functions over param pytrees (NHWC).

Initialization mirrors the reference:
* decoder convs/linears: normal(std=0.02), zero bias — init_weights 'normal'
  (``train/style_networks.py:47-68``, called at ``train/style_networks.py:399``);
* VGG convs: torch Conv2d default (kaiming-uniform a=sqrt(5), uniform bias) so
  an untrained model matches the reference's distribution when no pretrained
  weights are supplied.

Weight layout is HWIO (TPU-native).  ``from_torch_conv`` converts torch OIHW.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def precision_for(dtype, override: str = "auto") -> lax.Precision:
    """fp32 params -> HIGHEST (parity); low precision -> DEFAULT (speed).

    `override` ('default' | 'high' | 'highest') forces a specific level —
    'high' (bf16x3) is the fast fp32 middle ground.
    """
    if override and override != "auto":
        return {"default": lax.Precision.DEFAULT,
                "high": lax.Precision.HIGH,
                "highest": lax.Precision.HIGHEST}[override]
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def init_conv_normal(key, kh, kw, cin, cout, gain: float = 0.02, bias: bool = True,
                     dtype=jnp.float32):
    """normal(0, gain) weights, zero bias — reference decoder init."""
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * gain
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_conv_torch_default(key, kh, kw, cin, cout, bias: bool = True,
                            dtype=jnp.float32):
    """torch nn.Conv2d default init (kaiming_uniform a=sqrt(5) + fan-in bias)."""
    wk, bk = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = math.sqrt(6.0 / ((1 + 5.0) * fan_in))  # gain^2=2/(1+a^2)=1/3
    w = jax.random.uniform(wk, (kh, kw, cin, cout), dtype, -bound, bound)
    p = {"w": w}
    if bias:
        bb = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(bk, (cout,), dtype, -bb, bb)
    return p


def init_linear_normal(key, cin, cout, gain: float = 0.02, dtype=jnp.float32):
    w = jax.random.normal(key, (cin, cout), dtype) * gain
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


# ---------------------------------------------------------------------------
# Torch weight conversion
# ---------------------------------------------------------------------------

def from_torch_conv(weight_oihw: np.ndarray, bias: Optional[np.ndarray] = None,
                    dtype=jnp.float32):
    """torch Conv2d [O,I,kH,kW] -> HWIO param dict."""
    w = jnp.asarray(np.transpose(weight_oihw, (2, 3, 1, 0)), dtype)
    p = {"w": w}
    if bias is not None:
        p["b"] = jnp.asarray(bias, dtype)
    return p


def from_torch_linear(weight_oi: np.ndarray, bias: Optional[np.ndarray] = None,
                      dtype=jnp.float32):
    """torch Linear [O,I] -> [I,O] param dict."""
    p = {"w": jnp.asarray(np.transpose(weight_oi), dtype)}
    if bias is not None:
        p["b"] = jnp.asarray(bias, dtype)
    return p


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------

def conv2d(p, x, stride: int = 1, padding: int = 0,
           precision: Optional[lax.Precision] = None):
    """3x3/1x1 conv, torch-style symmetric zero padding."""
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def linear(p, x, precision: Optional[lax.Precision] = None):
    out = jnp.dot(x, p["w"].astype(x.dtype), precision=precision)
    return out + p["b"].astype(x.dtype)


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, x * slope)


def max_pool_2x2(x):
    """MaxPool2d(kernel=2, stride=2) on NHWC.

    reduce_window, deliberately: the reshape+max form (exact same 4-element
    max) looked 26%% faster in a standalone harness but was a closure
    artifact — on the real bench it is noise at batch 16/32 and a measured
    0.65 ms REGRESSION at batch 1 (7.18 -> 7.83 ms/frame, the serving
    operating point).  See PERF.md round-3 'explored and rejected'.
    """
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def upsample2x_conv3x3(p, x, precision: Optional[lax.Precision] = None):
    """conv3x3(nearest_upsample_2x(x)) computed WITHOUT materializing the
    upsampled tensor — the decoder's hottest memory pattern.

    For output parity (a,b) in the 2x grid, the 3x3 window over the
    nearest-upsampled image collapses onto a 2x2 window of the low-res input
    with kernel entries summed by parity:

      a=0 rows: {i-1: W[0], i: W[1]+W[2]};  a=1 rows: {i: W[0]+W[1], i+1: W[2]}
      (same for columns)

    Expressed as one input-dilated conv (the native conv-transpose pattern
    XLA/TPU lowers to parity-fragmented convs with the interleave fused into
    the output write): nearest-up(x) = xd ⊛ [1,1] where xd is zero-dilated x,
    so conv3x3 ∘ nearest-up = conv(xd, K) with the 4x4 "spread" kernel
    K = full-conv(W, ones(2,2)).  4/9 of the effective FLOPs and 1/4 of the
    input reads of the naive version; the 2x-res intermediate never exists.
    Bit-identical up to fp reassociation (kernel entries are pre-summed).
    Measured on TPU v5e @640^2: 28% faster end-to-end decoder than the
    naive upsample+conv.
    """
    w = p["w"]  # [3,3,Cin,Cout]
    k = jnp.zeros((4, 4) + w.shape[2:], w.dtype)
    for t1 in (0, 1):
        for t2 in (0, 1):
            k = k.at[t1 : t1 + 3, t2 : t2 + 3].add(w)
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Parity-packed (space-to-depth) boundary convs — MEASURED SLOWER END-TO-END
#
# Motivation: XLA:TPU executes some high-resolution small-channel convs far
# below the MXU roofline (v5e, batch 16: the out conv 640^2 x 64->3 runs
# 10.2 ms direct vs 6.2 packed; the input-dilated upsample-conv at
# 320^2 x 128->64 runs 8.5 vs 5.0 packed).  Packing the 2x2 pixel parities
# into channels quarters the spatial extent and quadruples channel width,
# and the unpack transpose (which costs +3..10 ms standalone) can be
# absorbed into ops that erase layout anyway: 2x2 maxpool == max over
# parity groups, and the final RGB image unpacks on 3 channels for ~free.
#
# Verdict (kept as a documented negative result; default off): composed
# into the real pipeline the packing LOSES ~20% fps (f16 236.5 -> 177.6;
# decoder-tail-only 236.5 -> 197.5).  The per-parity 4-conv + concat
# structure defeats XLA's elementwise fusion around each conv, the
# remaining packed ops are individually slower (64->64 conv 13.9 -> 15.9 ms
# from the 16/9 structured-zero FLOPs; even the parity-max pool loses to
# reduce_window 3.6 -> 4.9 ms), and the isolated wins don't survive.  See
# PERF.md "Roofline" for the full measurement table.
# ---------------------------------------------------------------------------


def space_to_depth_2x(x):
    """[B,2H,2W,C] -> [B,H,W,4C]; channel group g = row_parity*2+col_parity."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space_2x(x):
    """Inverse of space_to_depth_2x: [B,H,W,4C] -> [B,2H,2W,C]."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def max_pool_2x2_packed(x):
    """2x2/2 maxpool of the true layout == max over the 4 parity groups of
    the packed layout — the unpack is absorbed, no transpose ever runs."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    return x.reshape(b, h, w, 4, c).max(axis=3)


def tile_packed(stats):
    """Per-true-channel constants [..,C] -> packed [..,4C] (group-major)."""
    return jnp.tile(stats, (1,) * (stats.ndim - 1) + (4,))


def _packed_kernel_3x3(w, a, b):
    """[2,2,4Cin,Cout] kernel computing output parity (a,b) of a true-layout
    3x3 zero-pad-1 conv from a parity-packed input.

    True row r = 2i+a reads true rows r+p-1 (p in 0..2); in cell/parity
    coordinates r+p-1 = 2(i+ci-oa)+pa with per-parity padding oa=1-a, giving
    p = 2*ci - 2*oa + pa - a + 1 (and likewise for columns)."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for ci in (0, 1):
        for pa in (0, 1):
            p_ = 2 * ci - 2 * (1 - a) + pa - a + 1
            if not 0 <= p_ <= 2:
                continue
            for cj in (0, 1):
                for pb in (0, 1):
                    q_ = 2 * cj - 2 * (1 - b) + pb - b + 1
                    if not 0 <= q_ <= 2:
                        continue
                    g = pa * 2 + pb
                    k = k.at[ci, cj, g * cin:(g + 1) * cin, :].set(w[p_, q_])
    return k


def conv3x3_packed(p, x, precision: Optional[lax.Precision] = None):
    """True-layout conv3x3 (zero pad 1) evaluated on a parity-packed tensor:
    packed [B,H,W,4Cin] -> packed [B,H,W,4Cout].

    Four [2,2,4Cin,Cout] convs (one per output parity, 16/9 of the true
    FLOPs from structured zeros) at 4x the channel width — measurably faster
    than the direct conv on small-channel high-res shapes (see module note).
    """
    w = p["w"]
    outs = []
    for a in (0, 1):
        for b in (0, 1):
            k = _packed_kernel_3x3(w, a, b)
            outs.append(lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1),
                ((1 - a, a), (1 - b, b)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision))
    y = jnp.concatenate(outs, axis=-1)
    if "b" in p:
        y = y + tile_packed(p["b"]).astype(x.dtype)
    return y


def upsample2x_conv3x3_packed(p, x, precision: Optional[lax.Precision] = None):
    """conv3x3(nearest_upsample_2x(x)) emitted parity-packed:
    [B,H,W,Cin] -> [B,H,W,4Cout] (true 2x-res output, packed).

    Same pre-summed spread kernel as ``upsample2x_conv3x3``, sliced by
    output parity instead of expressed through input dilation — identical
    FLOPs, but the four parity convs tile far better than XLA's dilated
    lowering at high resolution (1.7x at 320^2 x 128->64, v5e)."""
    w = p["w"]  # [3,3,Cin,Cout]
    k = jnp.zeros((4, 4) + w.shape[2:], w.dtype)
    for t1 in (0, 1):
        for t2 in (0, 1):
            k = k.at[t1: t1 + 3, t2: t2 + 3].add(w)
    outs = []
    for a in (0, 1):
        for b in (0, 1):
            outs.append(lax.conv_general_dilated(
                x, k[a::2, b::2].astype(x.dtype), (1, 1),
                ((1 - a, a), (1 - b, b)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision))
    y = jnp.concatenate(outs, axis=-1)
    if "b" in p:
        y = y + tile_packed(p["b"]).astype(x.dtype)
    return y


def upsample2x_conv1x1(p, x, precision: Optional[lax.Precision] = None):
    """conv1x1(nearest_upsample_2x(x)) as ONE input-dilated conv with the
    1x1 kernel spread to 2x2 (all four taps equal) — the shortcut-branch
    analog of ``upsample2x_conv3x3``: the 2x-res nearest copy never exists
    as a standalone broadcast (the trace prices that at 3.2 ms/batch-16)."""
    w = p["w"]  # [1,1,Cin,Cout]
    k = jnp.broadcast_to(w, (2, 2) + w.shape[2:])
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv3x3_outpairs(p, x, precision: Optional[lax.Precision] = None):
    """3x3 SAME conv emitting TWO adjacent output pixels per conv position:
    a stride-(1,2) conv with a width-4 kernel whose 2*Cout channels are the
    (w%2, o) pair — then a contiguous reshape back to [B,H,W,Cout].

    Built for tiny-Cout layers where XLA's direct conv tiling degenerates:
    the profiler trace shows the 640^2 x 64->3 OUT CONV fusion is the single
    most expensive op of the whole pipeline (13.4 of 66.7 ms per batch-16
    iteration, f16 — 20%).  The doubled output channels (6 vs 3) give the
    lane dim twice the real work per window; measured in-context: 13.5 vs
    14.8 ms (f16, batch 16).  Same contractions as the direct conv (each
    tap duplicated per output parity), fp-identical up to reduction order.
    Requires even W.
    """
    w = p["w"]  # [3,3,C,O]
    C, O = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 4, C, 2 * O), w.dtype)
    k = k.at[:, 0:3, :, 0:O].set(w)      # even output col: taps j = dx
    k = k.at[:, 1:4, :, O:2 * O].set(w)  # odd output col:  taps j = dx + 1
    b_, h_, w_, _ = x.shape
    yf = lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 2), ((1, 1), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    y = yf.reshape(b_, h_, w_, O)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# W-pair-fused layout helpers (the pair-lane Pallas conv path — see
# kernels/conv3x3.py:conv3x3_pairlane).  Layout: [B,H,W,64] viewed as
# [B,H,W/2,128] with lanes = (w%2, c) — a CONTIGUOUS reshape in NHWC.
# ---------------------------------------------------------------------------


def tile_pair(v):
    """Per-channel constants [..,C] -> W-pair-fused [..,2C] (same value for
    both pixels of the pair)."""
    return jnp.concatenate([v, v], axis=-1)


def upsample_nearest_2x_pairfused(x):
    """nearest_2x(x) emitted W-pair-fused: [B,H,W,C] -> [B,2H,W,2C].

    Column pair (2w, 2w+1) of the upsampled image is x[..,w,:] twice — the
    fused lanes are a duplicate — and rows repeat.  Equal to
    ``upsample_nearest_2x(x).reshape(B,2H,W,2C)``, without the relayout."""
    return jnp.repeat(jnp.concatenate([x, x], axis=-1), 2, axis=1)


def unfuse_pairs(x, channels: int):
    """W-pair-fused [B,H,W2,2C] -> [B,H,2*W2,C], keeping only `channels`
    of each 64-lane half (the pair-lane kernels emit halves of 64)."""
    b, h, w2, cl = x.shape
    half = cl // 2
    if channels == half:  # pure contiguous reshape
        return x.reshape(b, h, 2 * w2, half)
    y = jnp.stack([x[..., :channels], x[..., half:half + channels]], axis=3)
    return y.reshape(b, h, 2 * w2, channels)


def apply_dynamic_filter(x, filt, precision: Optional[lax.Precision] = None):
    """Per-sample predicted 1x1 conv: out = einsum('bhwq,bpq->bhwp').

    Replaces the reference's Python per-sample chunk loop
    (``test/style_network_global.py:194-208``) with one batched MXU matmul.
    `filt` is [B,P,Q] (or [1,P,Q] broadcast across the batch in global mode);
    semantics match ``F.conv2d(input, filter.permute(1,2,0,3))`` where the FC
    output reshaped [B,P,Q] maps q-channels to p-channels.
    """
    if filt.shape[0] == 1 and x.shape[0] != 1:
        filt = jnp.broadcast_to(filt, (x.shape[0],) + filt.shape[1:])
    if x.dtype == jnp.float16:
        # fp16's exponent cannot hold extreme filter values (frozen filters
        # are unbounded FC outputs); keep operands f32 — the converts fuse
        # into the matmul's operand loads, products are bf16 either way —
        # and round only the output to fp16.
        return jnp.einsum("bhwq,bpq->bhwp", x.astype(jnp.float32),
                          filt.astype(jnp.float32),
                          precision=precision).astype(x.dtype)
    return jnp.einsum("bhwq,bpq->bhwp", x, filt.astype(x.dtype),
                      precision=precision)


def apply_dynamic_filter_3x3(x, filt, precision: Optional[lax.Precision] = None):
    """Per-sample predicted 3x3 conv (KernelFilter_S ablation,
    ``train/style_networks.py:225-239``). `filt` is [B,P,Q,3,3]."""

    def one(xi, fi):
        # fi: [P,Q,kh,kw] -> HWIO [kh,kw,Q,P]
        w = jnp.transpose(fi, (2, 3, 1, 0)).astype(xi.dtype)
        return lax.conv_general_dilated(
            xi[None], w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        )[0]

    if filt.shape[0] == 1 and x.shape[0] != 1:
        filt = jnp.broadcast_to(filt, (x.shape[0],) + filt.shape[1:])
    if x.dtype == jnp.float16:
        # Same fp16 range hazard as apply_dynamic_filter: the predicted
        # kernels are unbounded FC outputs, so compute in f32 and round
        # only the result.
        return jax.vmap(one)(x.astype(jnp.float32),
                             filt.astype(jnp.float32)).astype(x.dtype)
    return jax.vmap(one)(x, filt)
