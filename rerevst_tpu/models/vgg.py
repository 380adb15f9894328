"""VGG19 feature extractor (first 21 torchvision ``features`` layers).

Three reference networks share this backbone with separate weights:
the content Encoder (``test/style_network_global.py:271-281``), the style
EncoderStyle (``:284-331``) and the frozen loss network Vgg19 (``:238-268``).
Here it is one parameter layout + pure functions; which copy of the weights
you pass in decides which network you get.

Slice boundaries (torchvision features indices):
  relu1_1 = [0,2)   conv1_1
  relu2_1 = [2,7)   conv1_2, pool, conv2_1
  relu3_1 = [7,12)  conv2_2, pool, conv3_1
  relu4_1 = [12,21) conv3_2..conv3_4, pool, conv4_1
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from rerevst_tpu.models.layers import (
    conv2d,
    from_torch_conv,
    init_conv_torch_default,
    max_pool_2x2,
)
from rerevst_tpu.ops.tiling import can_tile_h, tiled_over_h

#: (name, cin, cout) for the 11 convs through conv4_1, in order.
VGG_CONVS = (
    ("conv1_1", 3, 64),
    ("conv1_2", 64, 64),
    ("conv2_1", 64, 128),
    ("conv2_2", 128, 128),
    ("conv3_1", 128, 256),
    ("conv3_2", 256, 256),
    ("conv3_3", 256, 256),
    ("conv3_4", 256, 256),
    ("conv4_1", 256, 512),
)

#: torchvision vgg19.features index of each conv (for checkpoint conversion).
TORCH_FEATURE_INDEX = {
    "conv1_1": 0, "conv1_2": 2, "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14, "conv3_4": 16,
    "conv4_1": 19,
}

#: Pool before these convs (torchvision has MaxPool at indices 4, 9, 18).
_POOL_BEFORE = {"conv2_1", "conv3_1", "conv4_1"}

RELU_TAPS = {
    "relu1_1": "conv1_1",
    "relu2_1": "conv2_1",
    "relu3_1": "conv3_1",
    "relu4_1": "conv4_1",
}


class VggFeatures(NamedTuple):
    """The four relu taps used by every loss/encoder in the reference."""
    relu1_1: jnp.ndarray
    relu2_1: jnp.ndarray
    relu3_1: jnp.ndarray
    relu4_1: jnp.ndarray


def init_vgg_params(key, dtype=jnp.float32, scheme: str = "torch") -> Dict:
    """scheme='torch': nn.Conv2d default (matches an untrained reference —
    but activations shrink ~2x per layer, so deep features are ~1e-4 scale).
    scheme='he_relu': ReLU-gain He-normal — feature magnitudes stay O(1)
    through all 11 convs, which keeps perceptual losses meaningful when no
    pretrained VGG weights are available."""
    keys = jax.random.split(key, len(VGG_CONVS))
    if scheme == "torch":
        return {
            name: init_conv_torch_default(k, 3, 3, cin, cout, dtype=dtype)
            for k, (name, cin, cout) in zip(keys, VGG_CONVS)
        }
    if scheme != "he_relu":
        raise ValueError(scheme)
    import math

    params = {}
    for k, (name, cin, cout) in zip(keys, VGG_CONVS):
        std = math.sqrt(2.0 / (9 * cin))
        params[name] = {
            "w": jax.random.normal(k, (3, 3, cin, cout), dtype) * std,
            "b": jnp.zeros((cout,), dtype),
        }
    return params


def from_torch_features(state_dict, prefix: str = "", dtype=jnp.float32) -> Dict:
    """Convert a torchvision ``vgg19().features`` state_dict slice.

    `state_dict` maps e.g. ``{prefix}0.weight`` -> numpy array (torch OIHW).
    Works for the reference checkpoints' Encoder (``Encoder.slice.<i>``) and
    the torchvision zoo layout alike.
    """
    params = {}
    for name, idx in TORCH_FEATURE_INDEX.items():
        wkey = f"{prefix}{idx}.weight"
        if wkey not in state_dict:
            continue
        params[name] = from_torch_conv(
            state_dict[wkey], state_dict.get(f"{prefix}{idx}.bias"), dtype
        )
    return params


def vgg_features(params: Dict, x, upto: str = "relu4_1",
                 precision=None) -> VggFeatures:
    """Run the backbone, returning all relu taps up to `upto`.

    Missing taps (past `upto`) are None.  relu = plain max(x, 0).
    """
    taps = {}
    h = x
    for name, _, _ in VGG_CONVS:
        if name in _POOL_BEFORE:
            h = max_pool_2x2(h)
        h = conv2d(params[name], h, padding=1, precision=precision)
        h = jnp.maximum(h, 0.0)
        for tap, conv_name in RELU_TAPS.items():
            if conv_name == name:
                taps[tap] = h
        if RELU_TAPS.get(upto) == name:
            break
    return VggFeatures(
        taps.get("relu1_1"), taps.get("relu2_1"),
        taps.get("relu3_1"), taps.get("relu4_1"),
    )


def encode_luma(params: Dict, luma, precision=None) -> jnp.ndarray:
    """Content encoder on the rank-1 (desaturated) input, conv1_1 folded.

    The inference encoder always sees ``RGB2Gray(frame)`` (reference
    ``test/style_network_global.py:487-501``) — every channel is an affine
    image of ONE luma map g: ``x[..,c] = a_c*g + d_c`` with ``a_c = 1/std_c``,
    ``d_c = -mean_c/std_c``.  Linearity of the conv then gives, exactly (up
    to fp reassociation):

        conv1_1(x) = conv3x3(g, w1) + conv3x3(ones, wd) + b
        w1[..,0,o] = sum_c W[..,c,o]*a_c      (a 1-input-channel kernel)
        wd[..,0,o] = sum_c W[..,c,o]*d_c      (the constant term)

    The ones-conv is what zero padding does to the constant term: a 9-region
    piecewise-constant border-correction map, batch-independent ([1,H,W,64],
    ~1/(3B) of the folded conv's cost).  Net effect: 2/3 of conv1_1's FLOPs
    and the full-resolution 3-channel gray broadcast's HBM traffic are gone.
    `luma` is ``ops.image.rgb_to_luma01(frame)`` ([N,H,W,1], range [0,1] —
    f16-safe).
    """
    from jax import lax

    p = params["conv1_1"]
    w = p["w"].astype(jnp.float32)  # [3,3,3,64]
    from rerevst_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

    a = jnp.asarray(1.0 / IMAGENET_STD, jnp.float32)
    d = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, jnp.float32)
    dt = luma.dtype
    w1 = jnp.einsum("hwco,c->hwo", w, a)[:, :, None, :].astype(dt)
    wd = jnp.einsum("hwco,c->hwo", w, d)[:, :, None, :].astype(dt)
    dn = ("NHWC", "HWIO", "NHWC")
    ones = jnp.ones((1,) + luma.shape[1:3] + (1,), dt)
    border = lax.conv_general_dilated(
        ones, wd, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        precision=precision)
    h = lax.conv_general_dilated(
        luma, w1, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        precision=precision)
    h = h + border + p["b"].astype(dt)
    h = jnp.maximum(h, 0.0)
    for name, _, _ in VGG_CONVS[1:]:
        if name in _POOL_BEFORE:
            h = max_pool_2x2(h)
        h = conv2d(params[name], h, padding=1, precision=precision)
        h = jnp.maximum(h, 0.0)
        if name == "conv4_1":
            break
    return h


def encode_pairlane_ok(x) -> bool:
    """Geometry gate for the pair-lane encoder head: even W (lane pairing)
    and H divisible by the kernel's row tile."""
    return x.shape[1] % 8 == 0 and x.shape[2] % 2 == 0


def _encode_pairlane_head(params: Dict, x, precision):
    """conv1_1 -> relu -> conv1_2 -> relu -> 2x2 maxpool with conv1_2 as the
    pair-lane Pallas kernel (kernels/conv3x3.py).  Documented NEGATIVE
    result (off by default): the kernel beats the ISOLATED conv 7.8 vs
    13.9 ms, but in-context the whole head measured +11 ms vs the plain
    path — XLA's fused in-context convs are ~2x their isolated microbench
    (PERF.md round-3 pair-lane section).  The W-pair max of the pool IS the
    lane-half max, so the unfuse costs nothing; f16 sessions run the region
    in bf16 (Mosaic has no f16).  Returns the conv2_1 input (pool applied).
    """
    from jax import lax

    from rerevst_tpu.kernels.conv3x3 import conv3x3_pairlane

    f16 = x.dtype == jnp.float16
    h = conv2d(params["conv1_1"], x, padding=1, precision=precision)
    h = jnp.maximum(h, 0.0)
    if f16:
        h = h.astype(jnp.bfloat16)
    b, hh, ww, _ = h.shape
    h = h.reshape(b, hh, ww // 2, 128)  # contiguous W-pair fuse
    p12 = params["conv1_2"]
    h = conv3x3_pairlane(h, p12["w"].astype(h.dtype),
                         p12.get("b"), fused_io=True)
    h = jnp.maximum(h, 0.0)
    h = jnp.maximum(h[..., :64], h[..., 64:])  # W half of the 2x2 pool
    h = lax.reduce_window(h, -jnp.inf, lax.max, (1, 2, 1, 1),
                          (1, 2, 1, 1), "VALID")  # H half
    return h.astype(x.dtype) if f16 else h


#: H receptive field of the encoder conv1 block in full-resolution rows:
#: conv1_1 (1) + conv1_2 (1) + 2x2-pool alignment — 3, rounded to 4 (even,
#: so slab boundaries stay pool-aligned).  ``head_tiles`` docs below.
_HEAD_HALO = 4


def encode(params: Dict, x, precision=None, packed: bool = False,
           pairlane: bool = False, head_tiles: int = 1) -> jnp.ndarray:
    """Content encoder: features through relu4_1, final map only
    (``test/style_network_global.py:271-281``).

    ``packed=True`` evaluates the conv1 block parity-packed (space-to-depth
    2x: quarter resolution, 4x channels — the MXU-friendly shape for the
    640^2 x 64ch layers) with the unpack absorbed into the following 2x2
    maxpool, which is exactly a max over parity groups.  Equal to the
    direct path up to fp reassociation; requires even H and W (the
    inference geometry is x64-padded, and raw video frames are even)."""
    if head_tiles > 1 and not packed and not pairlane \
            and x.shape[2] % 2 == 0 \
            and can_tile_h(x.shape[1], head_tiles, _HEAD_HALO, (1, 2),
                           align=2):
        # Spatially tiled conv1 block (exact overlap-and-discard,
        # ops/tiling.py): the block's two [B,H,W,64] temps are the encoder
        # half of the true-1080p HBM ceiling (9.5 GB each at batch 12 f16,
        # PERF.md round-4 matrix).  The encoder has no normalization, so
        # the tiling is exact in every mode.
        def _head(xs):
            h = conv2d(params["conv1_1"], xs, padding=1, precision=precision)
            h = jnp.maximum(h, 0.0)
            h = conv2d(params["conv1_2"], h, padding=1, precision=precision)
            h = jnp.maximum(h, 0.0)
            return max_pool_2x2(h)

        h = tiled_over_h(_head, x, head_tiles, _HEAD_HALO, (1, 2))
        for name, _, _ in VGG_CONVS[2:]:
            if name in _POOL_BEFORE and name != "conv2_1":
                h = max_pool_2x2(h)  # pool1 already ran inside the tiles
            h = conv2d(params[name], h, padding=1, precision=precision)
            h = jnp.maximum(h, 0.0)
        return h
    if pairlane and not packed and x.dtype != jnp.float32 \
            and encode_pairlane_ok(x):
        h = _encode_pairlane_head(params, x, precision)
        for name, _, _ in VGG_CONVS[2:]:
            if name in _POOL_BEFORE and name != "conv2_1":
                h = max_pool_2x2(h)
            h = conv2d(params[name], h, padding=1, precision=precision)
            h = jnp.maximum(h, 0.0)
        return h
    if not packed or x.shape[1] % 2 or x.shape[2] % 2:
        return vgg_features(params, x, "relu4_1", precision).relu4_1
    from rerevst_tpu.models.layers import (
        conv3x3_packed,
        max_pool_2x2_packed,
        space_to_depth_2x,
    )

    h = space_to_depth_2x(x)
    h = jnp.maximum(conv3x3_packed(params["conv1_1"], h, precision), 0.0)
    h = jnp.maximum(conv3x3_packed(params["conv1_2"], h, precision), 0.0)
    h = max_pool_2x2_packed(h)  # -> true layout at half res (conv2_1 input)
    for name, _, _ in VGG_CONVS[2:]:
        if name in _POOL_BEFORE and name != "conv2_1":
            h = max_pool_2x2(h)
        h = conv2d(params[name], h, padding=1, precision=precision)
        h = jnp.maximum(h, 0.0)
    return h
