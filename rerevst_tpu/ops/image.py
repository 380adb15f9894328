"""Image tensor transforms (NHWC, RGB).

Covers the reference's ImageNet normalization helpers
(``test/framework.py:26-49``), the reversed-channel desaturation quirk
(``test/style_network_global.py:487-497``), and the reflect-pad/x64 geometry
tool (``test/generate_real_video.py:61-83``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

#: ImageNet statistics in RGB channel order (``test/framework.py:31-32``).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize(img):
    """[0,1] RGB NHWC -> ImageNet-normalized.

    Integer inputs are cast to float32 first (integer arithmetic against the
    float statistics silently produces garbage otherwise).
    """
    if not jnp.issubdtype(img.dtype, jnp.floating):
        img = img.astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


def denormalize(img):
    """ImageNet-normalized NHWC -> [0,1] RGB (no clamp)."""
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return img * std + mean


def rgb_to_luma_reversed(img):
    """Desaturate a *normalized* image, reproducing the reference quirk.

    The reference applies BT.601 luma weights to an RGB tensor with the
    coefficient order reversed — 0.299 lands on blue and 0.114 on red
    (``test/style_network_global.py:487-497``; identical in
    ``train/style_networks.py:518-529``).  The released model was trained with
    this, so checkpoint parity requires it bit-for-bit:

        gray = B*0.299 + G*0.587 + R*0.114

    Input/output are ImageNet-normalized NHWC; the gray value is broadcast to
    all three channels and re-normalized.
    """
    rgb = denormalize(img)
    # NHWC channel order is R,G,B — weights deliberately reversed.
    gray = (
        rgb[..., 2:3] * 0.299 + rgb[..., 1:2] * 0.587 + rgb[..., 0:1] * 0.114
    )
    gray3 = jnp.broadcast_to(gray, rgb.shape)
    return normalize(gray3)


def rgb_to_luma01(img):
    """The reversed-luma map alone: normalized NHWC -> [N,H,W,1] in [0,1].

    ``rgb_to_luma_reversed(img)[..., c] == (rgb_to_luma01(img) - mean_c) /
    std_c`` — i.e. the desaturated image is an exact rank-1 (affine) function
    of this single map.  The encoder exploits that to fold the desaturation
    into conv1_1 (``models/vgg.py:encode_luma``): 1/3 the conv FLOPs and no
    full-resolution 3-channel broadcast ever materializes.
    """
    rgb = denormalize(img)
    return (
        rgb[..., 2:3] * 0.299 + rgb[..., 1:2] * 0.587 + rgb[..., 0:1] * 0.114
    )


def padded_size(h: int, w: int, pad: int = 64, granularity: int = 64) -> Tuple[int, int]:
    """Target (H, W) after reflect-padding: +2*pad then round up to a multiple.

    Mirrors ReshapeTool (``test/generate_real_video.py:66-83``): new_H = H+128
    rounded up to a multiple of 64.  The padded size is fixed after the first
    frame so every frame compiles to the same XLA program.
    """
    new_h = h + 2 * pad
    if new_h % granularity != 0:
        new_h += granularity - new_h % granularity
    new_w = w + 2 * pad
    if new_w % granularity != 0:
        new_w += granularity - new_w % granularity
    return new_h, new_w


def validate_pad_geometry(h: int, w: int, pad: int = 64,
                          granularity: int = 64) -> None:
    """Reject geometries whose symmetric reflect pad exceeds a frame side.

    With small frames (or ``--pad 0`` plus granularity round-up) one side's
    pad can exceed the content dimension; ``jnp.pad(mode='symmetric')``
    raises an opaque error there, and multi-bounce reflection is outside the
    reference's ReshapeTool contract anyway.  Called once per clip when the
    geometry locks — raises a clear ValueError naming the minimum size.
    """
    th, tw = padded_size(h, w, pad, granularity)
    worst_h = max(pad, th - pad - h)
    worst_w = max(pad, tw - pad - w)
    if worst_h > h or worst_w > w:
        raise ValueError(
            f"content {h}x{w} is too small for pad={pad}/granularity="
            f"{granularity}: reflect padding needs every side pad <= the "
            f"frame dimension (this geometry pads {h}x{w} -> {th}x{tw}, "
            f"worst side pads {worst_h}/{worst_w}).  Use a smaller --pad/"
            f"--granularity or content of at least "
            f"{worst_h}x{worst_w} pixels.")


def pad_reflect_multiple(img, pad: int = 64, granularity: int = 64,
                         target_hw: Tuple[int, int] | None = None):
    """Reflect-pad NHWC to the padded size (edge-inclusive reflection).

    cv2.BORDER_REFLECT (``test/generate_real_video.py:81-82``) duplicates the
    edge pixel — numpy/jnp mode='symmetric', NOT mode='reflect'.

    numpy in, numpy out (host-side batch prep must not bounce through the
    device); anything else goes through jnp.pad.
    """
    n, h, w, c = img.shape
    if target_hw is None:
        target_hw = padded_size(h, w, pad, granularity)
    th, tw = target_hw
    pad_fn = np.pad if isinstance(img, np.ndarray) else jnp.pad
    return pad_fn(
        img,
        ((0, 0), (pad, th - pad - h), (pad, tw - pad - w), (0, 0)),
        mode="symmetric",
    )


def crop_back(img, orig_h: int, orig_w: int, pad: int = 64):
    """Undo pad_reflect_multiple (``test/generate_real_video.py:167``)."""
    return img[:, pad : pad + orig_h, pad : pad + orig_w, :]


def to_uint8(img):
    """Normalized NHWC -> uint8 RGB (clamped), for writing out frames.

    Matches transform_back_image (``test/framework.py:44-49``) followed by
    cv2.imwrite, whose CV_8U conversion rounds (cvRound) — hence round before
    the cast.
    """
    x = jnp.clip(denormalize(img), 0.0, 1.0) * 255.0
    return jnp.round(x).astype(jnp.uint8)
