"""Host-side image <-> model-tensor conversion (numpy, cv2 conventions).

The reference equivalents are numpy2tensor/transform_image and
tensor2numpy/transform_back_image (``test/framework.py:26-49``): cv2 images
are BGR uint8 HWC; the model consumes ImageNet-normalized RGB NHWC.
"""

from __future__ import annotations

import numpy as np

from rerevst_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD


def bgr_to_model(img_bgr: np.ndarray) -> np.ndarray:
    """BGR uint8/float HWC -> normalized RGB float32 [1,H,W,C]."""
    rgb = img_bgr[..., ::-1].astype(np.float32) / 255.0
    out = (rgb - IMAGENET_MEAN) / IMAGENET_STD
    return out[None]


def model_to_bgr(x: np.ndarray) -> np.ndarray:
    """Normalized RGB [N,H,W,C] -> BGR uint8 HWC (first sample).

    Matches transform_back_image + tensor2numpy (``test/framework.py:39-49``)
    followed by cv2.imwrite, whose CV_8U conversion ROUNDS (saturate_cast /
    cvRound) — hence rint, not truncation.
    """
    img = x[0] * IMAGENET_STD + IMAGENET_MEAN
    img = np.clip(img, 0.0, 1.0) * 255.0
    return np.rint(img[..., ::-1]).astype(np.uint8)
