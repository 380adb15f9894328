"""SSIM (Wang et al. 2004) + temporal (warped) SSIM for styled clips.

The reference ships no quantitative harness (SURVEY §4); alongside E_warp
(`eval/ewarp.py`, L1 form) the video style transfer literature also reports
temporal consistency as SSIM between the flow-warped previous styled frame
and the current one.  This module implements the standard gaussian-window
SSIM (11x11, sigma 1.5, K1=0.01, K2=0.03, L=255 — the MATLAB/paper
configuration) on the host, cv2-backed, and a clip-level temporal SSIM that
reuses ewarp's Farneback flow + occlusion masking.

Exactness is pinned against a brute-force per-window oracle in
tests/test_eval_ssim.py (no trusted SSIM package ships in this image).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from rerevst_tpu.eval.ewarp import (
    backward_warp,
    farneback_flow,
    occlusion_mask,
)

_K1, _K2, _L = 0.01, 0.03, 255.0
_WIN, _SIGMA = 11, 1.5


def _cv2():
    import cv2

    return cv2


def _blur(x: np.ndarray) -> np.ndarray:
    """11x11 gaussian window, sigma 1.5 — cv2's kernel matches the paper's
    (normalized separable gaussian).  BORDER_REFLECT keeps edge windows
    normalized instead of zero-leaking."""
    cv2 = _cv2()
    return cv2.GaussianBlur(x, (_WIN, _WIN), _SIGMA,
                            borderType=cv2.BORDER_REFLECT)


def ssim_map(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-pixel SSIM map of two images (uint8 or float in [0,255]).

    Multi-channel inputs average the per-channel maps (the common
    color-SSIM convention).  Returns float32 [H,W].
    """
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    c1, c2 = (_K1 * _L) ** 2, (_K2 * _L) ** 2
    maps = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mx, my = _blur(x), _blur(y)
        mx2, my2, mxy = mx * mx, my * my, mx * my
        sx = _blur(x * x) - mx2
        sy = _blur(y * y) - my2
        sxy = _blur(x * y) - mxy
        maps.append(((2 * mxy + c1) * (2 * sxy + c2))
                    / ((mx2 + my2 + c1) * (sx + sy + c2)))
    return np.mean(maps, axis=0).astype(np.float32)


def ssim(a: np.ndarray, b: np.ndarray,
         mask: Optional[np.ndarray] = None) -> float:
    """Mean SSIM; with `mask` [H,W], a mask-weighted mean (temporal use)."""
    m = ssim_map(a, b)
    if mask is None:
        return float(m.mean())
    w = float(mask.sum())
    return float((m * mask).sum() / max(w, 1.0))


class TemporalSSIMAccumulator:
    """Streaming temporal SSIM: push (original, styled) pairs as they come;
    only the previous pair stays in memory (mirrors EwarpAccumulator, same
    flow/mask, SSIM instead of L1)."""

    def __init__(self):
        self._prev = None
        self._total = self._control = self._weight = 0.0
        self.pairs = 0

    def push(self, original: np.ndarray, styled: np.ndarray) -> None:
        if self._prev is not None:
            prev_o, prev_s = self._prev
            flow = farneback_flow(prev_o, original)
            mask = occlusion_mask(prev_o, original, flow)
            w = float(mask.sum())
            if w > 0:
                warped = backward_warp(prev_s.astype(np.float32), flow)
                self._total += ssim(warped, styled, mask) * w
                warped_o = backward_warp(prev_o.astype(np.float32), flow)
                self._control += ssim(warped_o, original, mask) * w
                self._weight += w
            self.pairs += 1
        self._prev = (original, styled)

    def result(self) -> Dict[str, float]:
        return {
            "tssim": self._total / max(self._weight, 1.0),
            "tssim_control": self._control / max(self._weight, 1.0),
        }


def temporal_ssim(styled: Sequence[np.ndarray],
                  originals: Sequence[np.ndarray],
                  flows: Optional[Sequence[np.ndarray]] = None,
                  masks: Optional[Sequence[np.ndarray]] = None
                  ) -> Dict[str, float]:
    """Clip-level temporal SSIM: SSIM(warp(S_t), S_{t+1}) under the same
    Farneback flow + occlusion masking as E_warp (higher is better, 1.0 =
    perfectly consistent).  Also reports the unstyled-pair control."""
    assert len(styled) == len(originals) and len(styled) >= 2
    total = control = weight = 0.0
    for t in range(len(styled) - 1):
        flow = flows[t] if flows is not None else farneback_flow(
            originals[t], originals[t + 1])
        mask = masks[t] if masks is not None else occlusion_mask(
            originals[t], originals[t + 1], flow)
        w = float(mask.sum())
        if w == 0:
            continue
        warped = backward_warp(styled[t].astype(np.float32), flow)
        total += ssim(warped, styled[t + 1], mask) * w
        warped_o = backward_warp(originals[t].astype(np.float32), flow)
        control += ssim(warped_o, originals[t + 1], mask) * w
        weight += w
    return {
        "tssim": total / max(weight, 1.0),
        "tssim_control": control / max(weight, 1.0),
        "pairs": len(styled) - 1,
    }
