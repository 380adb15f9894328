"""Temporal-consistency evaluation: E_warp.

The field-standard metric for video style transfer (the quantity the
reference's Compound Regularization trains against — its temporal loss
``train/loss_networks.py:106-111`` is exactly a fake-flow E_warp).  The
reference repo ships no evaluation harness; this one computes

    E_warp = mean_t || M_t * (S_{t+1} - warp(S_t, F_{t->t+1})) ||_1

over consecutive *styled* frames, with flow estimated on the *original*
frames (Farneback, cv2) or supplied (e.g. MPI Sintel ground truth), and an
out-of-frame + photometric validity mask.  Also reports the unstyled-pair
control (the natural lower bound the reference logs as 'temporal GT',
``train/train.py:380-388``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _cv2():
    import cv2

    return cv2


def farneback_flow(prev_bgr: np.ndarray, cur_bgr: np.ndarray) -> np.ndarray:
    """Dense forward flow prev->cur, [H,W,2] (dx, dy)."""
    cv2 = _cv2()
    g0 = cv2.cvtColor(prev_bgr, cv2.COLOR_BGR2GRAY)
    g1 = cv2.cvtColor(cur_bgr, cv2.COLOR_BGR2GRAY)
    return cv2.calcOpticalFlowFarneback(
        g0, g1, None, pyr_scale=0.5, levels=3, winsize=15, iterations=3,
        poly_n=5, poly_sigma=1.2, flags=0)


def backward_warp(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """warp(img)[p] = img[p - flow[p]] with bilinear sampling (cv2.remap)."""
    cv2 = _cv2()
    h, w = flow.shape[:2]
    mx = (np.arange(w)[None, :] - flow[:, :, 0]).astype(np.float32)
    my = (np.arange(h)[:, None] - flow[:, :, 1]).astype(np.float32)
    return cv2.remap(img.astype(np.float32), mx, my, cv2.INTER_LINEAR)


def occlusion_mask(prev_bgr, cur_bgr, flow, thresh: float = 20.0) -> np.ndarray:
    """Validity mask: in-frame warp support AND photometric consistency of
    the *original* frames under the flow (occlusions excluded)."""
    h, w = flow.shape[:2]
    support = backward_warp(np.ones((h, w), np.float32), flow) >= 0.999
    warped_prev = backward_warp(prev_bgr.astype(np.float32), flow)
    err = np.abs(warped_prev - cur_bgr.astype(np.float32)).mean(-1)
    return (support & (err < thresh)).astype(np.float32)


class EwarpAccumulator:
    """Streaming E_warp: push (original, styled) pairs as they come; only
    the previous pair stays in memory — pairs with the batch ``ewarp``
    below (identical math, verified in tests)."""

    def __init__(self):
        self._prev = None  # (original, styled)
        self._total = self._control = self._weight = 0.0
        self.pairs = 0

    def push(self, original: np.ndarray, styled: np.ndarray) -> None:
        if self._prev is not None:
            prev_o, prev_s = self._prev
            flow = farneback_flow(prev_o, original)
            mask = occlusion_mask(prev_o, original, flow)
            m = mask[..., None]
            w = float(mask.sum()) * 3
            if w > 0:
                warped = backward_warp(prev_s.astype(np.float32), flow)
                self._total += float(
                    (np.abs(warped - styled.astype(np.float32)) * m).sum())
                warped_o = backward_warp(prev_o.astype(np.float32), flow)
                self._control += float(
                    (np.abs(warped_o - original.astype(np.float32)) * m).sum())
                self._weight += w
            self.pairs += 1
        self._prev = (original, styled)

    def result(self) -> Dict[str, float]:
        return {
            "ewarp": self._total / max(self._weight, 1.0),
            "ewarp_control": self._control / max(self._weight, 1.0),
            "pairs": self.pairs,
        }


def ewarp(styled: Sequence[np.ndarray], originals: Sequence[np.ndarray],
          flows: Optional[Sequence[np.ndarray]] = None,
          masks: Optional[Sequence[np.ndarray]] = None) -> Dict[str, float]:
    """E_warp over a clip.  `styled`/`originals` are BGR uint8 frame lists.

    Returns {'ewarp', 'ewarp_control', 'pairs'} — values in [0,255] pixel
    units; 'ewarp_control' is the same metric on the original frames (lower
    bound set by flow estimation error).
    """
    assert len(styled) == len(originals) and len(styled) >= 2
    total, control, weight = 0.0, 0.0, 0.0
    for t in range(len(styled) - 1):
        flow = flows[t] if flows is not None else farneback_flow(
            originals[t], originals[t + 1])
        mask = masks[t] if masks is not None else occlusion_mask(
            originals[t], originals[t + 1], flow)
        m = mask[..., None]
        w = float(mask.sum()) * 3
        if w == 0:
            continue
        warped = backward_warp(styled[t].astype(np.float32), flow)
        total += float((np.abs(warped - styled[t + 1].astype(np.float32))
                        * m).sum())
        warped_o = backward_warp(originals[t].astype(np.float32), flow)
        control += float((np.abs(warped_o - originals[t + 1].astype(np.float32))
                          * m).sum())
        weight += w
    return {
        "ewarp": total / max(weight, 1.0),
        "ewarp_control": control / max(weight, 1.0),
        "pairs": len(styled) - 1,
    }
