"""Compound Regularization: synthetic-motion temporal loss.

JAX re-design of ``train/loss_networks.py:45-145``.  The reference generates
fake flow on the host with numpy/cv2 per step; here the whole thing is
in-graph with ``jax.random`` so the train step stays one fused XLA program:

  fake flow = bilinear-resized coarse Gaussian noise (sigma=motion_level)
              + random integer global shift (+-shift_level)
              + 100x100 box blur                      (:71-86)
  fake data = nearest-warp(first frame) + Gaussian pixel noise (:88-104)
  loss      = L1( nearest-warp(styled first), styled second )  (:106-111)

All warps are the reference's nearest-mode border-padded backward warp.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rerevst_tpu.config import LossConfig
from rerevst_tpu.ops.blur import box_blur
from rerevst_tpu.ops.resize import resize_bilinear
from rerevst_tpu.ops.warp import flow_warp


def generate_fake_flow(key, height: int, width: int,
                       motion_level: float = 8.0,
                       shift_level: int = 10) -> jnp.ndarray:
    """One fake flow field [H, W, 2] (``train/loss_networks.py:71-86``)."""
    if motion_level > 0:
        k1, k2 = jax.random.split(key)
        ch, cw = max(height // 100, 1), max(width // 100, 1)
        coarse = jax.random.normal(k1, (1, ch, cw, 2)) * motion_level
        flow = resize_bilinear(coarse, height, width)
        # python random.randint is inclusive on both ends.
        shift = jax.random.randint(k2, (2,), -shift_level, shift_level + 1)
        flow = flow + shift.astype(flow.dtype)
        flow = box_blur(flow, ksize=100)
    else:
        k2, = jax.random.split(key, 1)
        shift = jax.random.randint(k2, (2,), -shift_level, shift_level + 1)
        flow = jnp.broadcast_to(shift.astype(jnp.float32),
                                (1, height, width, 2))
    return flow[0]


def generate_fake_data(key, first_frame, cfg: LossConfig
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(second_frame, forward_flow) from a single frame
    (``train/loss_networks.py:88-104``).  first_frame: [B,H,W,3] normalized."""
    b, h, w, _ = first_frame.shape
    kf, kn, ks = jax.random.split(key, 3)
    if cfg.data_w:
        flow = generate_fake_flow(kf, h, w, cfg.motion_level, cfg.shift_level)
        flow = jnp.broadcast_to(flow[None], (b, h, w, 2))
        second = flow_warp(first_frame, flow, mode="nearest")
    else:
        flow = jnp.zeros((b, h, w, 2), first_frame.dtype)
        second = first_frame
    if cfg.data_sigma:
        # stddev = noise_level * (1 + U[0,1))  (train/loss_networks.py:63-69)
        std = cfg.noise_level * (1.0 + jax.random.uniform(ks, ()))
        second = second + jax.random.normal(kn, second.shape,
                                            second.dtype) * std
    return second, flow


def temporal_loss(styled_first, styled_second, flow, use_warp: bool = True):
    """L1 between warped styled-first and styled-second
    (``train/loss_networks.py:106-111``); returns (loss, warped_first)."""
    warped = flow_warp(styled_first, flow, mode="nearest") if use_warp \
        else styled_first
    return jnp.mean(jnp.abs(warped - styled_second)), warped


def temporal_loss_mpi(new_cur_frame, pre_frame, backward_flow, backward_mask):
    """Figure-16 ablation, MPI Sintel ground-truth flow
    (``train/loss_networks.py:117-130``)."""
    fake_pre = flow_warp(new_cur_frame, backward_flow, mode="nearest")
    fake_pre = fake_pre * backward_mask
    pre = pre_frame * backward_mask
    return jnp.mean(jnp.abs(fake_pre - pre)), fake_pre


def temporal_loss_video(cur_frame, pre_frame, forward_flow, forward_mask):
    """Figure-16 ablation, real-video flow
    (``train/loss_networks.py:132-145``)."""
    fake_cur = flow_warp(pre_frame, forward_flow, mode="nearest")
    fake_cur = fake_cur * forward_mask
    cur = cur_frame * forward_mask
    return jnp.mean(jnp.abs(fake_cur - cur)), fake_cur
