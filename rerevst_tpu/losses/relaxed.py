"""The Relaxed Style Loss — optimization *inside* the loss.

Re-design of ``train/style_networks.py:594-654``: the style target is allowed
to warp under a learnable smooth flow; 16 SGD(lr=16, momentum=0.9) steps
minimize the style loss w.r.t. the flow against a frozen copy of the current
stylized features, the best iterate is kept, and the final (differentiable)
style loss is computed against the best-warped style.

The reference's Python loop of 16 separate ``backward()`` calls becomes one
``lax.scan`` carrying (flow, momentum, best_flow, best_loss, best_iter); the
whole thing lives inside the outer jitted train step.  Gradients w.r.t.
model params flow ONLY through the final loss's stylized-feature argument
(inner scan sees stop_gradient'ed VGG params/targets, matching the
``.detach()`` usage at ``train/style_networks.py:612-617``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from rerevst_tpu.config import LossConfig, ModelConfig
from rerevst_tpu.losses.perceptual import style_loss
from rerevst_tpu.models.vgg import VggFeatures, vgg_features
from rerevst_tpu.ops.blur import gaussian_blur
from rerevst_tpu.ops.resize import resize_bilinear
from rerevst_tpu.ops.warp import flow_warp


def smooth_flow(flow, h: int, w: int, flow_max: float = 20.0,
                blur_scale: int = 1):
    """Coarse flow -> full-res bounded smooth flow
    (``train/style_networks.py:547-551``): bilinear upsample, tanh x max,
    Gaussian blur 101x101 sigma 50.5.

    ``blur_scale`` > 1 (LossConfig.relaxed_blur_scale): tanh + a
    1/N-scaled blur run at 1/N resolution and the SMOOTHED field is
    upsampled — ~N^3 less blur work, approximate (measured option,
    PERF.md round 5)."""
    if blur_scale > 1:
        ch, cw = h // blur_scale, w // blur_scale
        f = flow if flow.shape[1:3] == (ch, cw) \
            else resize_bilinear(flow, ch, cw)
        f = jnp.tanh(f) * flow_max
        k = max(3, (101 // blur_scale) | 1)  # odd, >= 3
        f = gaussian_blur(f, ksize=k, sigma=50.5 / blur_scale)
        return resize_bilinear(f, h, w)
    f = resize_bilinear(flow, h, w)
    f = jnp.tanh(f) * flow_max
    return gaussian_blur(f, ksize=101, sigma=50.5)


def relaxed_style_loss(vgg_params, style_img, f_styled: VggFeatures,
                       cfg: LossConfig, model_cfg: ModelConfig
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (relaxed_style_loss, ori_style_loss, robust_style_image).

    `f_styled` must carry gradients w.r.t. model params; `style_img` is the
    normalized style batch [B,H,W,3].
    """
    b, h, w, _ = style_img.shape
    prec = None if model_cfg.dtype != jnp.float32 else jax.lax.Precision.HIGHEST

    # Frozen pieces for the inner optimization (reference detaches both the
    # stylized features and the style image).
    vgg_sg = jax.lax.stop_gradient(vgg_params)
    style_sg = jax.lax.stop_gradient(style_img)
    static_target = jax.lax.stop_gradient(f_styled)

    f_style_gt = vgg_features(vgg_params, style_img, "relu4_1", prec)
    ori = style_loss(f_styled, f_style_gt, model_cfg.mean_std_eps)
    ori_sg = jax.lax.stop_gradient(ori)

    # Optional bf16 inner loop (LossConfig.relaxed_inner_dtype): the 16 VGG
    # fwd+bwd passes — the training step's dominant cost — run in bfloat16,
    # while flow/momentum/best-loss bookkeeping, the smooth-flow transform,
    # and the final differentiable loss below stay at full precision.  The
    # inner loop is entirely stop-gradient'ed target *selection*, so this
    # perturbs which flow wins, not the gradient path to the params.
    inner_bf16 = (cfg.relaxed_inner_dtype == "bf16"
                  and model_cfg.dtype != jnp.bfloat16)
    if inner_bf16:
        idt = jnp.bfloat16
        vgg_inner = jax.tree.map(lambda a: a.astype(idt), vgg_sg)
        style_inner = style_sg.astype(idt)
        target_inner = jax.tree.map(lambda a: a.astype(idt), static_target)
        prec_inner = None
    else:
        vgg_inner, style_inner, target_inner, prec_inner = (
            vgg_sg, style_sg, static_target, prec)

    def inner_loss(flow):
        bounded = smooth_flow(flow, h, w, cfg.flow_max,
                              cfg.relaxed_blur_scale)
        warped = flow_warp(style_inner, bounded.astype(style_inner.dtype),
                           mode="bilinear")
        feats = vgg_features(vgg_inner, warped, "relu4_1", prec_inner)
        loss = style_loss(target_inner, feats, model_cfg.mean_std_eps)
        return loss.astype(jnp.float32), bounded

    grad_fn = jax.value_and_grad(inner_loss, has_aux=True)

    flow0 = jnp.zeros((b, h // cfg.flow_scale, w // cfg.flow_scale, 2),
                      jnp.float32)
    best_flow0 = jnp.zeros((b, h, w, 2), jnp.float32)

    def step(carry, i):
        flow, mom, best_flow, best_loss, best_iter = carry
        (loss, bounded), g = grad_fn(flow)
        # torch SGD w/ momentum: buf = m*buf + grad; p -= lr*buf.
        mom = cfg.flow_momentum * mom + g
        flow = flow - cfg.flow_lr * mom
        better = loss < best_loss
        best_flow = jnp.where(better, bounded, best_flow)
        best_loss = jnp.where(better, loss, best_loss)
        best_iter = jnp.where(better, i, best_iter)
        return (flow, mom, best_flow, best_loss, best_iter), None

    carry0 = (flow0, jnp.zeros_like(flow0), best_flow0,
              ori_sg.astype(jnp.float32), jnp.asarray(-1, jnp.int32))
    (flow, _, best_flow, _, best_iter), _ = lax.scan(
        step, carry0, jnp.arange(cfg.flow_iter))

    improved = best_iter >= 0
    robust_style = flow_warp(style_sg, jax.lax.stop_gradient(best_flow),
                             mode="bilinear")
    robust_feats = vgg_features(vgg_sg, robust_style, "relu4_1", prec)
    relaxed = style_loss(f_styled, robust_feats, model_cfg.mean_std_eps)
    final = jnp.where(improved, relaxed, ori)
    robust_out = jnp.where(improved, robust_style, style_sg)
    return final, ori, robust_out
