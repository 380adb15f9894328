"""Inside ONE relaxed-style inner iteration: where do the milliseconds go?

``scripts/profile_train.py`` (round 4) showed the 16-iteration inner scan
is ~52% of the improved training step but never decomposed one iteration.
This times each piece of the scan body (``losses/relaxed.py:81-110``) in
isolation on the real chip, fwd and fwd+bwd (the scan differentiates the
whole body w.r.t. the coarse flow):

- vgg_relu4_1        — the 8-conv VGG trunk on the warped style
- smooth_flow        — bilinear upsample + tanh + TWO 101-tap HIGHEST
                       depthwise blurs (ops/blur.py) at FULL resolution
- flow_warp          — bilinear grid sample
- style_loss         — per-tap mean/std L2
- inner_step_full    — the assembled value_and_grad body (what the scan
                       actually runs 16x)

Usage: python scripts/profile_relaxed.py [--batch 4] [--size 256]
           [--dtype f32] [--inner-dtype {same,bf16}] [--iters 16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rerevst_tpu.config import LossConfig, ModelConfig
from rerevst_tpu.losses.perceptual import style_loss
from rerevst_tpu.losses.relaxed import smooth_flow
from rerevst_tpu.models.transformer import init_transformer_params
from rerevst_tpu.models.vgg import vgg_features
from rerevst_tpu.ops.warp import flow_warp
from rerevst_tpu.profiling import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--inner-dtype", default="same",
                    choices=["same", "bf16"])
    args = ap.parse_args()

    mcfg = ModelConfig(dtype=jnp.float32 if args.dtype == "f32"
                       else jnp.bfloat16)
    lcfg = LossConfig(relaxed_inner_dtype=args.inner_dtype)
    b, hw = args.batch, args.size
    prec = (jax.lax.Precision.HIGHEST if mcfg.dtype == jnp.float32
            else None)

    inner_bf16 = (lcfg.relaxed_inner_dtype == "bf16"
                  and mcfg.dtype != jnp.bfloat16)
    idt = jnp.bfloat16 if inner_bf16 else mcfg.dtype
    iprec = None if inner_bf16 else prec

    params = init_transformer_params(jax.random.PRNGKey(0), mcfg,
                                     with_loss_net=True)
    vgg_p = jax.tree.map(lambda a: a.astype(idt), params["vgg_loss"])
    style = (jax.random.normal(jax.random.PRNGKey(1), (b, hw, hw, 3)) * 0.5
             ).astype(idt)
    target = jax.tree.map(
        jax.lax.stop_gradient,
        vgg_features(vgg_p, style, "relu4_1", iprec))
    flow0 = jnp.zeros((b, hw // lcfg.flow_scale, hw // lcfg.flow_scale, 2),
                      jnp.float32)
    bounded0 = jnp.zeros((b, hw, hw, 2), jnp.float32)

    results = {}

    def tm(name, fn, *xs):
        r = time_fn(jax.jit(fn), *xs, iters=args.iters)
        results[name] = round(r["per_call_s"] * 1e3, 3)

    # --- pieces, forward ---
    tm("vgg_relu4_1 fwd",
       lambda s: jnp.sum(vgg_features(vgg_p, s, "relu4_1", iprec)[-1]
                         .astype(jnp.float32)), style)
    tm("smooth_flow fwd",
       lambda f: jnp.sum(smooth_flow(f, hw, hw, lcfg.flow_max)), flow0)
    tm("flow_warp fwd",
       lambda s, f: jnp.sum(flow_warp(s, f.astype(s.dtype),
                                      mode="bilinear")
                            .astype(jnp.float32)), style, bounded0)
    tm("style_loss fwd",
       lambda s: style_loss(
           target, vgg_features(vgg_p, s, "relu4_1", iprec),
           mcfg.mean_std_eps).astype(jnp.float32), style)

    # --- pieces, fwd+bwd (w.r.t. their flow/style inputs, like the scan) ---
    tm("vgg+loss fwd+bwd(style)",
       jax.grad(lambda s: style_loss(
           target, vgg_features(vgg_p, s, "relu4_1", iprec),
           mcfg.mean_std_eps).astype(jnp.float32)), style)
    tm("smooth_flow fwd+bwd(flow)",
       jax.grad(lambda f: jnp.sum(smooth_flow(f, hw, hw, lcfg.flow_max))),
       flow0)
    tm("warp fwd+bwd(flow)",
       jax.grad(lambda f: jnp.sum(
           flow_warp(style, smooth_flow(f, hw, hw, lcfg.flow_max)
                     .astype(style.dtype), mode="bilinear")
           .astype(jnp.float32))), flow0)

    # --- the assembled scan body (reference recipe and the coarse-blur
    # lever, LossConfig.relaxed_blur_scale) ---
    def make_inner(blur_scale):
        def inner_loss(flow):
            bounded = smooth_flow(flow, hw, hw, lcfg.flow_max, blur_scale)
            warped = flow_warp(style, bounded.astype(style.dtype),
                               mode="bilinear")
            feats = vgg_features(vgg_p, warped, "relu4_1", iprec)
            return style_loss(target, feats,
                              mcfg.mean_std_eps).astype(jnp.float32)
        return inner_loss

    tm("inner_step fwd+bwd (scan body)", jax.grad(make_inner(1)), flow0)
    tm("inner_step fwd+bwd (blur_scale=4)", jax.grad(make_inner(4)), flow0)
    tm("inner_step fwd+bwd (blur_scale=8)", jax.grad(make_inner(8)), flow0)
    tm("smooth_flow fwd+bwd (blur_scale=8)",
       jax.grad(lambda f: jnp.sum(smooth_flow(f, hw, hw, lcfg.flow_max,
                                              8))), flow0)

    print(json.dumps({
        "batch": b, "size": hw, "dtype": args.dtype,
        "inner_dtype": args.inner_dtype,
        "per_call_ms": results,
        "scan16_projection_ms": round(
            results["inner_step fwd+bwd (scan body)"] * 16, 1),
        "device": str(jax.devices()[0]),
    }, indent=1))


if __name__ == "__main__":
    main()
