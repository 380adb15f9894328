"""Per-phase training-step breakdown on the real TPU.

Decomposes one train step at the paper recipe config (batch 4, 256^2 crops,
all losses on — ``/root/reference/README.md:70``) into the phases of
``train/step.py:compute_losses`` + backward + Adam, against the reference's
stated hot loop (the 16-iteration relaxed-style inner optimization,
``/root/reference/train/style_networks.py:594-654``, SURVEY §3.3).

Timing uses data-dependent call chains (profiling.time_fn) because the
tunneled platform's ``block_until_ready`` is a no-op; each phase function
takes the content batch first and closes its chain with a content-shaped
adapter (pure data movement).

Usage: python scripts/profile_train.py [--batch 4] [--size 256]
                                       [--dtype {f32,bf16}] [--remat]
                                       [--inner-dtype {same,bf16}]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rerevst_tpu.config import LossConfig, ModelConfig, TrainConfig
from rerevst_tpu.losses.perceptual import content_loss, style_loss, tv_loss
from rerevst_tpu.losses.relaxed import relaxed_style_loss
from rerevst_tpu.losses.temporal import generate_fake_data, temporal_loss
from rerevst_tpu.models import vgg
from rerevst_tpu.models.layers import precision_for
from rerevst_tpu.models.transformer import (
    decode,
    encode_style,
    init_transformer_params,
)
from rerevst_tpu.ops.image import rgb_to_luma_reversed
from rerevst_tpu.profiling import time_fn
from rerevst_tpu.train.state import init_train_state, make_optimizer
from rerevst_tpu.train.step import compute_losses, make_train_step


def adapter(src, like):
    """Chain-closer: reinterpret `src`'s bytes as `like`'s shape/dtype."""
    n = 1
    for d in like.shape:
        n *= d
    flat = jnp.ravel(src).astype(like.dtype)
    reps = -(-n // flat.shape[0])
    if reps > 1:
        flat = jnp.tile(flat, reps)
    return flat[:n].reshape(like.shape) * 1e-3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--inner-dtype", default="same", choices=["same", "bf16"],
                    help="relaxed-loss inner-loop compute dtype "
                         "(LossConfig.relaxed_inner_dtype)")
    args = ap.parse_args()

    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    cfg = TrainConfig(model=ModelConfig(dtype=dtype),
                      loss=LossConfig(relaxed_inner_dtype=args.inner_dtype),
                      remat=args.remat)
    mcfg, lcfg = cfg.model, cfg.loss
    prec = precision_for(mcfg.dtype, mcfg.precision)
    b, s = args.batch, args.size

    params = init_transformer_params(jax.random.PRNGKey(0), mcfg,
                                     with_loss_net=True)
    content = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, 3),
                                dtype) * 0.5
    style = jax.random.normal(jax.random.PRNGKey(2), (b, s, s, 3),
                              dtype) * 0.5
    key = jax.random.PRNGKey(3)

    results = {}

    def record(name, fn, *fnargs):
        """Time one phase, print it IMMEDIATELY (the tunnel's remote-compile
        service can die on any one large module — one lost phase must not
        lose the ones already measured)."""
        try:
            v = time_fn(fn, *fnargs, iters=args.iters)["per_call_s"]
            results[name] = v
            print(json.dumps({name + "_ms": round(v * 1e3, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001 — report and keep profiling
            print(json.dumps({name: ("FAILED: " + repr(e))[:300]}),
                  flush=True)

    # ---- the production step (fwd + bwd + Adam), the number to decompose
    state = init_train_state(params, cfg)
    step = make_train_step(cfg, params)

    def run_step(c, st):
        st, m = step(st, c, style, key)
        return adapter(m["total"], c), st

    st = state
    _, st = run_step(content, st)  # compile
    import time as _t
    def chain_step(n):
        nonlocal st
        x = content
        t0 = _t.perf_counter()
        for _ in range(n):
            x, st = run_step(x, st)
        float(jnp.sum(x[0, 0, 0]).astype(jnp.float32))
        return _t.perf_counter() - t0
    t1 = min(chain_step(1) for _ in range(3))
    tn = min(chain_step(args.iters) for _ in range(3))
    results["full_step(fwd+bwd+adam)"] = (tn - t1) / max(args.iters - 1, 1)
    print(json.dumps({"full_step(fwd+bwd+adam)_ms":
                      round(results["full_step(fwd+bwd+adam)"] * 1e3, 1)}),
          flush=True)

    # ---- forward only
    @jax.jit
    def fwd(c):
        total, _ = compute_losses(params, c, style, key, cfg)
        return adapter(total, c)

    record("loss_forward", fwd, content)

    # ---- forward + backward (no optimizer)
    @jax.jit
    def fwd_bwd(c):
        def loss_fn(p):
            total, _ = compute_losses(p, c, style, key, cfg)
            return total
        g = jax.grad(loss_fn)(params)
        leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)]
        return adapter(jnp.stack(leaves), c)

    record("loss_fwd+bwd", fwd_bwd, content)

    # ---- phase: content/style encode + styled decode (primal graph head)
    @jax.jit
    def head(c):
        f_content = vgg.encode(params["encoder"], c, prec)
        sf = encode_style(params, style, mcfg)
        styled = decode(params["decoder"], f_content, sf, mcfg)
        return adapter(styled, c)

    record("encode+style_enc+decode", head, content)

    # shared primals for the isolated loss phases
    f_content = vgg.encode(params["encoder"], content, prec)
    sf = encode_style(params, style, mcfg)
    styled = decode(params["decoder"], f_content, sf, mcfg)
    gray_content = rgb_to_luma_reversed(content)

    # ---- phase: loss-net features (styled + gray content) + content loss
    @jax.jit
    def lossnet(c):
        f_styled = vgg.vgg_features(params["vgg_loss"], styled + 0 * c,
                                    "relu4_1", prec)
        f_gt = vgg.vgg_features(params["vgg_loss"], gray_content, "relu4_1",
                                prec)
        return adapter(content_loss(f_styled, f_gt), c)

    record("lossnet_feats+content", lossnet, content)

    # ---- phase: the 16-iteration relaxed inner loop (the reference's
    # dominant cost: 16 x VGG fwd+bwd, style_networks.py:594-654)
    f_styled = vgg.vgg_features(params["vgg_loss"], styled, "relu4_1", prec)

    @jax.jit
    def relaxed(c):
        s_loss, ori, robust = relaxed_style_loss(
            params["vgg_loss"], style + 0 * c, f_styled, lcfg, mcfg)
        return adapter(s_loss + ori, c)

    record(f"relaxed_inner_x{lcfg.flow_iter}", relaxed, content)

    # ---- phase: recon (1 gray-style encode + 2 decodes + L1)
    @jax.jit
    def recon(c):
        rc = decode(params["decoder"], f_content, encode_style(
            params, c, mcfg), mcfg)
        gsf = vgg.encode(params["encoder"], rgb_to_luma_reversed(style), prec)
        rs = decode(params["decoder"], gsf, sf, mcfg)
        r = jnp.mean(jnp.abs(rc - c)) + jnp.mean(jnp.abs(rs - style))
        return adapter(r, c)

    record("recon(2dec+1enc)", recon, content)

    # ---- phase: temporal (fake flow/data + encode + decode + warped L1)
    @jax.jit
    def temporal(c):
        second, flow = generate_fake_data(key, c, lcfg)
        f_second = vgg.encode(params["encoder"], second, prec)
        styled_second = decode(params["decoder"], f_second, sf, mcfg)
        t_loss, _ = temporal_loss(styled, styled_second, flow,
                                  use_warp=lcfg.data_w)
        return adapter(t_loss + tv_loss(styled), c)

    record("temporal+tv", temporal, content)

    # ---- phase: Adam update alone
    opt = make_optimizer(cfg, params)
    grads = jax.tree.map(lambda p: p * 1e-4, params)

    @jax.jit
    def adam(c):
        scaled = jax.tree.map(
            lambda g: g * jnp.mean(c).astype(g.dtype), grads)
        updates, _ = opt.update(scaled, state.opt_state, params)
        leaves = [jnp.sum(x.astype(jnp.float32))
                  for x in jax.tree.leaves(updates)]
        return adapter(jnp.stack(leaves), c)

    record("adam_update", adam, content)

    full = results.get("full_step(fwd+bwd+adam)", float("nan"))
    print(json.dumps({
        "batch": b, "size": s, "dtype": args.dtype,
        "remat": args.remat, "inner_dtype": args.inner_dtype,
        "per_call_ms": {k: round(v * 1e3, 1) for k, v in results.items()},
        "share_of_full": {k: round(v / full, 3) for k, v in results.items()},
        "steps_per_sec": round(1.0 / full, 3),
        "device": str(jax.devices()[0]),
    }, indent=1))


if __name__ == "__main__":
    main()
