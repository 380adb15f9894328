"""Per-stage hot-loop breakdown on the real TPU.

The tunneled platform's ``block_until_ready`` is a no-op, so stages are
timed with data-dependent call chains (profiling.time_fn).  Encoder and
decoder have different in/out shapes; a trivial reshape/tile adapter (pure
data movement, ~MBs — noise next to the ~100 GFLOP stages) closes each
chain so every stage is timed in isolation.

Usage: python scripts/profile_stages.py [--batch 16] [--size 512]
                                        [--dtype {bf16,f16,f32}]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.transformer import (
    SeqStats,
    collect_stats,
    decode_global,
    encode_content,
    encode_style,
    init_transformer_params,
    _kernel_filter_frozen,
    _norm_apply,
    _resblock_global,
)
from rerevst_tpu.models.layers import conv2d, precision_for
from rerevst_tpu.ops.image import padded_size
from rerevst_tpu.profiling import time_fn


def adapter(src, shape, dtype):
    """Cheap chain-closer: reinterpret `src`'s bytes as `shape` (tile or
    truncate as needed).  Pure data movement; keeps the timed chain
    data-dependent without adding compute."""
    n = 1
    for d in shape:
        n *= d
    flat = src.reshape(-1).astype(dtype)
    reps = -(-n // flat.shape[0])
    if reps > 1:
        flat = jnp.tile(flat, reps)
    return flat[:n].reshape(shape) * 1e-3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", default="512",
                    help="content size: N (square) or HxW (e.g. 1080x1920)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bf16",
                    choices=["bf16", "f16", "f32"])
    ap.add_argument("--luma-fold", action="store_true",
                    help="enable the rank-1 luma fold (off by default since "
                         "the round-4 measured negative; mirrors bench.py)")
    ap.add_argument("--outpairs", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--tiles", type=int, default=1,
                    help="spatial H-tiles for the full-res regions "
                         "(ModelConfig.spatial_tiles; mirrors bench.py "
                         "--tiles — needed to profile geometries whose "
                         "untiled decoder stage would OOM, e.g. true-1080p "
                         "batch >= 12)")
    args = ap.parse_args()

    cfg = ModelConfig(dtype={"bf16": jnp.bfloat16, "f16": jnp.float16,
                             "f32": jnp.float32}[args.dtype],
                      luma_fold=args.luma_fold,
                      outpairs=args.outpairs,
                      spatial_tiles=args.tiles)
    prec = precision_for(cfg.dtype, cfg.precision)
    if "x" in str(args.size):
        ch, cw = (int(v) for v in str(args.size).split("x"))
    else:
        ch = cw = int(args.size)
    h, w = padded_size(ch, cw)
    fh, fw = h // 8, w // 8
    b = args.batch

    params = init_transformer_params(jax.random.PRNGKey(0), cfg,
                                     with_loss_net=False)
    style = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3),
                              cfg.dtype) * 0.5
    frames = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 3),
                          cfg.dtype) * 0.5)
    sf = encode_style(params, style, cfg)
    sample = frames[:4]
    feats0 = encode_content(params, sample, cfg)
    stats = collect_stats(params["decoder"], feats0, sf, cfg)
    feats = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (b, fh, fw, 512),
                          cfg.dtype) * 0.5)

    results = {}

    @jax.jit
    def full(x, params, sf, stats):
        f = encode_content(params, x, cfg, desaturate=True)
        return decode_global(params["decoder"], f, sf, stats, cfg)

    r = time_fn(full, frames, params, sf, stats, iters=args.iters)
    results["full"] = r["per_call_s"]

    @jax.jit
    def enc_only(x, params):
        f = encode_content(params, x, cfg, desaturate=True)
        return adapter(f, x.shape, x.dtype)

    r = time_fn(enc_only, frames, params, iters=args.iters)
    results["encoder(+adapter)"] = r["per_call_s"]

    @jax.jit
    def dec_only(f, params, sf, stats):
        y = decode_global(params["decoder"], f, sf, stats, cfg)
        return adapter(y, f.shape, f.dtype)

    r = time_fn(dec_only, feats, params, sf, stats, iters=args.iters)
    results["decoder(+adapter)"] = r["per_call_s"]

    # Decoder sub-stages (each chained at its own resolution).
    pd = params["decoder"]
    filt = stats.filters
    norms = stats.norms

    @jax.jit
    def filters_only(f):
        h_ = _norm_apply(norms["pre"], f)
        h_ = _kernel_filter_frozen(pd["filter1"], h_, filt["f1a"], filt["f1b"], cfg)
        h_ = _kernel_filter_frozen(pd["filter2"], h_, filt["f2a"], filt["f2b"], cfg)
        h_ = _kernel_filter_frozen(pd["filter3"], h_, filt["f3a"], filt["f3b"], cfg)
        return h_

    r = time_fn(filters_only, feats, iters=args.iters)
    results["filter_chain@/8"] = r["per_call_s"]

    m1, m2, m3, m4 = sf.means
    s1, s2, s3, s4 = sf.stds

    @jax.jit
    def res_chain(f):
        h_ = _norm_apply(norms["ada4"], f) * s4 + m4
        h_ = _resblock_global(pd["res4"], h_, norms["res4a"], norms["res4b"], cfg)
        h_ = _norm_apply(norms["ada3"], h_) * s3 + m3
        h_ = _resblock_global(pd["res3"], h_, norms["res3a"], norms["res3b"], cfg)
        h_ = _norm_apply(norms["ada2"], h_) * s2 + m2
        h_ = _resblock_global(pd["res2"], h_, norms["res2a"], norms["res2b"], cfg)
        h_ = _norm_apply(norms["ada1"], h_) * s1 + m1
        y = conv2d(pd["out"], h_, padding=1, precision=prec)
        return adapter(y, f.shape, f.dtype)

    try:
        r = time_fn(res_chain, feats, iters=args.iters)
        results["resblocks+out"] = r["per_call_s"]
    except Exception as e:  # noqa: BLE001 — isolated-stage OOM is a result
        # The hand-assembled chain is UNtiled (decode_global owns the tiled
        # tail), so geometries that need --tiles can OOM here while the
        # 'decoder(+adapter)' row above — the real graph — still times.
        results["resblocks+out"] = None
        print(f"# resblocks+out stage skipped: {type(e).__name__} "
              f"(untiled isolated chain; the decoder row is the tiled "
              f"real graph)", file=sys.stderr)

    per_frame = {k: (v / b * 1e3 if v is not None else None)
                 for k, v in results.items()}
    print(json.dumps({
        "batch": b, "size": args.size, "padded": [h, w],
        "per_call_ms": {k: (round(v * 1e3, 2) if v is not None else None)
                        for k, v in results.items()},
        "per_frame_ms": {k: (round(v, 3) if v is not None else None)
                         for k, v in per_frame.items()},
        "fps_full": round(b / results["full"], 1),
        "device": str(jax.devices()[0]),
    }, indent=1))


if __name__ == "__main__":
    main()
