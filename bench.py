"""Benchmark: 512p video stylization throughput on one TPU chip.

Measures the hot loop of the flagship path — Pass 2 of sequence-global
inference (VGG encode + frozen-stats decode) on 512x512 content padded to
640x640 per the reference geometry (``test/generate_real_video.py:66-83``) —
and prints ONE JSON line:

    {"metric": "frames_per_sec_512p", "value": N, "unit": "frames/sec/chip",
     "vs_baseline": N/200, ...}

Baseline: the driver target of 200 frames/sec/chip (BASELINE.json; the
reference repo publishes no numbers).  Flags: --dtype {bf16,f32}, --batch N,
--frames N, --quick.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=96,
                    help="frames per timed repetition")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    if args.quick:
        args.frames, args.reps = 2 * args.batch, 1

    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.models.transformer import (
        collect_stats,
        decode_global,
        encode_content,
        encode_style,
        init_transformer_params,
    )
    from rerevst_tpu.ops.image import padded_size

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = ModelConfig(dtype=dtype)
    h, w = padded_size(args.size, args.size)  # 512 -> 640x640

    params = init_transformer_params(jax.random.PRNGKey(0), cfg,
                                     with_loss_net=False)
    style = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3), dtype) * 0.5
    sample = jax.random.normal(jax.random.PRNGKey(2), (4, h, w, 3), dtype) * 0.5
    batch = jax.random.normal(jax.random.PRNGKey(3),
                              (args.batch, h, w, 3), dtype) * 0.5

    @jax.jit
    def prep(params, style, sample):
        sf = encode_style(params, style, cfg)
        feats = encode_content(params, sample, cfg)
        return sf, collect_stats(params["decoder"], feats, sf, cfg)

    @jax.jit
    def hot(params, frames, sf, stats):
        feats = encode_content(params, frames, cfg, desaturate=True)
        return decode_global(params["decoder"], feats, sf, stats, cfg)

    sf, stats = prep(params, style, sample)

    # Warmup / compile.  NOTE: on the tunneled TPU platform block_until_ready
    # does not actually block, so all timing below uses data-dependent call
    # chains (output fed back as input) closed by a scalar fetch.
    out = hot(params, batch, sf, stats)
    float(jnp.mean(out.astype(jnp.float32)))

    def chain(n):
        t0 = time.perf_counter()
        x = batch
        for _ in range(n):
            x = hot(params, x, sf, stats)
        float(jnp.mean(x.astype(jnp.float32)))
        return time.perf_counter() - t0

    n_iters = max(args.frames // args.batch, 2)
    t1 = min(chain(1) for _ in range(args.reps))
    tn = min(chain(n_iters) for _ in range(args.reps))
    per_call = max(tn - t1, 1e-9) / (n_iters - 1)
    best = per_call / args.batch
    lat = [per_call * 1e3]

    fps = 1.0 / best
    print(json.dumps({
        "metric": "frames_per_sec_512p",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 200.0, 3),
        "batch_latency_ms": round(lat[0], 2),
        "batch": args.batch,
        "dtype": args.dtype,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
