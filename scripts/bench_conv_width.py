"""Does conv efficiency at true-1080p geometry depend on row WIDTH?

PERF.md's round-5 H-tiling section attributes the residual 1080p deficit
(93-94 vs 103.3 Mpix/s at 512p) to "XLA's f16 lowering on 2048-wide rows".
H-tiling keeps W=2048; if the deficit really is width-driven, an exact
overlap-and-discard W-tiling (rows of ~1024, like the efficient 512p case)
would recover it.  This measures the core 3x3 64->64 conv at EQUAL pixel
counts with different W to test that attribution before building anything.

    python scripts/bench_conv_width.py [--dtype f16] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def chain_time(fn, fn_donating, x0, n=6, reps=3):
    # The chained calls donate their input (same shape/dtype out), so the
    # chain runs in two alternating buffers instead of queueing n live
    # intermediates; the first call keeps x0 alive for the next rep.
    def run(k):
        t0 = time.perf_counter()
        x = fn(x0)
        for _ in range(k - 1):
            x = fn_donating(x)
        float(jnp.mean(x[..., :1].astype(jnp.float32)))
        return time.perf_counter() - t0

    run(1)  # compile
    t1 = min(run(1) for _ in range(reps))
    tn = min(run(n) for _ in range(reps))
    return max(tn - t1, 1e-9) / (n - 1)


def main():
    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="f16", choices=["bf16", "f16", "f32"])
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--sweep", default="widths",
                    choices=["widths", "b16", "b1slab"])
    args = ap.parse_args()
    dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16,
             "f32": jnp.float32}[args.dtype]
    B, C = args.batch, args.c

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, C, C), jnp.float32).astype(dtype) * 0.05

    def conv(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    conv_j = jax.jit(conv)
    conv_d = jax.jit(conv, donate_argnums=0)

    if args.sweep == "b1slab":
        # Batch-1 latency hypothesis: the widths sweep showed f16 convs run
        # ~2x faster per pixel at batch >= 8 than at batch <= 4 (the x8
        # f16 batch-layout effect).  A single frame is H-local, so EXACT
        # overlap-and-discard H-slabs can be stacked on the BATCH axis to
        # buy that layout at the cost of halo overlap.  Region under test:
        # conv3x3 -> relu -> conv3x3 -> relu (halo 2), the tail's cost shape.
        w2 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C),
                               jnp.float32).astype(dtype) * 0.05

        def region(x):
            h = jnp.maximum(conv(x), 0.0)
            h = lax.conv_general_dilated(
                h, w2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(h, 0.0)

        def slab_stacked(T, halo=2):
            def fn(x):
                Bx, H, W, Cx = x.shape
                th = H // T
                slab = th + 2 * halo
                starts = [min(max(t * th - halo, 0), H - slab)
                          for t in range(T)]
                xs = jnp.concatenate([x[:, s:s + slab] for s in starts], 0)
                ys = region(xs)
                kept = [ys[t * Bx:(t + 1) * Bx,
                           t * th - starts[t]:t * th - starts[t] + th]
                        for t in range(T)]
                return jnp.concatenate(kept, axis=1)
            return fn

        fns = [("b1 640^2 direct", region, (1, 640, 640, C)),
               ("b1 640^2 slab-stacked T=4", slab_stacked(4), (1, 640, 640, C)),
               ("b1 640^2 slab-stacked T=8", slab_stacked(8), (1, 640, 640, C)),
               ("b1 640^2 slab-stacked T=16", slab_stacked(16), (1, 640, 640, C)),
               ("b8 640^2 direct (fast-layout bound)", region, (8, 640, 640, C)),
               ("b1 1216x2048 direct", region, (1, 1216, 2048, C)),
               ("b1 1216x2048 slab-stacked T=8", slab_stacked(8), (1, 1216, 2048, C))]
        rows = []
        for name, f, shp in fns:
            fj = jax.jit(f)
            fd = jax.jit(f, donate_argnums=0)
            x = jax.random.normal(key, shp, jnp.float32).astype(dtype) * 0.1
            ms = chain_time(fj, fd, x) * 1e3
            del x
            mpix = shp[0] * shp[1] * shp[2] / 1e6
            rows.append({"case": name, "shape": list(shp), "ms": round(ms, 3),
                         "mpix_per_s": round(mpix / (ms / 1e3), 1)})
            print(json.dumps(rows[-1]))
        print(json.dumps({"dtype": args.dtype, "sweep": "b1slab",
                          "rows": rows}))
        return

    if args.sweep == "widths":
        # Equal pixel count (B*1216*2048 per case), varying row width.
        cases = [
            ("H1216_W2048 (1080p padded)", (B, 1216, 2048, C)),
            ("H2432_W1024", (B, 2432, 1024, C)),
            ("H1216_W1024 x2B", (2 * B, 1216, 1024, C)),
            ("H608_W2048 x2B  (H-tiled shape)", (2 * B, 608, 2048, C)),
            ("H1216_W512 x4B", (4 * B, 1216, 512, C)),
            ("H640_W640 @512p-like", (B, 640, 640, C)),
        ]
    else:
        # Operating-point geometries: the shipped 1080p config is batch 16
        # with the tail H-tiled into 608-row slabs; 512p headline is 640^2
        # batch 16.  Varying W at the b16 slab shape tests whether W-tiling
        # would buy anything at the config users actually run.
        cases = [
            ("b16 H608_W2048 (shipped 1080p tail slab)", (16, 608, 2048, C)),
            ("b16 H608_W1024 (W-tiled candidate)", (16, 608, 1024, C)),
            ("b16 H608_W512", (16, 608, 512, C)),
            ("b16 H640_W640 (512p headline)", (16, 640, 640, C)),
            # (16,1216,2048) untiled omitted: 5.1 GB/buffer OOMs the chain
            ("b8 H608_W2048", (8, 608, 2048, C)),
        ]
    rows = []
    for name, shp in cases:
        x = jax.random.normal(key, shp, jnp.float32).astype(dtype) * 0.1
        ms = chain_time(conv_j, conv_d, x) * 1e3
        del x
        mpix = shp[0] * shp[1] * shp[2] / 1e6
        rows.append({"case": name, "shape": list(shp), "ms": round(ms, 3),
                     "mpix_per_s": round(mpix / (ms / 1e3), 1)})
        print(json.dumps(rows[-1]))
    print(json.dumps({"dtype": args.dtype, "batch": B, "sweep": args.sweep,
                      "rows": rows}))


if __name__ == "__main__":
    main()
