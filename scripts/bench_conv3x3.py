"""Measure conv3x3 formulations on the REAL chip for the two roofline-worst
layers (PERF.md microbench table): 640^2 x 64->64 (18% MFU direct) and
640^2 x 64->3 (2.2 TF/s direct).

    python scripts/bench_conv3x3.py [--batch 16] [--dtype bf16]

Timing uses the tunneled-TPU-safe chained method (data-dependent call chain
closed by a scalar fetch; block_until_ready is a no-op here).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def chain_time(fn, x0, n=8, reps=3):
    def run(k):
        t0 = time.perf_counter()
        x = x0
        for _ in range(k):
            x = fn(x)
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f16", "f32"])
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--tile_h", type=int, default=8)
    args = ap.parse_args()
    dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16,
             "f32": jnp.float32}[args.dtype]

    from rerevst_tpu.kernels.conv3x3 import (
        conv3x3_implicit_gemm,
        conv3x3_nine_shift,
        conv3x3_pairlane,
    )

    B, S = args.batch, args.size
    results = []
    for O in (64, 3):
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, 64), dtype)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, O),
                              dtype) * 0.1
        b = jnp.zeros((O,), dtype)
        gflop = 2 * B * S * S * 9 * 64 * O / 1e9

        def direct(xx):
            y = lax.conv_general_dilated(
                xx, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            # keep the chain shape-stable (64 in, O out)
            return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 64 - O))) \
                if O != 64 else y

        def nineshift(xx):
            y = conv3x3_nine_shift(xx, w, b)
            return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 64 - O))) \
                if O != 64 else y

        def pallas(xx):
            y = conv3x3_implicit_gemm(xx, w, b, tile_h=args.tile_h)
            return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 64 - O))) \
                if O != 64 else y

        def pairlane(xx):
            y = conv3x3_pairlane(xx, w, b, tile_h=args.tile_h)
            return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 64 - O))) \
                if O != 64 else y

        def pairlane_fused(xf):
            # fused-io chain: input AND output stay pair-fused [B,H,W/2,128]
            # (for O=64 the fused output cols pos*64+o ARE the pair-fused
            # layout), so the chain never pays a boundary reshape — the
            # region-integration operating point.
            return conv3x3_pairlane(xf, w, b, tile_h=args.tile_h,
                                    fused_io=True)

        forms = [("direct", direct, x), ("nine_shift", nineshift, x),
                 ("pallas_igemm", pallas, x),
                 ("pallas_pairlane", pairlane, x)]
        if O == 64:
            forms.append(("pallas_pairlane_fused", pairlane_fused,
                          x.reshape(B, S, S // 2, 128)))
        for name, fn, x0 in forms:
            try:
                dt = chain_time(jax.jit(fn), x0)
                results.append({
                    "shape": f"{S}^2x64->{O}", "form": name,
                    "ms": round(dt * 1e3, 2),
                    "ms_per_frame": round(dt * 1e3 / B, 3),
                    "tf_s": round(gflop / dt / 1e3, 1),
                })
                print(json.dumps(results[-1]), flush=True)
            except Exception as e:  # noqa: BLE001 - record and continue
                print(json.dumps({"shape": f"{S}^2x64->{O}", "form": name,
                                  "error": repr(e)[:300]}), flush=True)
    print(json.dumps({"device": str(jax.devices()[0]), "batch": B,
                      "dtype": args.dtype, "results": results}))


if __name__ == "__main__":
    main()
