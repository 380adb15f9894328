"""Probe: can the roofline-worst out conv (640^2 x 64->3, 2.2 TF/s direct —
PERF.md microbench) go faster by zero-padding the OUTPUT channels to a
lane-friendlier count and slicing the 3 real ones back?

Padding filters with zeros is exact (dead outputs are discarded), so unlike
the parity-packing experiment this composes without touching neighbors.

    python scripts/bench_outconv_pad.py [--batch 16] [--dtype f16]

Also probes NCHW dimension numbers for both worst layers (64->64, 64->3) to
check whether the logical layout handed to XLA changes its TPU tiling.
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
        float(jnp.mean(x.reshape(-1)[:1].astype(jnp.float32)))
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
    ap.add_argument("--dtype", default="f16", choices=["bf16", "f16", "f32"])
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()
    dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16,
             "f32": jnp.float32}[args.dtype]
    B, S = args.batch, args.size

    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, 64), dtype)
    results = []

    # --- padded-output-channel sweep for the 64->3 out conv -------------
    for O in (3, 4, 8, 16, 32, 64):
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, O),
                              dtype) * 0.1
        b = jnp.zeros((O,), dtype)

        @jax.jit
        def padded(xx, w=w, b=b, O=O):
            y = lax.conv_general_dilated(
                xx, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            # Chain through a same-shape tensor depending on EVERY output
            # channel (a [..., :1] slice would let XLA dead-code-eliminate
            # the rest of the conv).
            return xx + jnp.mean(y, axis=-1, keepdims=True)

        ms = chain_time(padded, x) * 1e3
        useful_gflop = 2 * B * S * S * 9 * 64 * 3 / 1e9
        results.append({"case": f"outconv O={O}", "ms": round(ms, 2),
                        "useful_tflops": round(useful_gflop / ms, 2)})
        print(results[-1], flush=True)

    # --- NCHW logical layout for both worst layers ----------------------
    x_nchw = jnp.transpose(x, (0, 3, 1, 2))
    for O in (64, 3):
        w = jax.random.normal(jax.random.PRNGKey(1), (O, 64, 3, 3),
                              dtype) * 0.1

        @jax.jit
        def nchw(xx, w=w, O=O):
            y = lax.conv_general_dilated(
                xx, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return xx + jnp.mean(y, axis=1, keepdims=True)

        ms = chain_time(nchw, x_nchw) * 1e3
        gflop = 2 * B * S * S * 9 * 64 * O / 1e9
        results.append({"case": f"NCHW 64->{O}", "ms": round(ms, 2),
                        "tflops": round(gflop / ms, 2)})
        print(results[-1], flush=True)

    print(json.dumps({"batch": B, "size": S, "dtype": args.dtype,
                      "results": results}))


if __name__ == "__main__":
    main()
