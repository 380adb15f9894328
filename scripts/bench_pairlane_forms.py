"""Pair-fused boundary-layer formulations: measure the integration pieces.

    python scripts/bench_pairlane_forms.py [--batch 16] [--dtype bf16]

Pieces measured on the real chip (640^2, the roofline-worst geometry):
  reshape            [B,H,W,64] <-> [B,H,W/2,128] standalone round trip
  s2w4_64            pure-XLA pair-fused conv: [3,4,64,128] stride (1,2)
                     (output IS the pair-fused layout; chain stays fused)
  s2w4_in3           conv1_1 producer emitting pair-fused: [3,4,3,128]
  pallas_fused       the Pallas pair-lane kernel, fused chain (reference pt)
  outconv_fused      pair-lane out conv (O=3) on a fused chain
  pool_fused         lane-half max + H-pool on fused layout vs reduce_window
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

    run(1)
    t1 = min(run(1) for _ in range(reps))
    tn = min(run(n) for _ in range(reps))
    return max(tn - t1, 1e-9) / (n - 1)


def s2w4_kernel(w):
    """[3,3,C,O] -> [3,4,C,2O] stride-(1,2) kernel whose output cols are
    (rx*O+o) — i.e. the pair-fused layout of the SAME conv."""
    C, O = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 4, C, 2 * O), w.dtype)
    k = k.at[:, 0:3, :, 0:O].set(w)      # rx=0: taps j=dx
    k = k.at[:, 1:4, :, O:2 * O].set(w)  # rx=1: taps j=dx+1
    return k


def main():
    import sys
    sys.path.insert(0, ".")
    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f16", "f32"])
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()
    dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16,
             "f32": jnp.float32}[args.dtype]
    B, S = args.batch, args.size

    from rerevst_tpu.kernels.conv3x3 import conv3x3_pairlane

    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, 64), dtype)
    xf = x.reshape(B, S, S // 2, 128)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64), dtype) * 0.1
    w3 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 64, 3), dtype) * 0.1
    img = jax.random.normal(jax.random.PRNGKey(3), (B, S, S, 3), dtype)
    w11 = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 3, 64), dtype) * 0.1

    out = {}

    def rec(name, fn, x0):
        try:
            dt = chain_time(jax.jit(fn), x0)
            out[name] = round(dt * 1e3, 2)
            print(json.dumps({name: out[name]}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({name: repr(e)[:200]}), flush=True)

    # standalone fuse/unfuse round trip (the boundary tax)
    rec("reshape_roundtrip",
        lambda v: v.reshape(B, S, S // 2, 128).reshape(B, S, S, 64) * 1.0001,
        x)

    # pure-XLA pair-fused 64->64 (fused chain: in/out both [B,S,S/2,128])
    k64 = s2w4_kernel(w)

    def s2w4_64(vf):
        v = vf.reshape(B, S, S, 64)
        return lax.conv_general_dilated(
            v, k64, (1, 2), ((1, 1), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    rec("s2w4_64_fusedchain", s2w4_64, xf)

    # XLA direct for reference in this session
    rec("direct_64", lambda v: lax.conv_general_dilated(
        v, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), x)

    # Pallas pair-lane fused chain (reference point from bench_conv3x3)
    rec("pallas_fused", lambda vf: conv3x3_pairlane(
        vf, w, tile_h=8, fused_io=True), xf)

    # conv1_1 producers: direct + reshape vs s2w4 pair-fused emit
    def conv11_reshape(im):
        y = lax.conv_general_dilated(
            im, w11, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(B, S, S // 2, 128)
        # chain closure: back to an image-like tensor
        return im * (1 + 1e-6 * jnp.mean(y[..., :1], axis=-1, keepdims=True))

    def conv11_s2w4(im):
        k = s2w4_kernel(w11)
        y = lax.conv_general_dilated(
            im, k, (1, 2), ((1, 1), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return im * (1 + 1e-6 * jnp.mean(y[..., :1], axis=-1, keepdims=True))

    rec("conv11_direct_reshape", conv11_reshape, img)
    rec("conv11_s2w4", conv11_s2w4, img)

    # out conv (64->3) on a fused chain: pallas pairlane vs unfuse+direct
    def outconv_pallas(vf):
        y = conv3x3_pairlane(vf, w3, tile_h=8, fused_io=True)
        # keep chain fused-shaped
        return vf * (1 + 1e-6 * jnp.mean(y[..., :1], axis=-1, keepdims=True))

    def outconv_unfuse_direct(vf):
        v = vf.reshape(B, S, S, 64)
        y = lax.conv_general_dilated(
            v, w3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return vf * (1 + 1e-6 * jnp.mean(
            y[..., :1], axis=-1, keepdims=True).reshape(B, S, S // 2, 1))

    def outconv_s2w4(vf):
        v = vf.reshape(B, S, S, 64)
        y = lax.conv_general_dilated(
            v, s2w4_kernel(w3), (1, 2), ((1, 1), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return vf * (1 + 1e-6 * jnp.mean(y[..., :1], axis=-1, keepdims=True))

    rec("outconv_pallas_fused", outconv_pallas, xf)
    rec("outconv_unfuse_direct", outconv_unfuse_direct, xf)
    rec("outconv_s2w4_unfused_in", outconv_s2w4, xf)

    # maxpool: fused lane-half max + H pool vs unfuse + reduce_window
    def pool_fused(vf):
        v = jnp.maximum(vf[..., :64], vf[..., 64:])  # W-pair max
        y = lax.reduce_window(v, -jnp.inf, lax.max, (1, 2, 1, 1),
                              (1, 2, 1, 1), "VALID")  # H pool
        # back up to chain shape
        return jnp.concatenate([y, y], -1).repeat(2, axis=1) * 0.5 + vf * 0.5

    def pool_direct(vf):
        v = vf.reshape(B, S, S, 64)
        y = lax.reduce_window(v, -jnp.inf, lax.max, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
        y = y.repeat(2, axis=1).repeat(2, axis=2)
        return y.reshape(B, S, S // 2, 128) * 0.5 + vf * 0.5

    rec("pool_fused_chain", pool_fused, xf)
    rec("pool_direct_chain", pool_direct, xf)

    print(json.dumps({"device": str(jax.devices()[0]), "batch": B,
                      "dtype": args.dtype, "ms": out}))


if __name__ == "__main__":
    main()
