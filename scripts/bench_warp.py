"""flow_warp formulation microbench on the real chip.

`scripts/profile_relaxed.py` (round 5) showed the bilinear flow warp —
NOT the 101-tap blurs — rivals the whole VGG fwd+bwd inside one relaxed
inner iteration (12.1 ms fwd / 21.7 ms fwd+bwd vs 20.3 ms for VGG+loss at
batch 4, 256², f32).  The baseline does FOUR independent flattened gathers
of [B, HW, 3] rows — 3/128 lane utilization per gathered row on TPU.
Variants measured here:

- shipped   — ops/warp.py flow_warp (since round 5: the fused single
              gather below for narrow channels)
- gather4   — the pre-round-5 formulation: four independent clipped
              corner gathers (kept here as the A/B control)
- fused1    — ONE gather over a pre-shifted 4C-channel concat (corner
              (dy,dx) lives at channel block [dy*2+dx]): same bytes, 1/4
              the gather ops, 12/128 lanes per row
- fused1p16 — fused1 with channels padded 12 -> 16 (power-of-2 lane block)
- rowcol    — take_along_axis down H with broadcast (q,c)-aligned minor
              dims, then down W (exactness NOT required here — this is a
              lowering-shape probe, labeled approximate)

Each is timed fwd and fwd+bwd (w.r.t. the flow, like the inner scan).

Usage: python scripts/bench_warp.py [--batch 4] [--size 256] [--iters 16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rerevst_tpu.ops.warp import flow_warp
from rerevst_tpu.profiling import time_fn


def _coords(x, flow):
    n, h, w, _ = x.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    vx = xs - flow[..., 0].astype(jnp.float32)
    vy = ys - flow[..., 1].astype(jnp.float32)
    # torch align_corners=False unnormalize of the reference grid.
    px = jnp.clip((2.0 * vx / max(w - 1, 1)) * w / 2.0 - 0.5, 0.0, w - 1)
    py = jnp.clip((2.0 * vy / max(h - 1, 1)) * h / 2.0 - 0.5, 0.0, h - 1)
    return px, py


def warp_gather4(x, flow):
    """Four independent clipped corner gathers (the pre-round-5 shipped
    form, ops/warp.py history) — the A/B control for fused1."""
    from rerevst_tpu.ops.warp import _gather_2d

    n, h, w, c = x.shape
    px, py = _coords(x, flow)
    ix0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
    iy0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
    ix1 = jnp.clip(ix0 + 1, 0, w - 1)
    iy1 = jnp.clip(iy0 + 1, 0, h - 1)
    fx = (px - ix0)[..., None]
    fy = (py - iy0)[..., None]
    v00 = _gather_2d(x, iy0, ix0)
    v01 = _gather_2d(x, iy0, ix1)
    v10 = _gather_2d(x, iy1, ix0)
    v11 = _gather_2d(x, iy1, ix1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return (top * (1.0 - fy) + bot * fy).astype(x.dtype)


def warp_fused1(x, flow, pad_c: int = 0):
    """One gather over the 4-corner channel concat."""
    n, h, w, c = x.shape
    px, py = _coords(x, flow)
    ix0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
    iy0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
    fx = (px - ix0)[..., None]
    fy = (py - iy0)[..., None]

    # shifted copies: corner (dy,dx) of pixel (y,x) == pixel (y,x) of the
    # copy shifted up/left by (dy,dx) with edge clamping (border padding).
    def shift(dy, dx):
        s = x
        if dy:
            s = jnp.concatenate([s[:, dy:], s[:, -1:]], axis=1)
        if dx:
            s = jnp.concatenate([s[:, :, dx:], s[:, :, -1:]], axis=2)
        return s

    stack = jnp.concatenate([shift(0, 0), shift(0, 1), shift(1, 0),
                             shift(1, 1)], axis=-1)  # [n,h,w,4c]
    if pad_c:
        stack = jnp.pad(stack, ((0, 0),) * 3 + ((0, pad_c),))
    cc = stack.shape[-1]
    flat = stack.reshape(n, h * w, cc)
    idx = (iy0 * w + ix0).reshape(n, -1, 1)
    g = jnp.take_along_axis(flat, idx, axis=1).reshape(n, h, w, cc)
    v00, v01, v10, v11 = (g[..., :c], g[..., c:2 * c],
                          g[..., 2 * c:3 * c], g[..., 3 * c:4 * c])
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return (top * (1.0 - fy) + bot * fy).astype(x.dtype)


def warp_rowcol(x, flow):
    """Axis-aligned two-stage gather (approximate — lowering probe only)."""
    n, h, w, c = x.shape
    px, py = _coords(x, flow)
    ix0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
    iy0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
    rows = jnp.take_along_axis(
        x, jnp.broadcast_to(iy0[..., None], (n, h, w, c)), axis=1)
    return jnp.take_along_axis(
        rows, jnp.broadcast_to(ix0[..., None], (n, h, w, c)), axis=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    b, hw = args.batch, args.size

    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, 3),
                          jnp.float32) * 0.5
    flow = jax.random.normal(jax.random.PRNGKey(1), (b, hw, hw, 2),
                             jnp.float32) * 5.0

    results = {}

    def tm(name, fn):
        r = time_fn(jax.jit(fn), flow, iters=args.iters)
        results[name] = round(r["per_call_s"] * 1e3, 3)

    variants = {
        "shipped": lambda f: flow_warp(x, f, mode="bilinear"),
        "gather4": lambda f: warp_gather4(x, f),
        "fused1": lambda f: warp_fused1(x, f),
        "fused1p16": lambda f: warp_fused1(x, f, pad_c=4),
        "rowcol(approx)": lambda f: warp_rowcol(x, f),
    }
    for name, fn in variants.items():
        tm(f"{name} fwd",
           lambda f, fn=fn: jnp.sum(fn(f).astype(jnp.float32)))
        tm(f"{name} fwd+bwd(flow)",
           jax.grad(lambda f, fn=fn: jnp.sum(fn(f).astype(jnp.float32))))

    # Composed chain exactly like the relaxed inner loop's gradient
    # (profile_relaxed's "warp fwd+bwd(flow)" row): coarse flow ->
    # smooth_flow (upsample+tanh+101-tap blur) -> warp, differentiated
    # w.r.t. the COARSE flow.  A/B: autodiff vs the analytic const-src
    # custom VJP (style image is a constant there).
    from rerevst_tpu.config import LossConfig
    from rerevst_tpu.losses.relaxed import smooth_flow
    from rerevst_tpu.ops.warp import flow_warp_const_src

    lcfg = LossConfig()
    coarse = jax.random.normal(jax.random.PRNGKey(2),
                               (b, hw // lcfg.flow_scale,
                                hw // lcfg.flow_scale, 2), jnp.float32)

    def composed(warp_fn):
        def loss(f):
            bounded = smooth_flow(f, hw, hw, lcfg.flow_max)
            return jnp.sum(warp_fn(x, bounded).astype(jnp.float32))
        return jax.grad(loss)

    for name, wfn in (("autodiff", lambda xx, ff: flow_warp(xx, ff)),
                      ("constvjp", flow_warp_const_src)):
        r = time_fn(jax.jit(composed(wfn)), coarse, iters=args.iters)
        results[f"smooth+warp bwd(coarse) {name}"] = round(
            r["per_call_s"] * 1e3, 3)
    ga = jax.jit(composed(lambda xx, ff: flow_warp(xx, ff)))(coarse)
    gc = jax.jit(composed(flow_warp_const_src))(coarse)
    cerr = float(jnp.abs(ga - gc).max() / (jnp.abs(ga).max() + 1e-12))
    results["constvjp_grad_rel_err"] = cerr

    # exactness of fused1 vs the shipped path
    import numpy as np

    ref = warp_gather4(x, flow)
    got = warp_fused1(x, flow)
    err = float(jnp.abs(ref - got).max())
    print(json.dumps({
        "batch": b, "size": hw,
        "per_call_ms": results,
        "fused1_max_abs_err_vs_gather4": err,
        "device": str(jax.devices()[0]),
    }, indent=1))


if __name__ == "__main__":
    main()
