"""Backward warping via grid sampling (NHWC).

JAX re-implementation of torch ``F.grid_sample`` (border padding, bilinear and
nearest, align_corners=False — the default that actually executes in the
reference) plus the reference's flow-warp wrapper:

* bilinear flow warp used by the relaxed style loss
  (``train/style_networks.py:27-44``),
* nearest flow warp used by the Compound Regularization temporal loss
  (``train/loss_networks.py:20-38``).

The gather is expressed with ``jnp.take_along_axis`` over flattened spatial
indices, which XLA lowers to a single fused gather on TPU.

Round-5 formulation (measured on chip, ``scripts/bench_warp.py``): for the
narrow-channel images this op actually warps (C=3 everywhere in the
reference recipe), FOUR independent gathers of [B, HW, C] rows waste the
TPU's 128-lane gather minor dimension (3/128 lanes per gathered row).  The
bilinear path instead gathers ONCE over a 4C-channel concat of the four
corner-shifted copies of ``x`` — corner (dy, dx) of pixel (y, x) is pixel
(y, x) of the copy shifted up/left by (dy, dx) with edge clamping, which
reproduces the border-padded corner loads element-for-element (bit-exact
vs the 4-gather form, max |err| 0.0 on chip; the microbench measured
11.7 -> 3.7 ms fwd, 12.7 -> 4.1 ms fwd+bwd(flow) at batch 4 x 256^2 x 3
on TPU v5 lite).  Wide-channel inputs (4C > 128 lanes) keep the
4-gather form: the fusion's lane win vanishes once rows fill lane blocks,
while its 4x corner-concat footprint remains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """Map normalized coords [-1, 1] to pixel positions, torch semantics."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(x, iy, ix):
    """out[n, p, q, c] = x[n, iy[n,p,q], ix[n,p,q], c] (indices pre-clipped)."""
    n, h, w, c = x.shape
    flat = x.reshape(n, h * w, c)
    idx = (iy * w + ix).reshape(n, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(n, iy.shape[1], iy.shape[2], c)


def _gather_corners(x, iy0, ix0):
    """All four bilinear corners in ONE gather over a 4C corner concat.

    Returns (v00, v01, v10, v11) with v[dy][dx][n,p,q,c] ==
    x[n, clip(iy0+dy, 0, h-1), clip(ix0+dx, 0, w-1), c] — identical
    elements to four separate clipped gathers, loaded from shifted copies
    so the gather runs once with 4C-wide rows.
    """
    c = x.shape[-1]
    right = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    down = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    g = _gather_2d(jnp.concatenate([x, right, down, downright], axis=-1),
                   iy0, ix0)
    return g[..., :c], g[..., c:2 * c], g[..., 2 * c:3 * c], g[..., 3 * c:]


def grid_sample(x, grid, mode: str = "bilinear", padding_mode: str = "border",
                align_corners: bool = False):
    """Sample NHWC `x` at normalized locations `grid` [N, Ho, Wo, 2] (x, y).

    Only padding_mode='border' is implemented — the sole mode the reference
    uses (``train/style_networks.py:27``, ``train/loss_networks.py:20``).
    """
    if padding_mode != "border":
        raise NotImplementedError("only border padding is supported")
    n, h, w, c = x.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)
    # Border padding clips the sampling coordinate into the image.
    gx = jnp.clip(gx, 0.0, w - 1)
    gy = jnp.clip(gy, 0.0, h - 1)

    if mode == "nearest":
        # torch uses std::nearbyint (round-half-to-even), as does jnp.round.
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        return _gather_2d(x, iy, ix)

    if mode != "bilinear":
        raise NotImplementedError(f"mode {mode!r}")

    ix0 = jnp.floor(gx).astype(jnp.int32)
    iy0 = jnp.floor(gy).astype(jnp.int32)
    # gx/gy are already clipped into the image, so floor() lands in range;
    # the explicit clip keeps int32 edge cases (gx == w-1) pinned.
    ix0 = jnp.clip(ix0, 0, w - 1)
    iy0 = jnp.clip(iy0, 0, h - 1)

    fx = (gx - ix0)[..., None]
    fy = (gy - iy0)[..., None]

    if 4 * c <= 128:
        # Narrow channels (the C=3 reference regime): one 4C-wide gather.
        v00, v01, v10, v11 = _gather_corners(x, iy0, ix0)
    else:
        ix1 = jnp.clip(ix0 + 1, 0, w - 1)
        iy1 = jnp.clip(iy0 + 1, 0, h - 1)
        v00 = _gather_2d(x, iy0, ix0)
        v01 = _gather_2d(x, iy0, ix1)
        v10 = _gather_2d(x, iy1, ix0)
        v11 = _gather_2d(x, iy1, ix1)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = top * (1.0 - fy) + bot * fy
    return out.astype(x.dtype)


def flow_warp(x, flow, mode: str = "bilinear"):
    """Backward-warp NHWC `x` by a pixel-space `flow` [N, H, W, 2] (dx, dy).

    Reproduces the reference warp exactly (``train/style_networks.py:27-44``):
    sample position = grid - flow, normalized by 2/max(dim-1, 1) - 1, then
    grid-sampled with border padding and torch-default align_corners=False.
    (The /(dim-1) normalization combined with align_corners=False introduces a
    slight edge-dependent offset; it is part of reference behavior.)
    """
    n, h, w, _ = x.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    vx = xs - flow[..., 0].astype(jnp.float32)
    vy = ys - flow[..., 1].astype(jnp.float32)
    gx = 2.0 * vx / max(w - 1, 1) - 1.0
    gy = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample(x, grid, mode=mode, padding_mode="border",
                       align_corners=False)


def flow_warp_const_src(x, flow):
    """`flow_warp(x, flow, "bilinear")` with an analytic VJP w.r.t. `flow`
    and `x` treated as a constant (zero cotangent).

    Motivation (relaxed inner loop, ``losses/relaxed.py``): the style image
    is stop-gradient'ed, so the only gradient through the warp is w.r.t.
    the flow — yet autodiff's backward re-runs the corner gathers (and,
    composed under `lax.scan`, rematerializes the smooth-flow chain).
    With  out = (v00(1-fx)+v01 fx)(1-fy) + (v10(1-fx)+v11 fx) fy,

        d out/d gx = ((v01-v00)(1-fy) + (v11-v10) fy) * [0 < gx' < w-1]
        d out/d gy = (bot - top)                      * [0 < gy' < h-1]
        d gx/d flow_x = -w / max(w-1, 1)   (grid-normalize o unnormalize)

    where gx' is the pre-clip sampling coordinate.  The bracket is TORCH's
    border-padding gradient convention (`clip_coordinates_set_grad`: strict
    zero at exactly-clipped coordinates); at the measure-zero clip ties the
    corner difference itself vanishes under border padding, so autodiff,
    this path, and torch all agree there (tested at flow=0, where every
    border pixel is an exact tie).  The forward is the same op sequence as
    `flow_warp` (bit-equality tested); the backward is pure elementwise —
    no gather, no scatter.
    """
    return _flow_warp_const_src(x, flow)


def _fwcs_primal(x, flow):
    return flow_warp(x, flow, mode="bilinear")


def _fwcs_fwd(x, flow):
    n, h, w, c = x.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    vx = xs - flow[..., 0].astype(jnp.float32)
    vy = ys - flow[..., 1].astype(jnp.float32)
    # Same composed map as flow_warp -> grid_sample (align_corners=False).
    gx = _unnormalize(2.0 * vx / max(w - 1, 1) - 1.0, w, False)
    gy = _unnormalize(2.0 * vy / max(h - 1, 1) - 1.0, h, False)
    inx = ((gx > 0.0) & (gx < w - 1)).astype(jnp.float32)
    iny = ((gy > 0.0) & (gy < h - 1)).astype(jnp.float32)
    gx = jnp.clip(gx, 0.0, w - 1)
    gy = jnp.clip(gy, 0.0, h - 1)
    ix0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 1)
    iy0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 1)
    fx = (gx - ix0)[..., None]
    fy = (gy - iy0)[..., None]
    if 4 * c <= 128:
        v00, v01, v10, v11 = _gather_corners(x, iy0, ix0)
    else:
        ix1 = jnp.clip(ix0 + 1, 0, w - 1)
        iy1 = jnp.clip(iy0 + 1, 0, h - 1)
        v00 = _gather_2d(x, iy0, ix0)
        v01 = _gather_2d(x, iy0, ix1)
        v10 = _gather_2d(x, iy1, ix0)
        v11 = _gather_2d(x, iy1, ix1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = (top * (1.0 - fy) + bot * fy).astype(x.dtype)
    dgx = (v01 - v00) * (1.0 - fy) + (v11 - v10) * fy
    dgy = bot - top
    res = (dgx, dgy, inx, iny, x, flow)
    return out, res


def _fwcs_bwd(res, cot):
    dgx, dgy, inx, iny, x, flow = res
    h, w = dgx.shape[1], dgx.shape[2]
    cot32 = cot.astype(dgx.dtype)
    sx = -float(w) / max(w - 1, 1)
    sy = -float(h) / max(h - 1, 1)
    gfx = (cot32 * dgx).sum(-1) * inx * sx
    gfy = (cot32 * dgy).sum(-1) * iny * sy
    gflow = jnp.stack([gfx, gfy], axis=-1).astype(flow.dtype)
    return jnp.zeros_like(x), gflow


_flow_warp_const_src = jax.custom_vjp(_fwcs_primal)
_flow_warp_const_src.defvjp(_fwcs_fwd, _fwcs_bwd)
