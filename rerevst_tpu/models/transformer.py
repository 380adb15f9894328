"""The unified style-transfer network (encoder / style encoder / decoder).

One functional model replaces the reference's five copy-pasted variants:

* training / per-frame inference graph — ``train/style_networks.py:378-443``
  == ``test/style_network_frame.py:295-359`` (stateless instance norms,
  filters predicted per frame, style affine re-applied after the filter
  chain);
* sequence-level global graph — ``test/style_network_global.py:334-451``
  (frozen per-sequence norm statistics with min/max clamping, filters frozen
  from batch-pooled content, an extra norm site between the filter chain and
  the first residual block);
* multi-style interpolation — ``Multi-style Interpolation/style_network.py``
  (the global graph where the frozen state is a weighted blend over styles).

All conditioning state is explicit:

* ``StyleFeatures`` — everything derived from a style image;
* ``SeqStats`` — everything derived from a (style, sampled-frames) pair.

Both are pytrees, so multi-style interpolation is literally
``blend_pytrees([s1, s2], [w, 1-w])`` (cf. the reference's per-layer Python
blending loops, ``Multi-style Interpolation/style_network.py:35-53,135-139``).

The decode is ``vmap``-free and batch-first: every op is batched NHWC so the
same function serves one frame or a frame batch; the global stats pass is the
same graph with batch reductions (and, in ``rerevst_tpu.parallel``, cross-chip
``psum/pmax/pmin`` reductions).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models import vgg
from rerevst_tpu.models.layers import (
    apply_dynamic_filter,
    apply_dynamic_filter_3x3,
    conv2d,
    conv3x3_outpairs,
    conv3x3_packed,
    depth_to_space_2x,
    init_conv_normal,
    init_linear_normal,
    leaky_relu,
    linear,
    precision_for,
    tile_packed,
    tile_pair,
    unfuse_pairs,
    upsample2x_conv1x1,
    upsample2x_conv3x3,
    upsample2x_conv3x3_packed,
    upsample_nearest_2x_pairfused,
)
from rerevst_tpu.ops.image import rgb_to_luma_reversed
from rerevst_tpu.ops.resize import upsample_nearest_2x
from rerevst_tpu.ops.stats import channel_minmax, instance_moments, mean_std
from rerevst_tpu.ops.tiling import can_tile_h, tiled_over_h

#: H receptive field of the decoder tail (ada2 input -> out conv) in
#: half-resolution rows: up2x-conv3x3 (1) + conv2 3x3 at full res (0.5->1
#: after the up) + out conv 3x3 (0.5) — ceil to 2.  tests/test_tiling.py
#: asserts the tiled tail equals the untiled one to fp32 tolerance.
_TAIL_HALO = 2


# ---------------------------------------------------------------------------
# Conditioning state pytrees
# ---------------------------------------------------------------------------

class StyleFeatures(NamedTuple):
    """EncoderStyle output (``test/style_network_global.py:317-331``).

    `map` is the raw relu4_1 feature map; `means`/`stds` are the per-tap
    (relu1_1..relu4_1) channel statistics, each [N,1,1,C].
    """
    map: jnp.ndarray
    means: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]
    stds: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


class NormStats(NamedTuple):
    """Frozen global InstanceNorm state (``test/style_network_global.py:59-77``)."""
    mean: jnp.ndarray   # [1,1,1,C]
    rstd: jnp.ndarray   # [1,1,1,C]
    xmin: jnp.ndarray   # [1,1,1,C] — extrema of the *normalized* activations
    xmax: jnp.ndarray


class SeqStats(NamedTuple):
    """Per-(sequence, style) frozen decoder state.

    norms keys: 'pre' (pre-filter norm site), 'ada4'..'ada1' (AdaIN sites by
    relu level), 'res{4,3,2}{a,b}' (residual-block norms).
    filters keys: 'f{1,2,3}{a,b}' — the six predicted 1x1 filter matrices,
    each [1,P,Q].
    """
    norms: Dict[str, NormStats]
    filters: Dict[str, jnp.ndarray]


def blend_pytrees(trees: Sequence, weights: Sequence[float]):
    """Weighted sum of identically-structured pytrees (multi-style blending)."""
    def combine(*leaves):
        out = leaves[0] * weights[0]
        for leaf, w in zip(leaves[1:], weights[1:]):
            out = out + leaf * w
        return out
    return jax.tree.map(combine, *trees)


def blend_pytrees_batched(trees: Sequence, weights):
    """Per-SAMPLE weighted sums of identically-structured pytrees.

    `weights` is [B, n_trees] — one blend per batch row.  Leaves whose
    leading dim is the broadcast 1 come back with leading dim B
    (NormStats [1,1,1,C] -> [B,1,1,C]; filters [1,P,Q] -> [B,P,Q]) —
    exactly the shapes ``decode_global`` broadcasts/applies per sample, so
    a whole frame batch with DIFFERENT interpolation weights decodes in
    one program (the reference's multi-style loop is one frame per call,
    ``Multi-style Interpolation/test.py:127-131``).
    """
    w = jnp.asarray(weights, jnp.float32)

    def combine(*leaves):
        # Blend in fp32 exactly like blend_pytrees (whose fp32 weights
        # promote the sum): a bf16/f16 accumulation here would make the
        # batched path diverge from the per-frame path in production
        # dtypes.
        stacked = jnp.stack(leaves).astype(jnp.float32)   # [S, 1, ...]
        out = jnp.tensordot(w, stacked, axes=1)
        return out.reshape((w.shape[0],) + stacked.shape[2:])

    return jax.tree.map(combine, *trees)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _init_predictor(key, cfg: ModelConfig, style_only: bool):
    kd, kf = jax.random.split(key)
    ic, vc = cfg.filter_channels, cfg.vgg_channels
    if style_only:
        # FilterPredictor_S: FC(ic -> 9*ic*ic) (train/style_networks.py:191-206)
        fc = init_linear_normal(kf, ic, 9 * ic * ic, dtype=cfg.dtype)
    else:
        # FilterPredictor: FC(2*ic -> ic*ic) (train/style_networks.py:129-145)
        fc = init_linear_normal(kf, 2 * ic, ic * ic, dtype=cfg.dtype)
    return {
        "down": init_conv_normal(kd, 3, 3, vc, ic, dtype=cfg.dtype),
        "fc": fc,
    }


def _init_kernel_filter(key, cfg: ModelConfig):
    kd, ku, k1, k2 = jax.random.split(key, 4)
    ic, vc = cfg.filter_channels, cfg.vgg_channels
    style_only = not cfg.both_sty_con
    return {
        "down": init_conv_normal(kd, 3, 3, vc, ic, dtype=cfg.dtype),
        "up": init_conv_normal(ku, 3, 3, ic, vc, dtype=cfg.dtype),
        "p1": _init_predictor(k1, cfg, style_only),
        "p2": _init_predictor(k2, cfg, style_only),
    }


def _init_resblock(key, cin: int, cout: int, dtype):
    k1, k2, ks = jax.random.split(key, 3)
    return {
        "conv1": init_conv_normal(k1, 3, 3, cin, cout, dtype=dtype),
        "conv2": init_conv_normal(k2, 3, 3, cout, cout, dtype=dtype),
        "shortcut": init_conv_normal(ks, 1, 1, cin, cout, bias=False, dtype=dtype),
    }


def init_decoder_params(key, cfg: ModelConfig) -> Dict:
    k4, k3, k2, ko, kf1, kf2, kf3 = jax.random.split(key, 7)
    params = {
        "res4": _init_resblock(k4, 512, 256, cfg.dtype),
        "res3": _init_resblock(k3, 256, 128, cfg.dtype),
        "res2": _init_resblock(k2, 128, 64, cfg.dtype),
        "out": init_conv_normal(ko, 3, 3, 64, 3, dtype=cfg.dtype),
    }
    if cfg.dynamic_filter:
        params["filter1"] = _init_kernel_filter(kf1, cfg)
        params["filter2"] = _init_kernel_filter(kf2, cfg)
        params["filter3"] = _init_kernel_filter(kf3, cfg)
    return params


def init_transformer_params(key, cfg: ModelConfig, with_loss_net: bool = True,
                            vgg_scheme: str = "torch") -> Dict:
    """`vgg_scheme='he_relu'` gives magnitude-preserving VGG features — the
    right choice when training from scratch without pretrained VGG weights
    (see ``vgg.init_vgg_params``)."""
    ke, ks, kv, kd = jax.random.split(key, 4)
    params = {
        "encoder": vgg.init_vgg_params(ke, cfg.dtype, vgg_scheme),
        "encoder_style": vgg.init_vgg_params(ks, cfg.dtype, vgg_scheme),
        "decoder": init_decoder_params(kd, cfg),
    }
    if with_loss_net:
        # Frozen loss network (deleted after style prep at inference,
        # test/style_network_global.py:465-469).
        params["vgg_loss"] = vgg.init_vgg_params(kv, cfg.dtype, vgg_scheme)
    return params


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

def encode_content(params: Dict, frame, cfg: ModelConfig, desaturate: bool = True):
    """Content branch: optional reversed-luma desaturation, then VGG->relu4_1.

    Inference always desaturates (``test/style_network_global.py:499-501``);
    the training forward encodes the color content
    (``train/style_networks.py:570``) — pass desaturate=False there.

    With ``cfg.fp32_mix in ('enc', 'full')`` the VGG runs with fp32
    activation storage (its bf16 storage rounding is the measured-dominant
    pixel-error source — see ModelConfig.fp32_mix); the returned features
    are cast back to cfg.dtype unless the decoder is fp32 too.
    """
    if (desaturate and cfg.luma_fold and cfg.dtype != jnp.float32
            and cfg.fp32_mix == "none" and not cfg.parity_packed
            and not cfg.pairlane):
        # Rank-1 fold: desaturation + conv1_1 collapse into a 1-channel conv
        # (vgg.encode_luma) — exact up to fp reassociation, so it engages
        # only on the fast path; the fp32 parity oracle keeps the reference
        # op sequence bit-for-bit.
        from rerevst_tpu.ops.image import rgb_to_luma01

        g = rgb_to_luma01(frame).astype(cfg.dtype)
        return vgg.encode_luma(params["encoder"], g,
                               precision=precision_for(cfg.dtype,
                                                       cfg.precision))
    x = rgb_to_luma_reversed(frame) if desaturate else frame
    if cfg.fp32_mix in ("enc", "full", "body") and cfg.dtype != jnp.float32:
        f = vgg.encode(params["encoder"], x.astype(jnp.float32),
                       precision=precision_for(jnp.float32,
                                               cfg.mix_precision),
                       packed=cfg.parity_packed)
        return f.astype(cfg.dtype) if cfg.fp32_mix == "enc" else f
    return vgg.encode(params["encoder"], x.astype(cfg.dtype),
                      precision=precision_for(cfg.dtype, cfg.precision),
                      packed=cfg.parity_packed, pairlane=cfg.pairlane,
                      head_tiles=cfg.spatial_tiles)


def encode_style(params: Dict, style, cfg: ModelConfig) -> StyleFeatures:
    """EncoderStyle: per-tap (mean, std) + raw relu4_1 map."""
    feats = vgg.vgg_features(params["encoder_style"], style.astype(cfg.dtype),
                             "relu4_1", precision=precision_for(cfg.dtype, cfg.precision))
    means, stds = [], []
    for tap in feats:
        m, s = mean_std(tap, eps=cfg.mean_std_eps)
        means.append(m)
        stds.append(s)
    return StyleFeatures(feats.relu4_1, tuple(means), tuple(stds))


# ---------------------------------------------------------------------------
# Building blocks — per-frame (stateless) graph
# ---------------------------------------------------------------------------

def _instance_norm(x, eps):
    mean, rstd = instance_moments(x, (1, 2), eps)
    return ((x.astype(jnp.float32) - mean) * rstd).astype(x.dtype)


def _predict_filter(p, content, style_map, cfg: ModelConfig):
    """FilterPredictor.forward (``train/style_networks.py:136-145``)."""
    prec = precision_for(cfg.dtype, cfg.precision)
    pc = jnp.mean(conv2d(p["down"], content, padding=1, precision=prec), (1, 2))
    ps = jnp.mean(conv2d(p["down"], style_map, padding=1, precision=prec), (1, 2))
    if ps.shape[0] == 1 and pc.shape[0] != 1:
        ps = jnp.broadcast_to(ps, pc.shape)
    f = linear(p["fc"], jnp.concatenate([pc, ps], axis=1), precision=prec)
    ic = cfg.filter_channels
    return f.reshape(-1, ic, ic)


def _predict_filter_s(p, style_map, cfg: ModelConfig):
    """FilterPredictor_S.forward (``train/style_networks.py:200-206``)."""
    prec = precision_for(cfg.dtype, cfg.precision)
    ps = jnp.mean(conv2d(p["down"], style_map, padding=1, precision=prec), (1, 2))
    f = linear(p["fc"], ps, precision=prec)
    ic = cfg.filter_channels
    return f.reshape(-1, ic, ic, 3, 3)


def _kernel_filter(p, content, style_map, cfg: ModelConfig):
    """KernelFilter.forward (``train/style_networks.py:180-188``)."""
    prec = precision_for(cfg.dtype, cfg.precision)
    h = conv2d(p["down"], content, padding=1, precision=prec)
    if cfg.both_sty_con:
        h = apply_dynamic_filter(h, _predict_filter(p["p1"], content, style_map, cfg), prec)
        h = leaky_relu(h)
        h = apply_dynamic_filter(h, _predict_filter(p["p2"], content, style_map, cfg), prec)
    else:
        h = apply_dynamic_filter_3x3(h, _predict_filter_s(p["p1"], style_map, cfg), prec)
        h = leaky_relu(h)
        h = apply_dynamic_filter_3x3(h, _predict_filter_s(p["p2"], style_map, cfg), prec)
    return content + conv2d(p["up"], h, padding=1, precision=prec)


def _resblock(p, x, cfg: ModelConfig, upsample: bool = True):
    """ResidualBlock.forward, stateless norms (``train/style_networks.py:262-274``).

    The nearest-2x upsample is folded into conv1 (four 2x2 parity convs at
    low res — see ``upsample2x_conv3x3``) and hoisted below the 1x1 shortcut
    (exact for nearest upsampling): the 2x-res intermediate never exists.
    """
    prec = precision_for(cfg.dtype, cfg.precision)
    if upsample:
        # NOT the dilated-conv shortcut of _resblock_global: this graph is
        # differentiated in training, where the dilated conv's backward
        # measured 3-4% slower per step (0.90->0.87 f32, 1.65->1.61 bf16);
        # the broadcast's backward is a cheap 2x2 sum-reduce.
        xs = upsample_nearest_2x(conv2d(p["shortcut"], x, padding=0,
                                        precision=prec))
        h = upsample2x_conv3x3(p["conv1"], x, precision=prec)
    else:
        xs = conv2d(p["shortcut"], x, padding=0, precision=prec)
        h = conv2d(p["conv1"], x, padding=1, precision=prec)
    h = _instance_norm(leaky_relu(h), cfg.norm_eps)
    h = conv2d(p["conv2"], h, padding=1, precision=prec)
    h = _instance_norm(leaky_relu(h), cfg.norm_eps)
    return xs + h


def decode(params_dec: Dict, x, style: StyleFeatures, cfg: ModelConfig):
    """Per-frame / training decoder graph (``train/style_networks.py:426-443``).

    AdaIN_filter re-applies the relu4_1 style affine after the filter chain
    (``train/style_networks.py:411-424``); no extra norm site exists between
    the filters and res4 (unlike the global graph).
    """
    tail = cfg.fp32_mix if cfg.dtype != jnp.float32 else "none"
    tcfg = _mix_cfg(cfg)
    if tail in ("dec", "full"):
        # Whole decoder in the mix config (fp32 storage; 'full' also ran the
        # encoder in fp32, so the cast below is a no-op there).
        return decode(params_dec, x.astype(jnp.float32), style, tcfg)
    if tail == "body":
        x = x.astype(jnp.float32)  # fp32 front; res2+out revert to bf16
    prec = precision_for(cfg.dtype, cfg.precision)
    m1, m2, m3, m4 = style.means
    s1, s2, s3, s4 = style.stds

    def adain(h, m, s):
        return _instance_norm(h, cfg.norm_eps) * s + m

    if cfg.dynamic_filter:
        nc = _instance_norm(x, cfg.norm_eps)
        ns = (style.map - m4) / s4
        h = _kernel_filter(params_dec["filter1"], nc, ns, cfg)
        h = _kernel_filter(params_dec["filter2"], h, ns, cfg)
        h = _kernel_filter(params_dec["filter3"], h, ns, cfg)
        h = h * s4 + m4
    else:
        h = adain(x, m4, s4)

    h = _resblock(params_dec["res4"], h, cfg)
    h = adain(h, m3, s3)
    h = _resblock(params_dec["res3"], h, cfg)
    if tail == "res2":
        h = h.astype(jnp.float32)
    elif tail == "body":
        h = h.astype(cfg.dtype)
    h = adain(h, m2, s2)
    h = _resblock(params_dec["res2"], h, tcfg if tail == "res2" else cfg)
    if tail == "out":
        h = h.astype(jnp.float32)
    h = adain(h, m1, s1)
    if _use_outpairs(cfg, tail, h):
        # Paired-output out conv (see _use_outpairs / PERF.md round-3).
        return conv3x3_outpairs(params_dec["out"], h, precision=prec)
    return conv2d(params_dec["out"], h, padding=1,
                  precision=precision_for(tcfg.dtype, tcfg.precision)
                  if tail != "none" else prec)


# ---------------------------------------------------------------------------
# Building blocks — global (frozen statistics) graph
# ---------------------------------------------------------------------------

def _tile_stats(st: NormStats) -> NormStats:
    """Per-channel frozen stats [1,1,1,C] -> parity-packed [1,1,1,4C]."""
    return NormStats(tile_packed(st.mean), tile_packed(st.rstd),
                     tile_packed(st.xmin), tile_packed(st.xmax))


def _norm_apply(st: NormStats, x):
    """Frozen-stats normalize + clamp (``test/style_network_global.py:43-57``).

    Statistics stay fp32.  In bf16 mode the elementwise apply runs in bf16
    (bf16 covers fp32's exponent range, and no fp32 copy of the large
    activation materializes).  In fp16 mode it computes in fp32 and casts
    back: fp16's narrow exponent overflows on degenerate-channel ``rstd``
    (rsqrt(var+eps) can reach 1e6), and XLA fuses the chain so the fp32
    intermediate never hits HBM.
    """
    if x.dtype == jnp.float32:
        xf = (x - st.mean) * st.rstd
        return jnp.clip(xf, st.xmin, st.xmax)
    if x.dtype == jnp.float16:
        xf = (x.astype(jnp.float32) - st.mean) * st.rstd
        return jnp.clip(xf, st.xmin, st.xmax).astype(x.dtype)
    xf = (x - st.mean.astype(x.dtype)) * st.rstd.astype(x.dtype)
    return jnp.clip(xf, st.xmin.astype(x.dtype), st.xmax.astype(x.dtype))


def _kernel_filter_frozen(p, content, fa, fb, cfg: ModelConfig):
    """KernelFilter.forward with frozen filters
    (``test/style_network_global.py:210-217``)."""
    prec = precision_for(cfg.dtype, cfg.precision)
    h = conv2d(p["down"], content, padding=1, precision=prec)
    h = apply_dynamic_filter(h, fa, prec)
    h = leaky_relu(h)
    h = apply_dynamic_filter(h, fb, prec)
    return content + conv2d(p["up"], h, padding=1, precision=prec)


def _resblock_global(p, x, sa: NormStats, sb: NormStats, cfg: ModelConfig):
    """ResidualBlock.forward with frozen norms
    (``test/style_network_global.py:111-122``); upsample folded into conv1
    and hoisted below the shortcut as in ``_resblock``; the shortcut's own
    nearest-2x is a single input-dilated 1x1-spread conv
    (``upsample2x_conv1x1`` — kills a 3.2 ms materialized broadcast the
    round-3 profiler trace exposed; fp-exact, +3%% end-to-end)."""
    prec = precision_for(cfg.dtype, cfg.precision)
    xs = upsample2x_conv1x1(p["shortcut"], x, precision=prec)
    h = upsample2x_conv3x3(p["conv1"], x, precision=prec)
    h = _norm_apply(sa, leaky_relu(h))
    h = conv2d(p["conv2"], h, padding=1, precision=prec)
    h = _norm_apply(sb, leaky_relu(h))
    return xs + h


def _tile_stats_pair(st: NormStats) -> NormStats:
    """Frozen per-channel stats [1,1,1,C] -> W-pair-fused [1,1,1,2C]."""
    return NormStats(tile_pair(st.mean), tile_pair(st.rstd),
                     tile_pair(st.xmin), tile_pair(st.xmax))


def _decode_tail_pairlane(params_dec: Dict, h, s1, m1, norms: Dict,
                          cfg: ModelConfig):
    """res2 + ada1 + out conv evaluated W-pair-fused, with the two
    640^2-class convs (res2.conv2 64->64 and the out conv 64->3) as
    pair-lane Pallas kernels (kernels/conv3x3.py).

    Documented NEGATIVE result (off by default): the kernel beats the
    ISOLATED conv 7.8 vs 13.9 ms, but the composed tail measured 24.7 vs
    11.2 ms — in-context XLA fuses the norm/lrelu chain into its convs and
    picks layouts a custom call forfeits (PERF.md round-3 pair-lane
    section).  Kept in-tree, equality-tested: the region enters fused right
    after res2.conv1 (contiguous reshape), elementwise ops run on
    pair-tiled constants, the nearest-2x shortcut is emitted fused (lane
    duplication), and the unfuse happens on the 3-channel output image.
    f16 sessions run the region in bf16 (Mosaic has no f16).
    """
    from rerevst_tpu.kernels.conv3x3 import conv3x3_pairlane

    prec = precision_for(cfg.dtype, cfg.precision)
    p2 = params_dec["res2"]
    f16 = h.dtype == jnp.float16

    hh = upsample2x_conv3x3(p2["conv1"], h, precision=prec)  # [B,2H,2W,64]
    if f16:
        hh = hh.astype(jnp.bfloat16)
    b, h2, w2, _ = hh.shape
    hf = hh.reshape(b, h2, w2 // 2, 128)  # contiguous W-pair fuse

    hf = _norm_apply(_tile_stats_pair(norms["res2a"]), leaky_relu(hf))
    hf = conv3x3_pairlane(hf, p2["conv2"]["w"], p2["conv2"].get("b"),
                          fused_io=True)
    hf = _norm_apply(_tile_stats_pair(norms["res2b"]), leaky_relu(hf))

    xsl = conv2d(p2["shortcut"], h, padding=0, precision=prec)
    if f16:
        xsl = xsl.astype(jnp.bfloat16)
    hf = hf + upsample_nearest_2x_pairfused(xsl)

    hf = (_norm_apply(_tile_stats_pair(norms["ada1"]), hf)
          * tile_pair(s1).astype(hf.dtype) + tile_pair(m1).astype(hf.dtype))
    of = conv3x3_pairlane(hf, params_dec["out"]["w"],
                          params_dec["out"].get("b"), fused_io=True)
    return unfuse_pairs(of, 3).astype(cfg.dtype)


def _mix_cfg(cfg: ModelConfig) -> ModelConfig:
    """Config used inside the fp32 decoder tail (see ModelConfig.fp32_mix)."""
    import dataclasses

    return dataclasses.replace(cfg, dtype=jnp.float32,
                               precision=cfg.mix_precision)


def decode_global(params_dec: Dict, x, style: StyleFeatures, stats: SeqStats,
                  cfg: ModelConfig):
    """Global decoder graph (``test/style_network_global.py:441-451``).

    Differences vs ``decode``: every norm uses frozen sequence statistics with
    min/max clamping; the filter chain's output is re-normalized at an extra
    site ('ada4') before the style affine; filters come frozen from `stats`.
    """
    tail = cfg.fp32_mix if cfg.dtype != jnp.float32 else "none"
    tcfg = _mix_cfg(cfg)
    if tail in ("dec", "full"):
        # Whole decoder in the mix config (fp32 storage; 'full' also ran the
        # encoder in fp32, so the cast below is a no-op there).
        return decode_global(params_dec, x.astype(jnp.float32), style, stats,
                             tcfg)
    if tail == "body":
        # fp32 storage up to the last residual block; the bandwidth-heavy
        # full-resolution res2+out stages go back to bf16 (their storage
        # rounding is a small error term — see ModelConfig.fp32_mix).
        x = x.astype(jnp.float32)
    prec = precision_for(cfg.dtype, cfg.precision)
    m1, m2, m3, m4 = style.means
    s1, s2, s3, s4 = style.stds
    norms, filt = stats.norms, stats.filters

    h = _norm_apply(norms["pre"], x)
    ns = (style.map - m4) / s4
    del ns  # style map already folded into the frozen filters
    h = _kernel_filter_frozen(params_dec["filter1"], h, filt["f1a"], filt["f1b"], cfg)
    h = _kernel_filter_frozen(params_dec["filter2"], h, filt["f2a"], filt["f2b"], cfg)
    h = _kernel_filter_frozen(params_dec["filter3"], h, filt["f3a"], filt["f3b"], cfg)

    h = _norm_apply(norms["ada4"], h) * s4 + m4
    h = _resblock_global(params_dec["res4"], h, norms["res4a"], norms["res4b"], cfg)
    h = _norm_apply(norms["ada3"], h) * s3 + m3
    h = _resblock_global(params_dec["res3"], h, norms["res3a"], norms["res3b"], cfg)
    if tail == "res2":
        h = h.astype(jnp.float32)
    elif tail == "body":
        h = h.astype(cfg.dtype)
    if (cfg.spatial_tiles > 1 and tail == "none" and not cfg.pairlane
            and not cfg.parity_packed
            and can_tile_h(h.shape[1], cfg.spatial_tiles, _TAIL_HALO, (2, 1))):
        # Spatially tiled tail (ada2 -> res2 -> ada1 -> out): the region is
        # H-local under frozen stats, so overlap-and-discard is EXACT
        # (ops/tiling.py; receptive field from the half-res input is 2 rows).
        # Bounds the two full-resolution 64-channel temps — the true-1080p
        # HBM ceiling (PERF.md round-4 matrix) — at 1/N.
        def _tail_fn(hs):
            t = _norm_apply(norms["ada2"], hs) * s2 + m2
            t = _resblock_global(params_dec["res2"], t, norms["res2a"],
                                 norms["res2b"], cfg)
            t = _norm_apply(norms["ada1"], t) * s1 + m1
            if _use_outpairs(cfg, tail, t):
                return conv3x3_outpairs(params_dec["out"], t, precision=prec)
            return conv2d(params_dec["out"], t, padding=1, precision=prec)

        return tiled_over_h(_tail_fn, h, cfg.spatial_tiles, _TAIL_HALO,
                            (2, 1))
    h = _norm_apply(norms["ada2"], h) * s2 + m2
    if (cfg.pairlane and not cfg.parity_packed and tail == "none"
            and cfg.dtype != jnp.float32
            and h.shape[1] % 4 == 0 and h.shape[2] % 2 == 0):
        # Pair-lane Pallas tail (inference-only fast path; the fp32 parity
        # graph and every fp32_mix region keep the XLA convs).
        return _decode_tail_pairlane(params_dec, h, s1, m1, norms, cfg)
    if cfg.parity_packed:
        # Parity-packed tail: res2's upsample-conv emits packed, every op
        # through the out conv stays packed, and the unpack happens on the
        # 3-channel output image (see layers.py module note).
        rprec = (precision_for(tcfg.dtype, tcfg.precision)
                 if tail == "res2" else prec)
        oprec = (precision_for(tcfg.dtype, tcfg.precision)
                 if tail != "none" else prec)
        p2 = params_dec["res2"]
        hp = upsample2x_conv3x3_packed(p2["conv1"], h, precision=rprec)
        hp = _norm_apply(_tile_stats(norms["res2a"]), leaky_relu(hp))
        hp = conv3x3_packed(p2["conv2"], hp, precision=rprec)
        hp = _norm_apply(_tile_stats(norms["res2b"]), leaky_relu(hp))
        xs = conv2d(p2["shortcut"], h, padding=0, precision=rprec)
        hp = hp + tile_packed(xs)  # nearest-2x == parity replicate
        if tail == "out":
            hp = hp.astype(jnp.float32)
        hp = (_norm_apply(_tile_stats(norms["ada1"]), hp)
              * tile_packed(s1) + tile_packed(m1))
        return depth_to_space_2x(
            conv3x3_packed(params_dec["out"], hp, precision=oprec))
    h = _resblock_global(params_dec["res2"], h, norms["res2a"], norms["res2b"],
                         tcfg if tail == "res2" else cfg)
    if tail == "out":
        h = h.astype(jnp.float32)
    h = _norm_apply(norms["ada1"], h) * s1 + m1
    if _use_outpairs(cfg, tail, h):
        return conv3x3_outpairs(params_dec["out"], h, precision=prec)
    return conv2d(params_dec["out"], h, padding=1,
                  precision=precision_for(tcfg.dtype, tcfg.precision)
                  if tail != "none" else prec)


def _use_outpairs(cfg: ModelConfig, tail: str, h) -> bool:
    """Static gate for the paired-output out conv (layers.conv3x3_outpairs).

    The profiler trace shows the out-conv fusion is the pipeline's single
    most expensive op (13.4 of 66.7 ms per batch-16 f16 iteration); the
    paired form tiles its degenerate 3-channel output better — but only up
    to a working-set size.  Measured end-to-end A/B (f16, 512p/1080p,
    PERF.md round-3): +3.3%% fps at 6.5M output pixels (batch 16), +1%% at
    5.9M, small win at batch 1, and −1.7..2%% at >=9.8M (batch 24/32,
    1080p batch 8) where XLA's direct-conv tiling catches up.  Round-4
    re-measurement on 16:9 (PERF.md "Real video geometry"): at the fixture's
    576x1152 batch 8 — 5.3M output pixels, inside the round-3 pixel gate —
    the paired form LOSES 2.2% (133.1 vs 136.1 fps), while square 640² at
    the same pixel count wins 3.3%; wide rows already feed XLA's direct
    lowering full 128-lane tiles, so the gate additionally requires padded
    W <= 1024.  Shapes are static under jit, so the gate is free.
    ``cfg.outpairs`` forces it on/off for A/B runs, subject to the
    correctness constraints (even W, low precision, no fp32 tail).
    """
    legal = (tail == "none" and cfg.dtype != jnp.float32
             and h.shape[2] % 2 == 0)
    if cfg.outpairs == "off":
        return False
    if cfg.outpairs == "on":
        return legal
    return (legal and h.shape[2] <= 1024
            and h.shape[0] * h.shape[1] * h.shape[2] <= (1 << 23))


# ---------------------------------------------------------------------------
# Global statistics collection (Pass 1)
# ---------------------------------------------------------------------------

def _norm_compute(x, eps, reduce_fns=None, mask=None):
    """InstanceNorm.compute (``test/style_network_global.py:59-77``).

    Returns (normalized batch, NormStats).  Moments/extrema reduce over
    (N,H,W); `reduce_fns` optionally supplies cross-device (psum, pmin, pmax)
    wrappers so the same code serves single-chip and sharded collection.
    `mask` ([N] float, 1=real frame) makes padded frames (added so the batch
    divides the device count) statistically invisible — the sharded result is
    bit-comparable to the unpadded single-chip one.
    """
    xf = x.astype(jnp.float32)
    if reduce_fns is None and mask is None:
        mean, rstd = instance_moments(xf, (0, 1, 2), eps)
        xn = (xf - mean) * rstd
        xmin, xmax = channel_minmax(xn, (0, 1, 2))
    else:
        psum, pmin, pmax = reduce_fns or (lambda v: v,) * 3
        hw = float(xf.shape[1] * xf.shape[2])
        if mask is None:
            m = jnp.ones((xf.shape[0], 1, 1, 1), jnp.float32)
        else:
            m = mask.reshape(-1, 1, 1, 1).astype(jnp.float32)
        cnt = psum(jnp.sum(m)) * hw
        s = psum(jnp.sum(xf * m, (0, 1, 2), keepdims=True))
        mean = s / cnt
        # Two-pass variance (sum of squared deviations) like the reference —
        # immune to the E[x^2]-E[x]^2 cancellation at large activation means.
        # Mask INSIDE the square (identical for a 0/1 mask): padded frames
        # replicate a real frame, and if any real square overflows f32 the
        # old square(..)*m form minted inf*0 = NaN from the padding.
        ss = psum(jnp.sum(jnp.square((xf - mean) * m), (0, 1, 2),
                          keepdims=True))
        var = ss / cnt
        rstd = jax.lax.rsqrt(var + eps)
        xn = (xf - mean) * rstd
        big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
        xmin = pmin(jnp.min(jnp.where(m > 0, xn, big), (0, 1, 2), keepdims=True))
        xmax = pmax(jnp.max(jnp.where(m > 0, xn, -big), (0, 1, 2), keepdims=True))
    st = NormStats(mean, rstd, xmin, xmax)
    return xn.astype(x.dtype), st


def _filter_compute(p, content_batch, style_map, cfg: ModelConfig, psum=None,
                    mask=None):
    """FilterPredictor.compute (``test/style_network_global.py:161-172``):
    content pooled over the whole sampled batch -> one filter per sequence."""
    prec = precision_for(cfg.dtype, cfg.precision)
    pc = jnp.mean(conv2d(p["down"], content_batch, padding=1, precision=prec), (1, 2))
    if psum is None and mask is None:
        pc = jnp.mean(pc, axis=0, keepdims=True)
    else:
        ps_ = psum or (lambda v: v)
        m = (jnp.ones((pc.shape[0], 1), jnp.float32) if mask is None
             else mask.reshape(-1, 1).astype(jnp.float32))
        cnt = ps_(jnp.sum(m))
        pc = ps_(jnp.sum(pc * m, axis=0, keepdims=True)) / cnt
    ps = jnp.mean(conv2d(p["down"], style_map, padding=1, precision=prec), (1, 2))
    f = linear(p["fc"], jnp.concatenate([pc, ps], axis=1), precision=prec)
    ic = cfg.filter_channels
    return f.reshape(-1, ic, ic)


def collect_stats(params_dec: Dict, x, style: StyleFeatures, cfg: ModelConfig,
                  reduce_fns=None, mask=None) -> SeqStats:
    """Decoder.compute — run the global graph over the sampled-frame batch,
    freezing every norm/filter state (``test/style_network_global.py:425-439``).

    `x` is the batched content features [N, H/8, W/8, 512].  With `reduce_fns`
    = (psum, pmin, pmax) the same code runs under ``shard_map`` with the N
    axis sharded across devices (the TPU equivalent of the reference's
    disk-spill long-sequence path, ``test/style_network.py:540-574``).
    """
    cfgN = cfg.norm_eps
    psum = reduce_fns[0] if reduce_fns is not None else None
    norms: Dict[str, NormStats] = {}
    filters: Dict[str, jnp.ndarray] = {}
    m1, m2, m3, m4 = style.means
    s1, s2, s3, s4 = style.stds

    h, norms["pre"] = _norm_compute(x, cfgN, reduce_fns, mask)
    ns = (style.map - m4) / s4
    prec = precision_for(cfg.dtype, cfg.precision)

    for i, name in ((1, "filter1"), (2, "filter2"), (3, "filter3")):
        p = params_dec[name]
        inner = conv2d(p["down"], h, padding=1, precision=prec)
        fa = _filter_compute(p["p1"], h, ns, cfg, psum, mask)
        filters[f"f{i}a"] = fa
        inner = leaky_relu(apply_dynamic_filter(inner, fa, prec))
        fb = _filter_compute(p["p2"], h, ns, cfg, psum, mask)
        filters[f"f{i}b"] = fb
        inner = apply_dynamic_filter(inner, fb, prec)
        h = h + conv2d(p["up"], inner, padding=1, precision=prec)

    def ada_compute(h, key, m, s):
        hn, norms[key] = _norm_compute(h, cfgN, reduce_fns, mask)
        return hn * s + m

    def res_compute(h, p, ka, kb):
        xs = upsample2x_conv1x1(p["shortcut"], h, precision=prec)
        t = upsample2x_conv3x3(p["conv1"], h, precision=prec)
        t, norms[ka] = _norm_compute(leaky_relu(t), cfgN, reduce_fns, mask)
        t = conv2d(p["conv2"], t, padding=1, precision=prec)
        t, norms[kb] = _norm_compute(leaky_relu(t), cfgN, reduce_fns, mask)
        return xs + t

    h = ada_compute(h, "ada4", m4, s4)
    h = res_compute(h, params_dec["res4"], "res4a", "res4b")
    h = ada_compute(h, "ada3", m3, s3)
    h = res_compute(h, params_dec["res3"], "res3a", "res3b")
    h = ada_compute(h, "ada2", m2, s2)
    h = res_compute(h, params_dec["res2"], "res2a", "res2b")
    ada_compute(h, "ada1", m1, s1)  # freezes 'ada1'; output discarded

    return SeqStats(norms, filters)


# ---------------------------------------------------------------------------
# Convenience wrapper
# ---------------------------------------------------------------------------

class TransformerNet:
    """Thin stateless namespace: config + pure functions over param pytrees."""

    def __init__(self, cfg: Optional[ModelConfig] = None):
        self.cfg = cfg or ModelConfig()

    def init_params(self, key, with_loss_net: bool = True) -> Dict:
        return init_transformer_params(key, self.cfg, with_loss_net)

    def encode_content(self, params, frame, desaturate: bool = True):
        return encode_content(params, frame, self.cfg, desaturate)

    def encode_style(self, params, style) -> StyleFeatures:
        return encode_style(params, style, self.cfg)

    def stylize(self, params, frame, style: StyleFeatures,
                stats: Optional[SeqStats] = None):
        """Full forward: desaturate -> encode -> decode (global iff stats)."""
        f = encode_content(params, frame, self.cfg, desaturate=True)
        if stats is None:
            return decode(params["decoder"], f, style, self.cfg)
        return decode_global(params["decoder"], f, style, stats, self.cfg)

    def collect(self, params, content_feats, style: StyleFeatures,
                reduce_fns=None) -> SeqStats:
        return collect_stats(params["decoder"], content_feats, style, self.cfg,
                             reduce_fns)

    def validation(self, params, frame, style_img):
        """Training-time validation pass: color content, per-frame graph
        (``train/style_networks.py:556-559``)."""
        f = encode_content(params, frame, self.cfg, desaturate=False)
        sf = encode_style(params, style_img, self.cfg)
        return decode(params["decoder"], f, sf, self.cfg)
