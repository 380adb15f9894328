"""Pair-lane (W-pair lane-fused) boundary-conv path == plain model graph.

cfg.pairlane is a documented NEGATIVE performance result (beats the isolated
conv, loses composed — PERF.md round-3) kept in-tree; these tests pin that
the path stays numerically correct and falls back safely.  The Pallas
kernels run in interpret mode on the CPU test mesh
(kernels/conv3x3.py:pallas_interpret_default).
"""

import numpy as np

import jax
import jax.numpy as jnp

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.layers import (
    tile_pair,
    unfuse_pairs,
    upsample_nearest_2x_pairfused,
)
from rerevst_tpu.models.transformer import (
    collect_stats,
    decode_global,
    encode_content,
    encode_style,
    init_transformer_params,
)
from rerevst_tpu.ops.resize import upsample_nearest_2x


def _x(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape) * 0.5


def test_pairfused_layout_helpers():
    x = _x((2, 4, 6, 8))
    up = np.asarray(upsample_nearest_2x(x))
    upf = np.asarray(upsample_nearest_2x_pairfused(x))
    np.testing.assert_array_equal(upf, up.reshape(2, 8, 6, 16))
    np.testing.assert_array_equal(np.asarray(tile_pair(x)),
                                  np.concatenate([x, x], -1))
    f = _x((1, 4, 3, 128), 1)
    np.testing.assert_array_equal(
        np.asarray(unfuse_pairs(f, 64)), np.asarray(f).reshape(1, 4, 6, 64))
    got3 = np.asarray(unfuse_pairs(f, 3))
    want3 = np.asarray(f).reshape(1, 4, 6, 64)[..., :3]
    # unfuse with channel slice: pairs interleave, channels cut per half
    np.testing.assert_array_equal(got3[:, :, 0::2], np.asarray(f)[..., 0:3])
    np.testing.assert_array_equal(got3[:, :, 1::2], np.asarray(f)[..., 64:67])
    assert want3.shape == got3.shape


def test_conv3x3_outpairs_matches_conv2d():
    """The paired-output out conv (pure XLA, the production low-precision
    out-conv form) == direct conv2d at fp32-HIGHEST."""
    from jax import lax

    from rerevst_tpu.models.layers import conv2d, conv3x3_outpairs

    rng = np.random.default_rng(0)
    for (c, o, hw) in [(64, 3, (10, 16)), (64, 64, (8, 12)), (32, 5, (6, 20))]:
        x = jnp.asarray(rng.standard_normal((2, *hw, c)), jnp.float32)
        p = {"w": jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1,
                              jnp.float32),
             "b": jnp.asarray(rng.standard_normal(o), jnp.float32)}
        want = conv2d(p, x, padding=1, precision=lax.Precision.HIGHEST)
        got = conv3x3_outpairs(p, x, precision=lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_use_outpairs_gate_geometry():
    """The paired-out-conv static gate, pinned to the round-3/4 measured
    operating points (PERF.md "Real video geometry"): pixel count <= 2^23
    AND padded W <= 1024 (16:9 recalibration — the paired form loses 2.2%
    at 576x1152 batch 8 despite sitting inside the pixel gate)."""
    from rerevst_tpu.models.transformer import _use_outpairs

    f16 = ModelConfig(dtype=jnp.float16)

    def mk(n, h, w):
        return np.zeros((n, h, w, 64), np.float16)

    assert _use_outpairs(f16, "none", mk(16, 640, 640))       # 512p b16
    assert _use_outpairs(f16, "none", mk(1, 640, 640))        # latency b1
    assert not _use_outpairs(f16, "none", mk(8, 576, 1152))   # fixture 16:9
    assert not _use_outpairs(f16, "none", mk(8, 1216, 2048))  # true 1080p
    assert not _use_outpairs(f16, "none", mk(32, 640, 640))   # > 2^23 px
    # correctness constraints: fp32 / fp32 tail / odd W are never paired
    assert not _use_outpairs(ModelConfig(dtype=jnp.float32), "none",
                             mk(16, 640, 640))
    assert not _use_outpairs(f16, "out", mk(16, 640, 640))
    on = ModelConfig(dtype=jnp.float16, outpairs="on")
    assert not _use_outpairs(on, "none",
                             np.zeros((1, 64, 63, 64), np.float16))
    # forced on/off for A/B runs overrides the measured gate (not legality)
    assert _use_outpairs(on, "none", mk(8, 576, 1152))
    assert not _use_outpairs(ModelConfig(dtype=jnp.float16, outpairs="off"),
                             "none", mk(16, 640, 640))


def _setup(dtype, pairlane):
    cfg = ModelConfig(dtype=dtype, pairlane=pairlane)
    # NOTE: no x5 decoder scaling here — the scaled random init's predicted
    # filters overflow f16 range in BOTH plain and pairlane paths (f16 is an
    # inference-storage option for trained checkpoints, PERF.md), and this
    # test compares error RATIOS against the fp32 graph, which tolerates the
    # 0.02-init noise amplification.
    params = init_transformer_params(jax.random.PRNGKey(0),
                                     ModelConfig(dtype=jnp.float32),
                                     with_loss_net=False)
    return cfg, params


def _run(cfg, params, frames, style):
    sf = encode_style(params, style, cfg)
    feats = encode_content(params, frames, cfg)
    stats = collect_stats(params["decoder"], feats, sf, cfg)
    return np.asarray(decode_global(params["decoder"], feats, sf, stats,
                                    cfg), np.float32)


def test_pairlane_pipeline_matches_plain():
    """pairlane must not add error beyond the low-precision noise floor:
    compare both low-precision paths against the fp32 graph."""
    style = _x((1, 64, 64, 3), 1)
    frames = _x((2, 64, 64, 3), 2)
    cfg32, params = _setup(jnp.float32, False)
    ref = _run(cfg32, params, frames, style)
    for dtype in (jnp.bfloat16, jnp.float16):
        plain = _run(ModelConfig(dtype=dtype), params, frames, style)
        pl = _run(ModelConfig(dtype=dtype, pairlane=True), params, frames,
                  style)
        e_plain = np.abs(plain - ref).mean()
        e_pl = np.abs(pl - ref).mean()
        assert np.isfinite(pl).all()
        assert pl.shape == ref.shape
        # f16 sessions run the pair-lane regions in bf16, so allow the
        # bf16-class error there; bf16 sessions must stay at their floor.
        cap = max(3.0 * e_plain, np.abs(
            _run(ModelConfig(dtype=jnp.bfloat16), params, frames, style)
            - ref).mean() * 1.5)
        assert e_pl <= cap, (dtype, e_pl, e_plain, cap)


def test_pairlane_fp32_is_inert():
    """The fp32 parity graph must never touch the Pallas path."""
    style = _x((1, 64, 64, 3), 1)
    frames = _x((1, 64, 64, 3), 2)
    cfg32, params = _setup(jnp.float32, False)
    ref = _run(cfg32, params, frames, style)
    got = _run(ModelConfig(dtype=jnp.float32, pairlane=True), params,
               frames, style)
    np.testing.assert_array_equal(got, ref)


def test_pairlane_odd_geometry_falls_back():
    """Geometry the kernels can't tile (odd W / H not divisible) silently
    uses the plain path instead of crashing."""
    cfg = ModelConfig(dtype=jnp.bfloat16, pairlane=True)
    _, params = _setup(jnp.bfloat16, True)
    f = encode_content(params, _x((1, 63, 66, 3)).astype(jnp.bfloat16), cfg)
    assert f.shape[1:] == (63 // 8, 66 // 8, 512)
