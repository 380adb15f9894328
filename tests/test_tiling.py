"""Exact overlap-and-discard spatial tiling (ops/tiling.py).

The frozen-stats Pass-2 graph has no cross-spatial reductions, so H-tiling
its full-resolution regions must reproduce the untiled pixels (the tiling
is the round-5 answer to the true-1080p HBM ceiling — PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models import vgg
from rerevst_tpu.models.layers import conv2d, max_pool_2x2, upsample2x_conv3x3
from rerevst_tpu.models.transformer import (
    collect_stats,
    decode_global,
    encode_content,
    encode_style,
    init_transformer_params,
)
from rerevst_tpu.ops.tiling import can_tile_h, tiled_over_h


class TestTiledOverH:
    def _x(self, shape, key=0):
        return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)

    def test_identity_region(self):
        x = self._x((2, 32, 16, 4))
        fn = lambda v: v * 2.0 + 1.0
        np.testing.assert_array_equal(tiled_over_h(fn, x, 4, 2), fn(x))

    def test_conv_stack_region(self):
        """Two SAME convs: rf 2 — halo 2 must be exact, including the
        shifted edge tiles whose kept region touches the image boundary."""
        k1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8)) * 0.3
        k2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 4)) * 0.3
        p1, p2 = {"w": k1}, {"w": k2}

        def fn(v):
            h = conv2d(p1, v, padding=1)
            return conv2d(p2, jnp.tanh(h), padding=1)

        x = self._x((2, 40, 12, 4))
        for t in (2, 4, 5):
            np.testing.assert_allclose(tiled_over_h(fn, x, t, 2), fn(x),
                                       rtol=1e-6, atol=1e-6)

    def test_downscaling_region(self):
        """conv + 2x2 pool (the encoder-head shape): scale (1, 2)."""
        p = {"w": jax.random.normal(jax.random.PRNGKey(3), (3, 3, 4, 4)) * 0.3}

        def fn(v):
            return max_pool_2x2(jnp.maximum(conv2d(p, v, padding=1), 0.0))

        x = self._x((1, 48, 8, 4))
        np.testing.assert_allclose(
            tiled_over_h(fn, x, 3, 2, scale=(1, 2)), fn(x),
            rtol=1e-6, atol=1e-6)

    def test_upscaling_region(self):
        """Fused upsample2x-conv3x3 (the decoder-tail shape): scale (2, 1)."""
        p = {"w": jax.random.normal(jax.random.PRNGKey(4), (3, 3, 4, 4)) * 0.3,
             "b": jnp.zeros((4,))}

        def fn(v):
            return upsample2x_conv3x3(p, v)

        x = self._x((2, 24, 8, 4))
        np.testing.assert_allclose(
            tiled_over_h(fn, x, 4, 2, scale=(2, 1)), fn(x),
            rtol=1e-6, atol=1e-6)

    def test_can_tile_h_gates(self):
        assert can_tile_h(64, 4, 4, (1, 2), align=2)
        assert not can_tile_h(64, 3, 4, (1, 1))      # 64 % 3
        assert not can_tile_h(16, 4, 4, (1, 1))      # th < 2*halo
        assert not can_tile_h(64, 4, 3, (1, 1), align=2)  # halo not aligned
        assert can_tile_h(64, 1, 4, (1, 1)) is False  # n_tiles <= 1


CFG = ModelConfig()


def _setup(hw=(64, 96), batch=2):
    params = init_transformer_params(jax.random.PRNGKey(0), CFG,
                                     with_loss_net=False)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    h, w = hw
    style = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3)) * 0.5
    frames = jax.random.normal(jax.random.PRNGKey(2), (batch, h, w, 3)) * 0.5
    sf = encode_style(params, style, CFG)
    feats = encode_content(params, frames, CFG)
    stats = collect_stats(params["decoder"], feats, sf, CFG)
    return params, frames, sf, stats


class TestModelTiling:
    @pytest.fixture(scope="class")
    def setup(self):
        return _setup()

    @pytest.mark.parametrize("tiles", [2, 4])
    def test_pass2_tiled_matches_untiled(self, setup, tiles):
        """encoder-head + decoder-tail tiling: full Pass-2 pixels equal."""
        params, frames, sf, stats = setup
        import dataclasses

        ref_cfg = CFG
        tiled_cfg = dataclasses.replace(CFG, spatial_tiles=tiles)

        def run(cfg):
            f = encode_content(params, frames, cfg, desaturate=True)
            return decode_global(params["decoder"], f, sf, stats, cfg)

        ref = jax.jit(lambda: run(ref_cfg))()
        got = jax.jit(lambda: run(tiled_cfg))()
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_encoder_tiled_matches_untiled(self, setup):
        params, frames, *_ = setup
        from rerevst_tpu.ops.image import rgb_to_luma_reversed

        x = rgb_to_luma_reversed(frames)
        ref = vgg.encode(params["encoder"], x,
                         precision=jax.lax.Precision.HIGHEST)
        got = vgg.encode(params["encoder"], x,
                         precision=jax.lax.Precision.HIGHEST, head_tiles=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_indivisible_geometry_falls_back(self, setup):
        """H not divisible by the tile count -> the untiled graph runs
        (no crash, identical output)."""
        params, frames, sf, stats = setup
        import dataclasses

        cfg = dataclasses.replace(CFG, spatial_tiles=7)  # 64 % 7 != 0

        def run(c):
            f = encode_content(params, frames, c, desaturate=True)
            return decode_global(params["decoder"], f, sf, stats, c)

        np.testing.assert_array_equal(np.asarray(run(cfg)),
                                      np.asarray(run(CFG)))
