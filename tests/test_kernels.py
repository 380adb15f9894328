"""Pallas kernels vs their XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rerevst_tpu.kernels import (
    dynamic_filter_pair,
    dynamic_filter_pair_xla,
    norm_affine_clamp,
    norm_affine_clamp_xla,
)
from rerevst_tpu.models.transformer import NormStats


class TestFilterChain:
    @pytest.mark.parametrize("shape", [(1, 8, 8, 32), (2, 10, 12, 32)])
    def test_matches_xla(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        f1 = jnp.asarray(rng.standard_normal((1, 32, 32)).astype(np.float32) * 0.2)
        f2 = jnp.asarray(rng.standard_normal((1, 32, 32)).astype(np.float32) * 0.2)
        want = dynamic_filter_pair_xla(x, f1, f2,
                                       precision=jax.lax.Precision.HIGHEST)
        got = dynamic_filter_pair(x, f1, f2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_nonmultiple_tile(self, rng):
        # 1*3*5*32 = 480 rows: not a multiple of the tile -> masked padding.
        x = jnp.asarray(rng.standard_normal((1, 3, 5, 32)).astype(np.float32))
        f1 = jnp.asarray(np.eye(32, dtype=np.float32)[None])
        f2 = jnp.asarray(np.eye(32, dtype=np.float32)[None])
        got = dynamic_filter_pair(x, f1, f2, interpret=True)
        # identity filters + positive/negative leaky: y = leaky(x)
        want = jnp.where(x >= 0, x, 0.2 * x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


class TestConv3x3ImplicitGemm:
    """The round-3 implicit-GEMM conv attempt for the roofline-worst
    640^2 64-channel boundary layers (PERF.md); exactness here, speed
    measured on the real chip by scripts/bench_conv3x3.py."""

    @pytest.mark.parametrize("shape_o", [((2, 16, 24, 64), 64),
                                         ((1, 8, 16, 64), 3)])
    def test_matches_lax_conv(self, rng, shape_o):
        from rerevst_tpu.kernels.conv3x3 import (
            conv3x3_implicit_gemm,
            conv3x3_nine_shift,
        )

        shape, o = shape_o
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((3, 3, shape[-1], o)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST) + b
        got = conv3x3_implicit_gemm(x, w, b, tile_h=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        got2 = conv3x3_nine_shift(x, w, b,
                                  precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                                   atol=2e-5)

    def test_rejects_nondivisible_tile(self, rng):
        from rerevst_tpu.kernels.conv3x3 import conv3x3_implicit_gemm

        x = jnp.zeros((1, 10, 16, 64))
        w = jnp.zeros((3, 3, 64, 64))
        with pytest.raises(ValueError, match="divisible"):
            conv3x3_implicit_gemm(x, w, tile_h=8, interpret=True)


class TestConv3x3Pairlane:
    """The pair-lane formulation (round 3): two adjacent W pixels fused into
    the 128-lane dim, fully dense K and N.  Beats the ISOLATED XLA conv on
    the real chip (7.8 vs 13.9 ms — first Pallas win in this repo) but
    loses composed (PERF.md); kept exact and off by default."""

    @pytest.mark.parametrize("shape_o", [((2, 16, 24, 64), 64),
                                         ((1, 8, 16, 64), 3),
                                         ((1, 8, 32, 64), 32)])
    def test_matches_lax_conv(self, rng, shape_o):
        from rerevst_tpu.kernels.conv3x3 import conv3x3_pairlane

        shape, o = shape_o
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((3, 3, 64, o)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST) + b
        got = conv3x3_pairlane(x, w, b, tile_h=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_fused_io_layout(self, rng):
        """fused_io: [B,H,W/2,128] in, cols pos*64+o out — the region form."""
        from rerevst_tpu.kernels.conv3x3 import conv3x3_pairlane
        from rerevst_tpu.models.layers import unfuse_pairs

        x = jnp.asarray(rng.standard_normal((1, 8, 16, 64)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.1)
        want = conv3x3_pairlane(x, w, tile_h=8, interpret=True)
        of = conv3x3_pairlane(x.reshape(1, 8, 8, 128), w, tile_h=8,
                              interpret=True, fused_io=True)
        got = unfuse_pairs(of, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_rejects_f16(self):
        from rerevst_tpu.kernels.conv3x3 import conv3x3_pairlane

        with pytest.raises(TypeError, match="f16"):
            conv3x3_pairlane(jnp.zeros((1, 8, 16, 64), jnp.float16),
                             jnp.zeros((3, 3, 64, 64), jnp.float16),
                             interpret=True)


class TestNormAffine:
    def test_matches_xla(self, rng):
        c = 64
        x = jnp.asarray(rng.standard_normal((2, 6, 7, c)).astype(np.float32))
        st = NormStats(
            mean=jnp.asarray(rng.standard_normal((1, 1, 1, c)).astype(np.float32)),
            rstd=jnp.asarray((0.5 + rng.random((1, 1, 1, c))).astype(np.float32)),
            xmin=jnp.asarray((-2 - rng.random((1, 1, 1, c))).astype(np.float32)),
            xmax=jnp.asarray((2 + rng.random((1, 1, 1, c))).astype(np.float32)),
        )
        s = jnp.asarray((1 + rng.random((1, 1, 1, c))).astype(np.float32))
        m = jnp.asarray(rng.standard_normal((1, 1, 1, c)).astype(np.float32))
        want = norm_affine_clamp_xla(x, st, s, m)
        got = norm_affine_clamp(x, st, s, m, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_clamp_engages(self, rng):
        c = 32
        x = jnp.asarray((rng.standard_normal((1, 4, 4, c)) * 10).astype(np.float32))
        st = NormStats(
            mean=jnp.zeros((1, 1, 1, c)), rstd=jnp.ones((1, 1, 1, c)),
            xmin=jnp.full((1, 1, 1, c), -1.0), xmax=jnp.full((1, 1, 1, c), 1.0),
        )
        s = jnp.ones((1, 1, 1, c))
        m = jnp.zeros((1, 1, 1, c))
        got = np.asarray(norm_affine_clamp(x, st, s, m, interpret=True))
        assert got.min() >= -1.0 - 1e-6 and got.max() <= 1.0 + 1e-6
