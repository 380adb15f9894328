"""Parity-packed (space-to-depth) boundary convs == true-layout ops.

The packed forms exist purely for TPU MXU tiling (see layers.py module
note); these tests pin their exact semantics against the direct ops on CPU
fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from rerevst_tpu.models.layers import (
    conv2d,
    conv3x3_packed,
    depth_to_space_2x,
    init_conv_normal,
    max_pool_2x2,
    max_pool_2x2_packed,
    space_to_depth_2x,
    tile_packed,
    upsample2x_conv3x3,
    upsample2x_conv3x3_packed,
)
from rerevst_tpu.ops.resize import upsample_nearest_2x

PREC = lax.Precision.HIGHEST


def _x(shape, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_s2d_d2s_roundtrip():
    x = _x((2, 8, 10, 3))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space_2x(space_to_depth_2x(x))), np.asarray(x))


def test_s2d_layout_convention():
    """Channel group g = row_parity*2 + col_parity, group-major."""
    x = _x((1, 4, 4, 2))
    p = space_to_depth_2x(x)
    for pa in (0, 1):
        for pb in (0, 1):
            g = pa * 2 + pb
            np.testing.assert_array_equal(
                np.asarray(p[0, :, :, g * 2:(g + 1) * 2]),
                np.asarray(x[0, pa::2, pb::2, :]))


def test_maxpool_packed_matches_true():
    x = _x((2, 12, 16, 5))
    a = max_pool_2x2(x)
    b = max_pool_2x2_packed(space_to_depth_2x(x))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("cin,cout,hw", [(3, 8, 12), (8, 8, 16), (5, 7, 10)])
def test_conv3x3_packed_matches_conv2d(cin, cout, hw):
    p = init_conv_normal(jax.random.PRNGKey(1), 3, 3, cin, cout, gain=0.5)
    x = _x((2, hw, hw, cin))
    true = conv2d(p, x, padding=1, precision=PREC)
    packed = conv3x3_packed(p, space_to_depth_2x(x), precision=PREC)
    np.testing.assert_allclose(np.asarray(depth_to_space_2x(packed)),
                               np.asarray(true), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cin,cout,hw", [(8, 4, 6), (16, 8, 10)])
def test_upsample_conv_packed_matches_dilated(cin, cout, hw):
    p = init_conv_normal(jax.random.PRNGKey(2), 3, 3, cin, cout, gain=0.5)
    x = _x((2, hw, hw, cin))
    dilated = upsample2x_conv3x3(p, x, precision=PREC)
    packed = upsample2x_conv3x3_packed(p, x, precision=PREC)
    np.testing.assert_allclose(np.asarray(depth_to_space_2x(packed)),
                               np.asarray(dilated), rtol=1e-4, atol=1e-5)
    # and both == the naive reference
    naive = conv2d(p, upsample_nearest_2x(x), padding=1, precision=PREC)
    np.testing.assert_allclose(np.asarray(dilated), np.asarray(naive),
                               rtol=1e-4, atol=1e-5)


def test_packed_pipeline_matches_direct():
    """cfg.parity_packed must not change encode_content/decode_global
    numerics (beyond fp reassociation) — full graph, well-conditioned
    weights."""
    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.models.transformer import (
        collect_stats,
        decode_global,
        encode_content,
        encode_style,
        init_transformer_params,
    )

    base = ModelConfig(dtype=jnp.float32)
    packed = ModelConfig(dtype=jnp.float32, parity_packed=True)
    params = init_transformer_params(jax.random.PRNGKey(0), base,
                                     with_loss_net=False)
    params["decoder"] = jax.tree.map(lambda a: a * 5.0, params["decoder"])
    style = _x((1, 64, 64, 3), 1) * 0.5
    frames = _x((2, 64, 64, 3), 2) * 0.5

    sf = encode_style(params, style, base)
    fa = encode_content(params, frames, base)
    fb = encode_content(params, frames, packed)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                               rtol=1e-4, atol=1e-5)

    stats = collect_stats(params["decoder"], fa, sf, base)
    ya = decode_global(params["decoder"], fa, sf, stats, base)
    yb = decode_global(params["decoder"], fa, sf, stats, packed)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=1e-4, atol=1e-4)


def test_packed_encoder_odd_size_falls_back():
    """Odd spatial sizes (possible for raw Pass-1 frames) silently use the
    direct path instead of crashing in space_to_depth."""
    from rerevst_tpu.config import ModelConfig
    from rerevst_tpu.models.transformer import (
        encode_content,
        init_transformer_params,
    )

    cfg = ModelConfig(dtype=jnp.float32, parity_packed=True)
    params = init_transformer_params(jax.random.PRNGKey(0), cfg,
                                     with_loss_net=False)
    f = encode_content(params, _x((1, 63, 66, 3)), cfg)
    assert f.shape[1:] == (63 // 8, 66 // 8, 512)


def test_tile_packed_group_major():
    s = jnp.arange(6, dtype=jnp.float32).reshape(1, 1, 1, 6)
    t = tile_packed(s)
    assert t.shape == (1, 1, 1, 24)
    for g in range(4):
        np.testing.assert_array_equal(np.asarray(t[..., g * 6:(g + 1) * 6]),
                                      np.asarray(s))
