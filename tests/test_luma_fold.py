"""Rank-1 desaturation fold (vgg.encode_luma).

The inference encoder input is RGB2Gray(frame) — every channel an affine
image of one luma map (reference ``test/style_network_global.py:487-497``) —
so conv1_1 folds exactly into a 1-input-channel conv plus a constant
border-correction map.  These tests pin (a) fp32 exactness of the fold up to
reassociation, including the zero-pad border semantics, and (b) the config
gate: the fp32 byte-level parity path never takes it.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models import vgg
from rerevst_tpu.models.transformer import encode_content
from rerevst_tpu.ops.image import normalize, rgb_to_luma01, rgb_to_luma_reversed

HIGHEST = jax.lax.Precision.HIGHEST


def _img(key, shape=(2, 24, 40, 3)):
    # A plausibly-normalized image: [0,1] pixels through ImageNet normalize.
    return normalize(jax.random.uniform(key, shape, jnp.float32))


def test_rank1_identity():
    """The algebraic premise: gray3[..,c] == (luma01 - mean_c)/std_c."""
    img = _img(jax.random.PRNGKey(0))
    gray3 = rgb_to_luma_reversed(img)
    g = rgb_to_luma01(img)
    rebuilt = normalize(jnp.broadcast_to(g, img.shape))
    np.testing.assert_allclose(np.asarray(gray3), np.asarray(rebuilt),
                               atol=1e-6)


def test_encode_luma_matches_unfused_fp32():
    """Folded encoder == vgg.encode(RGB2Gray(x)) through all 11 convs at
    fp32-HIGHEST — reassociation-level agreement, borders included."""
    params = vgg.init_vgg_params(jax.random.PRNGKey(1), scheme="he_relu")
    img = _img(jax.random.PRNGKey(2), (2, 24, 40, 3))
    ref = vgg.encode(params, rgb_to_luma_reversed(img), precision=HIGHEST)
    got = vgg.encode_luma(params, rgb_to_luma01(img), precision=HIGHEST)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fold_head_border_exact():
    """conv1_1 alone: the folded form reproduces the zero-pad border rows
    (where the ones-conv correction differs from the interior constant)."""
    from rerevst_tpu.models.layers import conv2d

    params = vgg.init_vgg_params(jax.random.PRNGKey(3), scheme="he_relu")
    img = _img(jax.random.PRNGKey(4), (1, 6, 7, 3))
    ref = conv2d(params["conv1_1"], rgb_to_luma_reversed(img), padding=1,
                 precision=HIGHEST)
    # encode_luma through just the first relu: run it on a params dict whose
    # later convs are identity-free by truncating the comparison instead —
    # compare pre-relu via max(x,0) being monotone is lossy, so rebuild the
    # folded head inline with the same algebra.
    from rerevst_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

    w = params["conv1_1"]["w"].astype(jnp.float32)
    a = jnp.asarray(1.0 / IMAGENET_STD, jnp.float32)
    d = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, jnp.float32)
    w1 = jnp.einsum("hwco,c->hwo", w, a)[:, :, None, :]
    wd = jnp.einsum("hwco,c->hwo", w, d)[:, :, None, :]
    g = rgb_to_luma01(img)
    dn = ("NHWC", "HWIO", "NHWC")
    got = (jax.lax.conv_general_dilated(g, w1, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn,
                                        precision=HIGHEST)
           + jax.lax.conv_general_dilated(jnp.ones((1, 6, 7, 1)), wd, (1, 1),
                                          ((1, 1), (1, 1)),
                                          dimension_numbers=dn,
                                          precision=HIGHEST)
           + params["conv1_1"]["b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


class TestGate:
    def _params(self):
        from rerevst_tpu.models.transformer import init_transformer_params

        return init_transformer_params(jax.random.PRNGKey(5), ModelConfig(),
                                       with_loss_net=False)

    def test_fp32_never_folds_and_low_precision_does(self, monkeypatch):
        params = self._params()
        img = _img(jax.random.PRNGKey(6), (1, 16, 16, 3))
        calls = []
        orig = vgg.encode_luma
        monkeypatch.setattr(vgg, "encode_luma",
                            lambda *a, **k: calls.append(1) or orig(*a, **k))
        encode_content(params, img,
                       ModelConfig(dtype=jnp.float32, luma_fold=True))
        assert not calls  # fp32 parity path: reference op sequence untouched
        encode_content(params, img,
                       ModelConfig(dtype=jnp.bfloat16, luma_fold=True))
        assert calls  # low-precision path folds when opted in
        calls.clear()
        encode_content(params, img, ModelConfig(dtype=jnp.bfloat16))
        assert not calls  # default OFF (measured negative, see config.py)
        encode_content(params, img,
                       ModelConfig(dtype=jnp.bfloat16, luma_fold=True),
                       desaturate=False)
        assert not calls  # color (training) input: nothing to fold

    def test_fold_close_to_unfused_bf16(self):
        """End-to-end encode_content fold-on vs fold-off at bf16: same
        features up to bf16 rounding noise (relative L2)."""
        params = self._params()
        img = _img(jax.random.PRNGKey(7), (1, 32, 32, 3))
        cfg = ModelConfig(dtype=jnp.bfloat16)
        on = np.asarray(encode_content(params, img, cfg), np.float32)
        off = np.asarray(encode_content(
            params, img, dataclasses.replace(cfg, luma_fold=False)),
            np.float32)
        rel = np.linalg.norm(on - off) / max(np.linalg.norm(off), 1e-9)
        assert rel < 2e-2, rel
