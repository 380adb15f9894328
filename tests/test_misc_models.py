"""UNet, KernelFilter_S ablation graph, profiling utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rerevst_tpu.config import ModelConfig
from rerevst_tpu.models.transformer import (
    TransformerNet,
    encode_style,
    init_transformer_params,
)
from rerevst_tpu.models.unet import init_unet_params, unet
from rerevst_tpu.ops.image import normalize


class TestUnet:
    def test_shapes_roundtrip(self, rng):
        params = init_unet_params(jax.random.PRNGKey(0), num_downs=5)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        y = unet(params, x, num_downs=5)
        assert y.shape == (1, 64, 64, 3)
        assert float(jnp.abs(y).max()) <= 1.0  # tanh output


class TestStyleOnlyFilters:
    def test_kernel_filter_s_graph(self, rng):
        """--dynamic_filter without --both_sty_con: style-only 3x3 predicted
        filters (KernelFilter_S, train/style_networks.py:209-249)."""
        cfg = ModelConfig(both_sty_con=False)
        net = TransformerNet(cfg)
        params = init_transformer_params(jax.random.PRNGKey(1), cfg,
                                         with_loss_net=False)
        content = normalize(jnp.asarray(
            rng.random((1, 64, 64, 3), dtype=np.float32)))
        style = normalize(jnp.asarray(
            rng.random((1, 64, 64, 3), dtype=np.float32)))
        sf = net.encode_style(params, style)
        out = net.stylize(params, content, sf)
        assert out.shape == (1, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_no_dynamic_filter_graph(self, rng):
        """AdaIN-only ablation (dynamic_filter=False)."""
        cfg = ModelConfig(dynamic_filter=False)
        net = TransformerNet(cfg)
        params = init_transformer_params(jax.random.PRNGKey(2), cfg,
                                         with_loss_net=False)
        content = normalize(jnp.asarray(
            rng.random((1, 64, 64, 3), dtype=np.float32)))
        style = normalize(jnp.asarray(
            rng.random((1, 64, 64, 3), dtype=np.float32)))
        sf = net.encode_style(params, style)
        out = net.stylize(params, content, sf)
        assert out.shape == (1, 64, 64, 3)


class TestProfiling:
    def test_time_fn(self):
        from rerevst_tpu.profiling import PhaseTimer, time_fn

        f = jax.jit(lambda x: x * 2.0 + 1.0)
        x = jnp.ones((64, 64))
        r = time_fn(f, x, iters=5)
        assert r["per_call_s"] > 0

        t = PhaseTimer()
        with t.phase("a"):
            pass
        assert "a" in t.report()


class TestVggInitSchemes:
    def test_he_relu_preserves_magnitude(self, rng):
        import jax
        import jax.numpy as jnp

        from rerevst_tpu.models import vgg

        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        p_t = vgg.init_vgg_params(jax.random.PRNGKey(0), scheme="torch")
        p_h = vgg.init_vgg_params(jax.random.PRNGKey(0), scheme="he_relu")
        f_t = vgg.vgg_features(p_t, x)
        f_h = vgg.vgg_features(p_h, x)
        # torch-default shrinks deep activations; he_relu keeps them O(1).
        assert float(jnp.std(f_h.relu4_1)) > 0.3
        assert float(jnp.std(f_h.relu4_1)) > 20 * float(jnp.std(f_t.relu4_1))
        dead = float((jnp.max(f_h.relu4_1, (0, 1, 2)) == 0).mean())
        assert dead < 0.25

    def test_unknown_scheme_raises(self):
        import jax

        from rerevst_tpu.models import vgg

        with pytest.raises(ValueError):
            vgg.init_vgg_params(jax.random.PRNGKey(0), scheme="nope")
