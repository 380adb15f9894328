"""Discriminator/GAN parity vs reference + dataset/loader behavior."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rerevst_tpu.losses.gan import gan_loss
from rerevst_tpu.models.discriminator import (
    discriminator,
    init_discriminator_params,
)

import ref_oracle


# The D param -> torch state mapping now lives in io.torch_compat (it's
# part of the netD-epoch-N.pth train-state interop).
from rerevst_tpu.io.torch_compat import (  # noqa: E402
    discriminator_to_torch_state as d_params_to_torch_state,
)


class TestDiscriminator:
    def test_matches_reference_patchgan(self, rng):
        mod = ref_oracle.import_ref("other_networks", "train")
        net = mod.define_D(3)
        params = init_discriminator_params(jax.random.PRNGKey(4))
        sd = {k: torch.from_numpy(np.array(v, copy=True))
              for k, v in d_params_to_torch_state(params).items()}
        net.load_state_dict(sd)
        net.train()

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        ours = np.asarray(discriminator(params, jnp.asarray(x)))
        with torch.no_grad():
            theirs = ref_oracle.nhwc(net(ref_oracle.nchw(x)))
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-4)

    @pytest.mark.parametrize("mode", ["lsgan", "vanilla", "wgangp"])
    def test_gan_loss_matches_reference(self, rng, mode):
        mod = ref_oracle.import_ref("other_networks", "train")
        crit = mod.GANLoss(mode)
        pred = rng.standard_normal((2, 5, 5, 1)).astype(np.float32)
        for real in (True, False):
            got = float(gan_loss(jnp.asarray(pred), real, mode))
            want = float(crit(torch.from_numpy(pred), real))
            assert abs(got - want) < 1e-5, (mode, real)

    def test_adversarial_train_step(self, rng):
        from rerevst_tpu.config import LossConfig, ModelConfig, TrainConfig
        from rerevst_tpu.models.transformer import init_transformer_params
        from rerevst_tpu.train.state import TrainState, init_train_state
        from rerevst_tpu.train.step import make_adversarial_train_step

        cfg = TrainConfig(model=ModelConfig(), loss=LossConfig(
            flow_iter=1, adversarial_loss=True))
        g_params = init_transformer_params(jax.random.PRNGKey(0), cfg.model,
                                           with_loss_net=True)
        d_params = init_discriminator_params(jax.random.PRNGKey(1))
        g_state = init_train_state(g_params, cfg)
        step, d_opt = make_adversarial_train_step(cfg, g_params, d_params)
        d_state = TrainState(d_params, d_opt.init(d_params),
                             jnp.zeros((), jnp.int32))

        content = jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.3)
        style = jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.3)
        g_state, d_state, metrics = step(g_state, d_state, content, style,
                                         jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss_d"]))
        assert np.isfinite(float(metrics["loss_G_GAN"]))
        changed = any(jax.tree.leaves(jax.tree.map(
            lambda a, b: not np.array_equal(a, b),
            d_state.params, d_params)))
        assert changed

    def _tiny_setup(self, rng, gan_mode="lsgan"):
        from rerevst_tpu.config import LossConfig, ModelConfig, TrainConfig
        from rerevst_tpu.models.transformer import init_transformer_params
        from rerevst_tpu.train.state import TrainState, init_train_state

        cfg = TrainConfig(model=ModelConfig(), loss=LossConfig(
            flow_iter=1, adversarial_loss=True, gan_mode=gan_mode))
        g_params = init_transformer_params(jax.random.PRNGKey(0), cfg.model,
                                           with_loss_net=True)
        d_params = init_discriminator_params(jax.random.PRNGKey(1))
        g_state = init_train_state(g_params, cfg)
        content = jnp.asarray(
            rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.3)
        style = jnp.asarray(
            rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.3)
        return cfg, g_params, d_params, g_state, content, style

    @pytest.mark.parametrize("mode", ["vanilla", "wgangp"])
    def test_adversarial_step_other_gan_modes(self, rng, mode):
        """gan_mode is threaded through the step (the reference hardcodes
        lsgan, train/train.py:287; GANLoss itself supports all three)."""
        from rerevst_tpu.train.state import TrainState
        from rerevst_tpu.train.step import make_adversarial_train_step

        cfg, g_params, d_params, g_state, content, style = self._tiny_setup(
            rng, gan_mode=mode)
        step, d_opt = make_adversarial_train_step(cfg, g_params, d_params)
        d_state = TrainState(d_params, d_opt.init(d_params),
                             jnp.zeros((), jnp.int32))
        g_state, d_state, metrics = step(g_state, d_state, content, style,
                                         jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss_d"]))
        assert np.isfinite(float(metrics["loss_G_GAN"]))

    def test_single_forward_step_matches_explicit_formulation(self, rng):
        """The vjp-based single-generator-forward step produces the SAME
        updated G params as the explicit (recompute-the-forward) gradient
        of total + w*gan(D_new(styled)) — the reference's retained-graph
        semantics (train/train.py:324-415)."""
        import optax

        from rerevst_tpu.train.state import TrainState, make_optimizer
        from rerevst_tpu.train.step import (
            compute_losses,
            make_adversarial_train_step,
        )

        cfg, g_params, d_params, g_state, content, style = self._tiny_setup(
            rng)
        key = jax.random.PRNGKey(2)
        step, d_opt = make_adversarial_train_step(cfg, g_params, d_params)
        d_state = TrainState(d_params, d_opt.init(d_params),
                             jnp.zeros((), jnp.int32))
        g2, d2, metrics = step(g_state, d_state, content, style, key)

        # --- explicit two-forward reference computation -----------------
        from rerevst_tpu.losses.gan import gan_loss
        from rerevst_tpu.models.discriminator import discriminator

        _, (_, aux0) = compute_losses(g_params, content, style, key, cfg)
        styled0 = jax.lax.stop_gradient(aux0["styled"])

        def d_loss_fn(dp):
            return 0.5 * (gan_loss(discriminator(dp, styled0), False)
                          + gan_loss(discriminator(dp, style), True))

        d_grads = jax.grad(d_loss_fn)(d_params)
        d_updates, _ = d_opt.update(d_grads, d_state.opt_state, d_params)
        d_new = optax.apply_updates(d_params, d_updates)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(d2.params)[0]),
            np.asarray(jax.tree.leaves(d_new)[0]), atol=1e-6)

        def g_loss_fn(p):
            total, (_, aux) = compute_losses(p, content, style, key, cfg)
            g_gan = gan_loss(discriminator(d_new, aux["styled"]), True)
            return total + g_gan * cfg.loss.gan_weight

        g_grads_explicit = jax.grad(g_loss_fn)(g_params)

        # The gradient identity itself: the step's cotangent-injection
        # composition == grad of the explicit two-forward loss.
        def base_fn(params):
            total, (metrics, aux) = compute_losses(params, content, style,
                                                   key, cfg)
            return total, metrics, aux["styled"]

        (total0, metrics0, styled_p), base_vjp = jax.vjp(base_fn, g_params)
        _, styled_cot = jax.value_and_grad(
            lambda s: gan_loss(discriminator(d_new, s), True))(styled_p)
        zero_m = jax.tree.map(lambda v: jnp.zeros_like(jnp.asarray(v)),
                              metrics0)
        (g_grads_vjp,) = base_vjp(
            (jnp.ones_like(total0), zero_m,
             (styled_cot * cfg.loss.gan_weight).astype(styled_p.dtype)))
        for got, want in zip(jax.tree.leaves(g_grads_vjp),
                             jax.tree.leaves(g_grads_explicit)):
            g, w = np.asarray(got), np.asarray(want)
            scale = max(np.abs(w).max(), 1e-3)
            np.testing.assert_allclose(g / scale, w / scale, atol=1e-5)

        # And the step's applied update stays consistent: Adam's rsqrt on
        # near-zero second moments amplifies fp noise, so bound the param
        # delta by the Adam step size instead of demanding bitwise agreement.
        g_opt = make_optimizer(cfg, g_params)
        g_updates, _ = g_opt.update(g_grads_explicit, g_state.opt_state,
                                    g_params)
        g_expected = optax.apply_updates(g_params, g_updates)
        tot, cnt, mx = 0.0, 0, 0.0
        for got, want in zip(jax.tree.leaves(g2.params),
                             jax.tree.leaves(g_expected)):
            diff = np.abs(np.asarray(got) - np.asarray(want))
            tot, cnt, mx = tot + diff.sum(), cnt + diff.size, \
                max(mx, diff.max())
        assert mx <= 2.5 * cfg.lr, mx
        assert tot / cnt <= 0.05 * cfg.lr, tot / cnt


class TestInitSchemes:
    """init_weights parity (train/other_networks.py:28-49): all four schemes
    with torch's statistics/structure."""

    @pytest.mark.parametrize("scheme",
                             ["normal", "xavier", "kaiming", "orthogonal"])
    def test_statistics_match_torch(self, scheme):
        import torch.nn.init as tinit

        from rerevst_tpu.models.discriminator import init_conv_weight

        shape = (4, 4, 64, 128)  # kh, kw, cin, cout
        w = np.asarray(init_conv_weight(jax.random.PRNGKey(0), shape,
                                        scheme, gain=0.02))
        assert w.shape == shape
        tw = torch.empty(128, 64, 4, 4)
        if scheme == "normal":
            tinit.normal_(tw, 0.0, 0.02)
        elif scheme == "xavier":
            tinit.xavier_normal_(tw, gain=0.02)
        elif scheme == "kaiming":
            tinit.kaiming_normal_(tw, a=0, mode="fan_in")
        else:
            tinit.orthogonal_(tw, gain=0.02)
        ts = float(tw.std())
        assert abs(float(w.std()) - ts) < 0.15 * max(ts, 1e-8), (w.std(), ts)
        if scheme == "orthogonal":
            # Semi-orthogonal rows scaled by gain: W2d W2d^T = gain^2 I.
            w2d = np.transpose(w, (3, 2, 0, 1)).reshape(128, -1)
            np.testing.assert_allclose(w2d @ w2d.T,
                                       0.02 ** 2 * np.eye(128), atol=1e-6)

    def test_discriminator_init_scheme_and_cli_flag(self):
        from rerevst_tpu.models.discriminator import init_discriminator_params
        from rerevst_tpu.train.__main__ import build_parser, config_from_args

        p = init_discriminator_params(jax.random.PRNGKey(0),
                                      scheme="orthogonal")
        assert p["conv0"]["w"].shape == (4, 4, 3, 64)
        with pytest.raises(ValueError):
            init_discriminator_params(jax.random.PRNGKey(0), scheme="bogus")
        args = build_parser().parse_args(["--init_type", "xavier"])
        assert config_from_args(args).d_init == "xavier"


class TestDatasets:
    @pytest.fixture()
    def data_dirs(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        cdir, sdir = tmp_path / "content", tmp_path / "style"
        cdir.mkdir(), sdir.mkdir()
        for i in range(6):
            img = (rng.random((80, 70, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(cdir / f"c{i}.jpg"), img)
        for i in range(3):
            img = (rng.random((60, 90, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(sdir / f"s{i}.jpg"), img)
        return str(cdir), str(sdir)

    def test_frame_dataset_shapes_and_range(self, data_dirs):
        from rerevst_tpu.data.datasets import FrameDataset

        cdir, sdir = data_dirs
        ds = FrameDataset(load_size=64, fine_size=48, flip=True,
                          content_path=cdir, style_path=sdir, seed=0)
        assert len(ds) == 6
        item = ds[0]
        assert item["Content"].shape == (48, 48, 3)
        assert item["Style"].shape == (48, 48, 3)
        # ImageNet-normalized range.
        assert -3.0 < item["Content"].min() and item["Content"].max() < 3.5

    def test_loader_batches(self, data_dirs):
        from rerevst_tpu.data.datasets import FrameDataset, Loader

        cdir, sdir = data_dirs
        ds = FrameDataset(load_size=64, fine_size=48,
                          content_path=cdir, style_path=sdir, seed=0)
        loader = Loader(ds, batch_size=2, num_workers=2, seed=1)
        batches = list(loader)
        assert len(batches) == 3
        for b in batches:
            assert b["Content"].shape == (2, 48, 48, 3)
            assert b["Content"].dtype == np.float32

    def test_get_loader_factory(self, data_dirs):
        from rerevst_tpu.data.datasets import get_loader

        cdir, sdir = data_dirs
        loader = get_loader(2, load_size=64, fine_size=48,
                            content_path=cdir, style_path=sdir)
        batch = next(iter(loader))
        assert set(batch) == {"Content", "Style"}


class TestLoaderRobustness:
    def test_worker_exception_propagates(self):
        from rerevst_tpu.data.datasets import Loader

        class Broken:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i == 2:
                    raise IOError("corrupt image")
                return {"Content": np.zeros((4, 4, 3), np.float32)}

        loader = Loader(Broken(), batch_size=2, num_workers=2, seed=0,
                        shuffle=False)
        with pytest.raises(RuntimeError, match="worker failed"):
            list(loader)
