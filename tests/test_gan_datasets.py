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


def d_params_to_torch_state(params, n_layers=3):
    """Map our D params onto the reference NLayerDiscriminator Sequential
    indices: conv@0, (conv,bn)@(2,3),(5,6), final-stride1 (conv,bn)@(8,9),
    out conv@11."""
    sd = {}

    def put_conv(idx, p):
        sd[f"model.{idx}.weight"] = np.transpose(np.asarray(p["w"]),
                                                 (3, 2, 0, 1))
        if "b" in p:
            sd[f"model.{idx}.bias"] = np.asarray(p["b"])

    def put_bn(idx, p, c):
        sd[f"model.{idx}.weight"] = np.asarray(p["scale"])
        sd[f"model.{idx}.bias"] = np.asarray(p["bias"])
        sd[f"model.{idx}.running_mean"] = np.zeros(c, np.float32)
        sd[f"model.{idx}.running_var"] = np.ones(c, np.float32)
        sd[f"model.{idx}.num_batches_tracked"] = np.asarray(0)

    put_conv(0, params["conv0"])
    put_conv(2, params["conv1"])
    put_bn(3, params["bn1"], params["bn1"]["scale"].shape[0])
    put_conv(5, params["conv2"])
    put_bn(6, params["bn2"], params["bn2"]["scale"].shape[0])
    put_conv(8, params["conv3"])
    put_bn(9, params["bn3"], params["bn3"]["scale"].shape[0])
    put_conv(11, params["conv_out"])
    return sd


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
