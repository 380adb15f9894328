"""Full train-state <-> torch interop: the reference's per-log checkpoint
trio (style_net / optimizer / netD -epoch-N.pth, train/train.py:446-457)
exported from and imported into native train states, verified against the
live reference oracle."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rerevst_tpu.config import TrainConfig
from rerevst_tpu.io.torch_compat import (
    adam_state_from_torch,
    adam_state_to_torch,
    discriminator_from_torch_state,
    discriminator_to_torch_state,
    export_train_checkpoint,
    import_train_checkpoint,
    reference_trainable_param_order,
)
from rerevst_tpu.models.discriminator import init_discriminator_params
from rerevst_tpu.models.transformer import init_transformer_params
from rerevst_tpu.train.state import init_train_state, make_optimizer

import ref_oracle


@pytest.fixture(scope="module")
def train_state_with_moments():
    """A train state whose Adam moments are non-trivial (one synthetic
    update with deterministic pseudo-gradients — no model forward needed)."""
    import optax

    cfg = TrainConfig()
    params = init_transformer_params(jax.random.PRNGKey(0), cfg.model,
                                     with_loss_net=True)
    state = init_train_state(params, cfg)
    opt = make_optimizer(cfg, params)
    key = jax.random.PRNGKey(7)
    grads = jax.tree.map(
        lambda p: jax.random.normal(key, np.shape(p), jnp.float32) * 0.01,
        params)
    updates, opt_state = opt.update(grads, state.opt_state, params)
    params = optax.apply_updates(params, updates)
    return cfg, params, opt_state


def test_trainable_order_matches_oracle():
    """Our hardcoded Adam param-index order == the oracle's
    filter(requires_grad, named_parameters()) order (train/train.py:175)."""
    mod = ref_oracle.import_ref("style_networks", "train")
    net = mod.TransformerNet(dynamic_filter=True, both_sty_con=True,
                             train_only_decoder=False,
                             style_content_loss=True, recon_loss=True,
                             relax_style=True)
    want = [n for n, p in net.named_parameters() if p.requires_grad]
    assert reference_trainable_param_order() == want


def test_export_loads_into_reference_drop_in(train_state_with_moments,
                                             tmp_path):
    """The exported trio loads into the reference's own modules with STRICT
    state_dicts — G into TransformerNet (the LoadPretrained stage-1 path,
    train/train.py:124-127), the optimizer into torch Adam over the same
    trainable params, D into define_D(3)."""
    cfg, params, opt_state = train_state_with_moments
    d_params = init_discriminator_params(jax.random.PRNGKey(3))
    out = export_train_checkpoint(str(tmp_path), 1, params,
                                  opt_state=opt_state, d_params=d_params,
                                  lr=cfg.lr)
    assert set(out) == {"style_net", "optimizer", "netD"}

    mod = ref_oracle.import_ref("style_networks", "train")
    net = mod.TransformerNet(dynamic_filter=True, both_sty_con=True,
                             train_only_decoder=False,
                             style_content_loss=True, recon_loss=True,
                             relax_style=True)
    sd = torch.load(out["style_net"], map_location="cpu", weights_only=True)
    net.load_state_dict(sd)  # strict: all keys, no extras

    optim = torch.optim.Adam(
        [p for p in net.parameters() if p.requires_grad], lr=cfg.lr)
    optim.load_state_dict(torch.load(out["optimizer"], map_location="cpu",
                                     weights_only=False))
    # Spot-check moment content + layout: param 0 is Decoder.slice4.conv1.
    from rerevst_tpu.io.torch_compat import _find_adam_state

    adam = _find_adam_state(opt_state)
    got = optim.state_dict()["state"][0]["exp_avg"].numpy()
    want = np.transpose(
        np.asarray(adam.mu["decoder"]["res4"]["conv1"]["w"]), (3, 2, 0, 1))
    np.testing.assert_allclose(got, want, atol=1e-7)

    dmod = ref_oracle.import_ref("other_networks", "train")
    netD = dmod.define_D(3)
    netD.load_state_dict(torch.load(out["netD"], map_location="cpu",
                                    weights_only=True))


def test_train_state_roundtrip_through_torch(train_state_with_moments,
                                             tmp_path):
    """export -> import restores params, Adam moments, step count, and D."""
    cfg, params, opt_state = train_state_with_moments
    d_params = init_discriminator_params(jax.random.PRNGKey(3))
    out = export_train_checkpoint(str(tmp_path), 1, params,
                                  opt_state=opt_state, d_params=d_params,
                                  lr=cfg.lr)

    template = init_transformer_params(jax.random.PRNGKey(99), cfg.model,
                                       with_loss_net=True)
    state0 = init_train_state(template, cfg)
    params2, opt2, step, d2 = import_train_checkpoint(
        out["style_net"], template, state0.opt_state,
        optimizer_pth=out["optimizer"], netd_pth=out["netD"])

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    from rerevst_tpu.io.torch_compat import _find_adam_state

    a1, a2 = _find_adam_state(opt_state), _find_adam_state(opt2)
    assert step == int(np.asarray(a1.count)) == int(np.asarray(a2.count))
    for a, b in zip(jax.tree.leaves(a1.mu), jax.tree.leaves(a2.mu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(a1.nu), jax.tree.leaves(a2.nu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(d_params), jax.tree.leaves(d2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_adam_torch_format_is_loadable_standalone(train_state_with_moments):
    """The torch-format blob round-trips through adam_state_from_torch even
    with string state keys (torch picklers vary)."""
    cfg, params, opt_state = train_state_with_moments
    blob = adam_state_to_torch(opt_state, lr=cfg.lr)
    assert sorted(blob) == ["param_groups", "state"]
    blob_str = {"state": {str(k): v for k, v in blob["state"].items()},
                "param_groups": blob["param_groups"]}
    state0 = init_train_state(params, cfg)
    opt2, step = adam_state_from_torch(blob_str, state0.opt_state, params)
    from rerevst_tpu.io.torch_compat import _find_adam_state

    a1, a2 = _find_adam_state(opt_state), _find_adam_state(opt2)
    for a, b in zip(jax.tree.leaves(a1.mu), jax.tree.leaves(a2.mu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert step == int(np.asarray(a1.count))


def test_discriminator_state_roundtrip():
    d = init_discriminator_params(jax.random.PRNGKey(5))
    sd = discriminator_to_torch_state(d)
    back = discriminator_from_torch_state(sd)
    for a, b in zip(jax.tree.leaves(d), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_convert_cli_train_modes(train_state_with_moments, tmp_path):
    """The convert CLI round-trips a native train checkpoint through the
    reference .pth trio."""
    import glob
    import os

    from rerevst_tpu.convert import main as convert_main
    from rerevst_tpu.io.checkpoint import save_params, save_train_state
    from rerevst_tpu.train.state import TrainState

    cfg, params, opt_state = train_state_with_moments
    native = tmp_path / "native"
    native.mkdir()
    ck = save_train_state(str(native), 7, params, opt_state)
    d_params = init_discriminator_params(jax.random.PRNGKey(3))
    import optax

    d_opt_state = optax.adam(1e-4, b1=0.5, b2=0.9).init(d_params)
    from rerevst_tpu.train.loop import _save_d_state

    _save_d_state(str(native),
                  TrainState(d_params, d_opt_state,
                             jnp.asarray(7, jnp.int32)))

    torch_dir = tmp_path / "torch"
    convert_main([ck, str(torch_dir), "--train-export"])
    assert os.path.exists(torch_dir / "style_net-epoch-7.pth")
    assert os.path.exists(torch_dir / "optimizer-epoch-7.pth")
    assert os.path.exists(torch_dir / "netD-epoch-7.pth")

    native2 = tmp_path / "native2"
    convert_main([str(torch_dir / "style_net-epoch-7.pth"), str(native2),
                  "--train-import",
                  "--optimizer", str(torch_dir / "optimizer-epoch-7.pth"),
                  "--netd", str(torch_dir / "netD-epoch-7.pth")])
    assert glob.glob(str(native2 / "ckpt-step*.msgpack"))
    assert glob.glob(str(native2 / "netD-step*.msgpack"))


def test_train_export_pairs_netd_with_generator_step(train_state_with_moments,
                                                     tmp_path):
    """--train-export must pair D at the SAME step as the G checkpoint,
    not whatever netD-step* file is newest in the directory."""
    import optax
    import torch

    from rerevst_tpu.convert import main as convert_main
    from rerevst_tpu.io.checkpoint import save_train_state
    from rerevst_tpu.train.loop import _save_d_state
    from rerevst_tpu.train.state import TrainState

    cfg, params, opt_state = train_state_with_moments
    native = tmp_path / "native"
    native.mkdir()
    ck7 = save_train_state(str(native), 7, params, opt_state)
    save_train_state(str(native), 9, params, opt_state)
    d7 = init_discriminator_params(jax.random.PRNGKey(3))
    d9 = jax.tree.map(lambda a: a * 2.0, d7)
    d_opt = optax.adam(1e-4, b1=0.5, b2=0.9)
    for step, dp in ((7, d7), (9, d9)):
        _save_d_state(str(native),
                      TrainState(dp, d_opt.init(dp),
                                 jnp.asarray(step, jnp.int32)))

    torch_dir = tmp_path / "torch"
    convert_main([ck7, str(torch_dir), "--train-export"])
    sd = torch.load(str(torch_dir / "netD-epoch-7.pth"),
                    map_location="cpu", weights_only=True)
    # Skip the synthesized BatchNorm running stats (running_var is ones —
    # exactly +896 over the jax tree, which carries none).
    got = sum(float(v.abs().sum()) for k, v in sd.items()
              if not k.endswith(("running_mean", "running_var",
                                 "num_batches_tracked")))
    want = sum(float(np.abs(np.asarray(l)).sum())
               for l in jax.tree.leaves(d7))
    # Whole-tree magnitude matches D@7 (D@9 is exactly 2x everywhere).
    assert abs(got - want) < 1e-3 * want
