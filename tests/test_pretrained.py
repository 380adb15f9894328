"""LoadPretrained 3-stage fallback (reference ``train/train.py:124-157``):
direct load, flags-off subtree graft, legacy ``conv_kernel`` schema — plus
``--pretrained`` / ``--load_step`` wiring into the training driver."""

import dataclasses

import numpy as np
import pytest

import jax

from rerevst_tpu.config import LossConfig, ModelConfig, TrainConfig
from rerevst_tpu.io.torch_compat import (
    graft_pretrained_state_dict,
    load_pretrained,
    to_reference_state_dict,
)
from rerevst_tpu.models.transformer import init_transformer_params

CFG = ModelConfig()


def _full_params(seed=0):
    return init_transformer_params(jax.random.PRNGKey(seed), CFG,
                                   with_loss_net=True)


def _flags_off_params(full):
    """What a flags-off TransformerNet checkpoint contains: encoders +
    residual decoder, no dynamic filters, no loss net."""
    dec = {k: v for k, v in full["decoder"].items()
           if not k.startswith("filter")}
    return {"encoder": full["encoder"],
            "encoder_style": full["encoder_style"],
            "decoder": dec}


def _to_torch_sd(params):
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in to_reference_state_dict(params).items()}


def _leaves_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(np.allclose(np.asarray(x), np.asarray(y), atol=1e-7)
               for x, y in zip(la, lb))


def test_graft_direct():
    src, template = _full_params(1), _full_params(2)
    grafted, stage = graft_pretrained_state_dict(
        to_reference_state_dict(src), template)
    assert stage == "direct"
    assert _leaves_equal(grafted, src)
    assert jax.tree.structure(grafted) == jax.tree.structure(template)


def test_graft_subtree_flags_off():
    """Stage 2: encoders + decoder slices grafted, template keeps its own
    dynamic filters and loss net (the reference's module-copy graft)."""
    src, template = _full_params(1), _full_params(2)
    sd = to_reference_state_dict(_flags_off_params(src))
    grafted, stage = graft_pretrained_state_dict(sd, template)
    assert stage == "subtree"
    assert _leaves_equal(grafted["encoder"], src["encoder"])
    assert _leaves_equal(grafted["encoder_style"], src["encoder_style"])
    for k in ("res4", "res3", "res2", "out"):
        assert _leaves_equal(grafted["decoder"][k], src["decoder"][k])
    for k in ("filter1", "filter2", "filter3"):
        assert _leaves_equal(grafted["decoder"][k], template["decoder"][k])
    assert _leaves_equal(grafted["vgg_loss"], template["vgg_loss"])


def test_graft_legacy_conv_kernel():
    """Stage 3: the ancient ``Decoder.conv_kernel`` keys are tolerated."""
    src, template = _full_params(1), _full_params(2)
    sd = to_reference_state_dict(_flags_off_params(src))
    sd["Decoder.conv_kernel.weight"] = np.zeros((512, 512, 1, 1), np.float32)
    sd["Decoder.conv_kernel.bias"] = np.zeros((512,), np.float32)
    grafted, stage = graft_pretrained_state_dict(sd, template)
    assert stage == "legacy"
    assert _leaves_equal(grafted["encoder"], src["encoder"])


def test_graft_shape_mismatch_raises():
    src, template = _full_params(1), _full_params(2)
    sd = to_reference_state_dict(src)
    sd["Decoder.slice1.weight"] = np.zeros((3, 32, 3, 3), np.float32)
    with pytest.raises(ValueError, match="shape"):
        graft_pretrained_state_dict(sd, template)


def test_load_pretrained_msgpack(tmp_path):
    from rerevst_tpu.io.checkpoint import save_params

    src, template = _full_params(1), _full_params(2)
    path = str(tmp_path / "init.msgpack")
    save_params(path, src)
    loaded, stage = load_pretrained(path, template)
    assert stage == "direct"
    assert _leaves_equal(loaded, src)


# --- driver wiring ----------------------------------------------------------


@pytest.fixture()
def tiny_world(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    cdir = tmp_path / "content"
    sdir = tmp_path / "style"
    for d in (cdir, sdir):
        d.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(cdir / f"c{i}.jpg"),
                    (rng.random((80, 80, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(sdir / f"s{i}.jpg"),
                    (rng.random((80, 80, 3)) * 255).astype(np.uint8))
    return tmp_path


def _cfg(tmp_path) -> TrainConfig:
    return TrainConfig(
        batch_size=2, epochs=1, log_every=2, scalar_every=1, num_workers=1,
        load_size=72, fine_size=64, seed=0,
        content_data=str(tmp_path / "content"),
        style_data=str(tmp_path / "style"),
        out_dir=str(tmp_path / "out"), val_dir=str(tmp_path / "val"),
        log_dir=str(tmp_path / "log"),
        model=ModelConfig(),
        loss=LossConfig(flow_iter=1),
    )


def test_train_one_step_from_legacy_pth(tiny_world):
    """End-to-end: a synthetic legacy/flags-off .pth initialises training
    through --pretrained and one step runs on it."""
    import torch

    from rerevst_tpu.train.loop import train

    src = _full_params(5)
    sd = _to_torch_sd(_flags_off_params(src))
    sd["Decoder.conv_kernel.weight"] = torch.zeros(512, 512, 1, 1)
    sd["Decoder.conv_kernel.bias"] = torch.zeros(512)
    path = str(tiny_world / "legacy.pth")
    torch.save(sd, path)

    cfg = _cfg(tiny_world)
    state = train(cfg, max_steps=1, pretrained=path)
    assert int(state.step) == 1
    # The grafted encoder actually made it into the optimized params
    # (frozen-vgg aside, one Adam step moves weights by <= lr).
    got = np.asarray(jax.tree.leaves(state.params["encoder"])[0])
    want = np.asarray(jax.tree.leaves(src["encoder"])[0])
    assert np.max(np.abs(got - want)) < 5e-4


def test_load_step_selection(tiny_world):
    from rerevst_tpu.train.loop import train

    cfg = _cfg(tiny_world)
    train(cfg, max_steps=2)  # writes ckpt-step00000002
    state = train(cfg, max_steps=1, resume=True, load_step=2)
    assert int(state.step) == 3
    with pytest.raises(FileNotFoundError, match="step 7"):
        train(cfg, max_steps=1, resume=True, load_step=7)
