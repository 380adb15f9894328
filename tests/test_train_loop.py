"""End-to-end training-driver smoke: data -> steps -> logs -> checkpoint -> resume."""

import glob
import json
import os

import numpy as np
import pytest

from rerevst_tpu.config import LossConfig, ModelConfig, TrainConfig


@pytest.fixture()
def tiny_world(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    cdir = tmp_path / "content"
    sdir = tmp_path / "style"
    vdirc = tmp_path / "val" / "content"
    vdirs = tmp_path / "val" / "style"
    for d in (cdir, sdir, vdirc, vdirs):
        d.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(cdir / f"c{i}.jpg"),
                    (rng.random((80, 80, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(sdir / f"s{i}.jpg"),
                    (rng.random((80, 80, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(vdirc / f"c{i}.jpg"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(vdirs / f"s{i}.jpg"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))
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


def test_train_two_steps_logs_and_checkpoints(tiny_world):
    from rerevst_tpu.io.checkpoint import latest_checkpoint
    from rerevst_tpu.train.loop import train

    cfg = _cfg(tiny_world)
    state = train(cfg, max_steps=2)
    assert int(state.step) == 2
    # JSONL scalars written.
    lines = open(os.path.join(cfg.log_dir, "scalars.jsonl")).readlines()
    assert len(lines) >= 2
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["total"])
    # Checkpoint exists; validation grid rendered.
    assert latest_checkpoint(cfg.out_dir) is not None
    assert glob.glob(os.path.join(cfg.out_dir, "Epoch*validation*.png"))


def test_resume_continues_from_checkpoint(tiny_world):
    from rerevst_tpu.train.loop import train

    cfg = _cfg(tiny_world)
    train(cfg, max_steps=2)
    state = train(cfg, max_steps=1, resume=True)
    assert int(state.step) >= 3


def test_crash_mid_loop_still_checkpoints(tiny_world, monkeypatch):
    """A crash between log points must not lose the run: the loop's finally
    block flushes a step-tagged checkpoint for whatever progress exists."""
    import dataclasses

    from rerevst_tpu.io.checkpoint import latest_checkpoint
    from rerevst_tpu.train import loop as loop_mod

    cfg = _cfg(tiny_world)
    # log_every high enough that no loss-gated save ever runs.
    cfg = dataclasses.replace(cfg, log_every=100, epochs=10)

    calls = {"n": 0}
    real_log = loop_mod.MetricsLogger.log

    def bomb(self, step, metrics):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated loader/device death")
        return real_log(self, step, metrics)

    monkeypatch.setattr(loop_mod.MetricsLogger, "log", bomb)
    with pytest.raises(RuntimeError, match="simulated"):
        loop_mod.train(cfg, max_steps=50)
    ck = latest_checkpoint(cfg.out_dir)
    assert ck is not None and ck[1] == 2


def test_adversarial_loop_trains_discriminator(tiny_world):
    """--adaversarial_loss wires the alternating D/G step into the loop."""
    import dataclasses

    from rerevst_tpu.train.loop import train

    cfg = _cfg(tiny_world)
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, adversarial_loss=True))
    state = train(cfg, max_steps=2)
    assert int(state.step) == 2
    lines = open(os.path.join(cfg.log_dir, "scalars.jsonl")).readlines()
    rec = json.loads(lines[-1])
    assert "loss_d" in rec and np.isfinite(rec["loss_d"])
    assert "loss_G_GAN" in rec and np.isfinite(rec["loss_G_GAN"])
    # Step-tagged D checkpoint (params + optimizer) written at the log point.
    assert glob.glob(os.path.join(cfg.out_dir, "netD-step*.msgpack"))


def test_gan_resume_restores_discriminator(tiny_world):
    """train -> kill -> resume continues D (params, Adam state, step counter)
    instead of re-initializing the GAN game (the reference reloads
    netD-epoch-N.pth, train/train.py:281-284 — but drops D's optimizer)."""
    import dataclasses

    from flax import serialization

    from rerevst_tpu.train.loop import train

    cfg = _cfg(tiny_world)
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, adversarial_loss=True))
    train(cfg, max_steps=2)
    d_cks = sorted(glob.glob(os.path.join(cfg.out_dir, "netD-step*.msgpack")))
    assert d_cks, "no discriminator checkpoint written"
    blob = serialization.msgpack_restore(open(d_cks[-1], "rb").read())
    saved_step = int(blob["step"])
    assert saved_step == 2
    # Adam state persisted and non-trivial (mu != 0 after 2 steps).
    opt_leaves = [np.asarray(v) for v in
                  __import__("jax").tree.leaves(blob["opt_state"])
                  if np.asarray(v).ndim > 0]
    assert any(np.abs(leaf).max() > 0 for leaf in opt_leaves)

    train(cfg, max_steps=1, resume=True)
    d_cks2 = sorted(glob.glob(os.path.join(cfg.out_dir, "netD-step*.msgpack")))
    blob2 = serialization.msgpack_restore(open(d_cks2[-1], "rb").read())
    # Continuity: the new D checkpoint's step counter CONTINUES from the
    # restored one (a re-initialized D would restart at step 1).
    assert int(blob2["step"]) == saved_step + 1


def test_validation_writes_combined_grid(tiny_world):
    from rerevst_tpu.train.loop import train

    cfg = _cfg(tiny_world)
    train(cfg, max_steps=2)
    # One combined grid image per epoch in addition to the reference's
    # per-pair Epoch[N]-validation-i files.
    grids = [p for p in glob.glob(
        os.path.join(cfg.out_dir, "Epoch*-validation.png"))]
    assert grids
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread(grids[0])
    n_pairs = len(glob.glob(os.path.join(cfg.val_dir, "content", "*.jpg")))
    # result|content|style stacked vertically, pairs side by side.
    assert img.shape[1] == img.shape[0] // 3 * n_pairs


def test_adversarial_plus_data_parallel_fails_loudly(tiny_world):
    """GAN training is single-device; combining it with --data_parallel must
    raise instead of silently running each process's model un-pmean'd."""
    import dataclasses

    from rerevst_tpu.train.loop import train

    cfg = _cfg(tiny_world)
    cfg = dataclasses.replace(
        cfg, data_parallel=2,
        loss=dataclasses.replace(cfg.loss, adversarial_loss=True))
    with pytest.raises(NotImplementedError, match="adversarial"):
        train(cfg, max_steps=1)
