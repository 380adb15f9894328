"""Training driver: epochs, logging, validation grid, checkpointing, resume.

The functional equivalent of ``train/train.py:304-478``, keeping the
observable contract: the same scalar names at the same cadence
('temporal', 'content', 'new style', 'old style', 'recon', 'tv',
'temporal GT', 'loss_G_GAN', 'loss_d'; every 10 iters to TensorBoard,
``train/train.py:435-444``), a fixed 6x6 validation grid each log point
(``train/train.py:221-249``), and best-loss-gated checkpoints every
``log_every`` iterations (``train/train.py:446-457``) — plus restart-safe
step-tagged resume the reference lacks.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rerevst_tpu.config import TrainConfig
from rerevst_tpu.data.datasets import get_loader
from rerevst_tpu.data.transforms import bgr_to_model, model_to_bgr
from rerevst_tpu.io.checkpoint import (
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from rerevst_tpu.models.transformer import TransformerNet, init_transformer_params
from rerevst_tpu.train.state import TrainState, init_train_state
from rerevst_tpu.train.step import make_train_step

_SCALAR_NAMES = {
    "temporal": "temporal", "content": "content", "new_style": "new style",
    "old_style": "old style", "recon": "recon", "tv": "tv",
    "temporal_gt": "temporal GT", "loss_G_GAN": "loss_G_GAN",
    "loss_d": "loss_d",
}


class MetricsLogger:
    """TensorBoard (if available) + JSONL scalar sink."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            self.tb = None

    def log(self, step: int, metrics: Dict):
        vals = {k: float(v) for k, v in metrics.items()}
        self.jsonl.write(json.dumps({"step": step, **vals}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            scalars = {_SCALAR_NAMES.get(k, k): v for k, v in vals.items()
                       if k in _SCALAR_NAMES}
            self.tb.add_scalars("scalar/loss", scalars, step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class Validation:
    """Fixed 6x6 content x style render grid (``train/train.py:221-249``)."""

    def __init__(self, val_dir: str, net: TransformerNet, out_dir: str,
                 n: int = 6, size: int = 256):
        import cv2

        self.net = net
        self.out_dir = out_dir
        self.pairs = []
        contents = sorted(glob.glob(os.path.join(val_dir, "content", "*.jpg")))[:n]
        styles = sorted(glob.glob(os.path.join(val_dir, "style", "*.jpg")))[:n]
        for c, s in zip(contents, styles):
            ci = cv2.resize(cv2.imread(c), (size, size))
            si = cv2.resize(cv2.imread(s), (size, size))
            self.pairs.append((bgr_to_model(ci), bgr_to_model(si)))

    def save_results(self, params, epoch: int):
        import cv2

        os.makedirs(self.out_dir, exist_ok=True)
        cols = []
        for i, (c, s) in enumerate(self.pairs):
            out = self.net.validation(params, jnp.asarray(c), jnp.asarray(s))
            # Per-pair result|content|style stack — the reference's
            # ``Epoch[N]-validation-i`` images (``train/train.py:240-245``,
            # torch.cat along dim=2 = vertical).
            col = np.concatenate(
                [model_to_bgr(np.asarray(out)), model_to_bgr(c),
                 model_to_bgr(s)], axis=0)
            cv2.imwrite(os.path.join(
                self.out_dir, f"Epoch[{epoch}]-validation-{i}.png"), col)
            cols.append(col)
        # Plus one combined grid per epoch: all pairs side by side.
        if cols:
            cv2.imwrite(os.path.join(
                self.out_dir, f"Epoch[{epoch}]-validation.png"),
                np.concatenate(cols, axis=1))


def _save_d_state(out_dir: str, d_state: TrainState, keep: int = 3) -> str:
    """Step-tagged discriminator checkpoint: params + Adam state + step.

    The reference reloads ``netD-epoch-N.pth`` under ``--continue_training``
    (``train/train.py:281-284``) but never persists D's optimizer; here both
    survive so a resumed adversarial run continues the GAN game instead of
    restarting it.
    """
    from rerevst_tpu.io.checkpoint import save_params

    step = int(d_state.step)
    path = os.path.join(out_dir, f"netD-step{step:08d}.msgpack")
    save_params(path, {"params": d_state.params,
                       "opt_state": jax.tree.map(np.asarray, d_state.opt_state),
                       "step": np.asarray(step)})
    old = sorted(glob.glob(os.path.join(out_dir, "netD-step*.msgpack")))
    for p in old[:-keep]:
        os.remove(p)
    return path


def _restore_d_state(out_dir: str, d_params_template: Dict,
                     d_opt_template) -> Optional[TrainState]:
    """Newest netD-step* checkpoint (params + opt state + step), falling back
    to a legacy params-only ``netD.msgpack`` (fresh optimizer) if present."""
    from rerevst_tpu.io.checkpoint import load_params

    paths = sorted(glob.glob(os.path.join(out_dir, "netD-step*.msgpack")))
    if paths:
        like = {"params": d_params_template,
                "opt_state": jax.tree.map(np.asarray, d_opt_template),
                "step": np.asarray(0)}
        blob = load_params(paths[-1], like)
        opt_state = jax.tree.unflatten(jax.tree.structure(d_opt_template),
                                       jax.tree.leaves(blob["opt_state"]))
        return TrainState(blob["params"], opt_state,
                          jnp.asarray(int(blob["step"]), jnp.int32))
    legacy = os.path.join(out_dir, "netD.msgpack")
    if os.path.exists(legacy):
        params = load_params(legacy, d_params_template)
        return TrainState(params, d_opt_template, jnp.zeros((), jnp.int32))
    return None


def _dump_diagnostics(params, content, style, key, cfg, epoch, extra):
    """The reference's per-log diagnostic image dumps
    (``train/train.py:459-474``): input pair, styled result, relaxed-warped
    style + residual, recon outputs, fake second frame trio."""
    import cv2

    from rerevst_tpu.train.step import compute_losses

    _, (_, aux) = compute_losses(params, content, style, key, cfg, extra)
    os.makedirs(cfg.out_dir, exist_ok=True)

    def dump(name, x, is_image=True):
        if x is None:
            return
        arr = np.asarray(x, np.float32)
        if is_image:
            img = model_to_bgr(arr)
        else:
            a = arr[0]
            rng_ = a.max() - a.min()
            img = ((a - a.min()) / (rng_ + 1e-8) * 255)[..., ::-1]
            img = img.astype(np.uint8)
        cv2.imwrite(os.path.join(cfg.out_dir, f"{epoch}_{name}.png"), img)

    dump("FirstFrame", content)
    dump("Style", style)
    dump("StyledFirstFrame", aux.get("styled"))
    if "relaxed_style" in aux:
        dump("RelaxedStyledFirstFrame", aux["relaxed_style"])
        dump("RelaxedResidual",
             np.abs(np.asarray(aux["relaxed_style"], np.float32)
                    - np.asarray(style, np.float32)), is_image=False)
    dump("ReconFirstFrame", aux.get("recon_content"))
    dump("ReconFirstStyle", aux.get("recon_style"))
    dump("SecondFrame", aux.get("second"))
    dump("StyledSecondFrame", aux.get("styled_second"))
    dump("FakeStyledSecondFrame_1", aux.get("fake_styled_second"))


def train(cfg: TrainConfig, params: Optional[Dict] = None,
          max_steps: Optional[int] = None, resume: bool = False,
          pretrained: Optional[str] = None,
          load_step: Optional[int] = None,
          vgg_init: str = "torch") -> TrainState:
    """Run training; returns the final state.

    `pretrained` initialises params from a checkpoint (.pth via the 3-stage
    LoadPretrained graft, or native .msgpack) before training — the
    reference's ``LoadPretrained`` (``train/train.py:124-157``).  `resume`
    restores the full train state from `cfg.out_dir`; `load_step` pins a
    specific step (the ``--load_epoch`` analog) instead of the newest.
    `vgg_init` ('torch' | 'he_relu') selects the VGG init scheme for
    freshly-initialised backbones — 'he_relu' keeps deep features O(1) when
    no pretrained VGG weights exist (see ``vgg.init_vgg_params``); grafted
    subtrees from `pretrained` override it.
    """
    net = TransformerNet(cfg.model)
    # All host-side prep (param init, checkpoint graft/restore, optimizer
    # zeros) runs on the CPU backend: on remote-compile platforms (the
    # tunneled TPU) every eager op is a compile round-trip, so dozens of
    # random.normal/zeros_like shapes take tens of minutes if issued against
    # the accelerator.  The first jitted train step transfers the whole
    # state to the device once.
    import contextlib

    try:
        host = jax.default_device(jax.devices("cpu")[0])
    except Exception:
        host = contextlib.nullcontext()
    with host:
        if params is None:
            params = init_transformer_params(jax.random.PRNGKey(cfg.seed),
                                             cfg.model, with_loss_net=True,
                                             vgg_scheme=vgg_init)
        if pretrained is not None:
            from rerevst_tpu.io.torch_compat import load_pretrained

            params, stage = load_pretrained(pretrained, params)
            params = jax.tree.map(jnp.asarray, params)
            print(f"initialized from {pretrained} (stage: {stage})",
                  flush=True)
        state = init_train_state(params, cfg)
        start_step = 0
        if resume:
            if load_step is not None:
                from rerevst_tpu.io.checkpoint import checkpoint_at_step

                ck = checkpoint_at_step(cfg.out_dir, load_step)
                if ck is None:
                    raise FileNotFoundError(
                        f"Cannot find checkpoint for step {load_step} "
                        f"in {cfg.out_dir}")
            else:
                ck = latest_checkpoint(cfg.out_dir)
            if ck is not None:
                path, start_step = ck
                p, o = restore_train_state(path, state.params,
                                           state.opt_state)
                state = TrainState(p, o, jnp.asarray(start_step, jnp.int32))
                print(f"resumed from {path} @ step {start_step}", flush=True)
            if jax.process_count() > 1:
                # Checkpoint saving is chief-only: if out_dir is not a
                # shared filesystem, non-chief processes find no checkpoint
                # and would silently start from the seed init while the
                # chief resumes at step N — every subsequent pmean then
                # averages gradients from divergent parameter sets.  Verify
                # all processes restored the same step and byte-identical
                # parameters (same file => identical fingerprint).
                from jax.experimental import multihost_utils

                fp = float(sum(
                    jnp.sum(jnp.abs(l.astype(jnp.float32)))
                    for l in jax.tree.leaves(state.params)))
                views = multihost_utils.process_allgather(
                    np.asarray([float(start_step), fp], np.float64))
                if not (views == views[0]).all():
                    raise RuntimeError(
                        "--continue_training resumed divergent states "
                        f"across processes (step/fingerprint rows per "
                        f"process:\n{views}\n). out_dir must be a shared "
                        "filesystem visible to every process.")

    d_state = None
    if cfg.loss.adversarial_loss:
        if cfg.data_parallel > 1 or jax.process_count() > 1:
            # The branch ordering below would otherwise silently run the
            # adversarial step single-device while each process trains an
            # independent model on its own shard — fail loudly instead,
            # like the MPI/video combination does.
            raise NotImplementedError(
                "adversarial_loss is single-device only; drop "
                "--data_parallel / multi-process flags or the GAN loss")
        # LSGAN alternating D/G update (``train/train.py:275-287,320-415``).
        from rerevst_tpu.models.discriminator import init_discriminator_params
        from rerevst_tpu.train.step import make_adversarial_train_step

        d_params = init_discriminator_params(
            jax.random.PRNGKey(cfg.seed + 99), scheme=cfg.d_init)
        adv_step, d_opt = make_adversarial_train_step(cfg, state.params,
                                                      d_params)
        d_state = TrainState(d_params, d_opt.init(d_params),
                             jnp.zeros((), jnp.int32))
        if resume:
            restored = _restore_d_state(cfg.out_dir, d_params,
                                        d_state.opt_state)
            if restored is not None:
                d_state = restored
                print(f"resumed discriminator @ step {int(d_state.step)}",
                      flush=True)

        def step_fn(state, content, style, key, extra=None):
            nonlocal d_state
            state, d_state, metrics = adv_step(state, d_state, content,
                                               style, key)
            return state, metrics
    elif cfg.data_parallel > 1 or jax.process_count() > 1:
        # Data-parallel (possibly multi-host) training: batch sharded over
        # the mesh, grads pmean'd over ICI/DCN.  Each process's loader
        # feeds its own shard (batch_size is per process).
        if cfg.use_mpi or cfg.use_video:
            raise NotImplementedError(
                "MPI/video ablation losses are single-device only")
        from rerevst_tpu.parallel import frame_mesh
        from rerevst_tpu.train.step import make_sharded_train_step

        mesh = frame_mesh(cfg.data_parallel or None)
        sharded = make_sharded_train_step(cfg, state.params, mesh)

        def step_fn(state, content, style, key, extra=None):
            return sharded(state, content, style, key)
    else:
        step_fn = make_train_step(cfg, state.params)
    is_chief = jax.process_index() == 0
    loader = get_loader(cfg.batch_size, cfg.load_size, cfg.fine_size,
                        cfg.flip, cfg.content_data, cfg.style_data,
                        num_workers=cfg.num_workers,
                        seed=cfg.seed + 7919 * jax.process_index(),
                        use_mpi=cfg.use_mpi, use_video=cfg.use_video)
    logger = MetricsLogger(cfg.log_dir) if is_chief else None
    validation = None
    if is_chief and os.path.isdir(os.path.join(cfg.val_dir, "content")):
        validation = Validation(cfg.val_dir, net, cfg.out_dir)
        validation.save_results(state.params, 0)

    key = jax.random.PRNGKey(cfg.seed + 17)
    min_total, cur_total = np.inf, 0.0
    it = int(start_step)
    t0 = time.time()
    done = False
    try:
        for epoch in range(1, cfg.epochs + 1):
            if done:
                break
            for batch in loader:
                content = jnp.asarray(batch["Content"])
                style = jnp.asarray(batch["Style"])
                extra = {k: jnp.asarray(v) for k, v in batch.items()
                         if k not in ("Content", "Style")} or None
                key, sub = jax.random.split(key)
                state, metrics = step_fn(state, content, style, sub, extra)
                it += 1
                cur_total += float(metrics["total"])

                if it % cfg.scalar_every == 0 and is_chief:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = (time.time() - t0) / cfg.scalar_every
                    t0 = time.time()
                    print(f"[Epoch {epoch}/{cfg.epochs}][Iter {it}] "
                          f"New Style: {m['new_style']:.3f}, "
                          f"Content: {m['content']:.3f}, "
                          f"Recon: {m['recon']:.3f}, TV: {m['tv']:.3f}, "
                          f"Temporal: {m['temporal']:.3f} "
                          f"({m['temporal_gt']:.3f})  [{dt:.2f}s/it]",
                          flush=True)
                    logger.log(it, metrics)

                if it % cfg.log_every == 0 and is_chief:
                    cur_total /= cfg.log_every
                    if cur_total < min_total:
                        min_total = cur_total
                        save_train_state(cfg.out_dir, it, state.params,
                                         state.opt_state)
                        if d_state is not None:
                            _save_d_state(cfg.out_dir, d_state)
                    cur_total = 0.0
                    if validation is not None:
                        validation.save_results(state.params, epoch)
                    _dump_diagnostics(state.params, content, style, key, cfg,
                                      epoch, extra)

                if max_steps is not None and it - int(start_step) >= max_steps:
                    done = True
                    break
    finally:
        # A crash (loader death, device loss, SIGTERM-as-exception) at step
        # N-1 must not lose the run: always flush a step-tagged checkpoint
        # for whatever progress exists before re-raising.  The flush itself
        # must never raise (a device loss makes fetching params fail) — that
        # would mask the original exception and lose the real diagnostic.
        try:
            if it > int(start_step) and is_chief:
                save_train_state(cfg.out_dir, it, state.params,
                                 state.opt_state)
                if d_state is not None:
                    _save_d_state(cfg.out_dir, d_state)
        except Exception as e:  # noqa: BLE001 — diagnostic-preserving
            print(f"WARNING: crash-flush checkpoint failed: {e!r}", flush=True)
        try:
            if logger is not None:
                logger.close()
        except Exception:
            pass
    return state
