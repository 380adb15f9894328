"""One fused training step (the reference's G update, ``train/train.py:353-415``).

The whole step — forward, all losses including the 16-iteration relaxed-style
inner optimization, backward, Adam — compiles to a single XLA program.  On a
mesh it runs data-parallel: batch sharded, params replicated, gradients
psum-averaged (``make_sharded_train_step``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rerevst_tpu.config import TrainConfig
from rerevst_tpu.losses.perceptual import content_loss, style_loss, tv_loss
from rerevst_tpu.losses.relaxed import relaxed_style_loss
from rerevst_tpu.losses.temporal import generate_fake_data, temporal_loss
from rerevst_tpu.models import vgg
from rerevst_tpu.models.layers import precision_for
from rerevst_tpu.models.transformer import decode, encode_style
from rerevst_tpu.ops.image import rgb_to_luma_reversed
from rerevst_tpu.train.state import TrainState, make_optimizer


def compute_losses(params: Dict, content, style, key, cfg: TrainConfig,
                   extra: Dict = None) -> Tuple[jnp.ndarray, Dict]:
    """Total weighted loss + metric/aux dict.

    Faithful to the reference's asymmetries: the encoder sees *color* content
    (``train/style_networks.py:570``) while the content-loss target is VGG of
    the *gray* content (``:580-588``); recon encodes the gray style
    (``:665-668``); the temporal pass uses validation() on the color fake
    second frame (``train/train.py:375-384``).
    """
    mcfg, lcfg = cfg.model, cfg.loss
    prec = precision_for(mcfg.dtype, mcfg.precision)
    metrics: Dict = {}
    aux: Dict = {}

    if cfg.remat:
        # Rematerialize the decode in the backward pass: activation memory
        # for the three decode calls per step drops to one checkpoint each.
        decode_ = jax.checkpoint(
            lambda pd, f, s: decode(pd, f, s, mcfg), static_argnums=())
    else:
        decode_ = lambda pd, f, s: decode(pd, f, s, mcfg)  # noqa: E731

    gray_content = rgb_to_luma_reversed(content)
    f_content = vgg.encode(params["encoder"], content, prec)
    sf = encode_style(params, style, mcfg)
    styled = decode_(params["decoder"], f_content, sf)
    aux["styled"] = styled

    total = 0.0

    if lcfg.style_content_loss:
        f_styled = vgg.vgg_features(params["vgg_loss"], styled, "relu4_1", prec)
        f_content_gt = vgg.vgg_features(params["vgg_loss"], gray_content,
                                        "relu4_1", prec)
        c_loss = content_loss(f_styled, f_content_gt)
        if lcfg.relax_style:
            s_loss, ori_loss, robust_style = relaxed_style_loss(
                params["vgg_loss"], style, f_styled, lcfg, mcfg)
            aux["relaxed_style"] = robust_style
        else:
            f_style_gt = vgg.vgg_features(params["vgg_loss"], style,
                                          "relu4_1", prec)
            s_loss = style_loss(f_styled, f_style_gt, mcfg.mean_std_eps)
            ori_loss = jnp.asarray(0.0)
        total = total + c_loss * lcfg.content_weight + s_loss * lcfg.style_weight
        if lcfg.old_style_loss:
            total = total + ori_loss * lcfg.old_weight
        metrics.update(content=c_loss, new_style=s_loss, old_style=ori_loss)
    else:
        metrics.update(content=0.0, new_style=0.0, old_style=0.0)

    if lcfg.recon_loss:
        recon_content = decode_(params["decoder"], f_content,
                                encode_style(params, content, mcfg))
        gray_style_feat = vgg.encode(params["encoder"],
                                     rgb_to_luma_reversed(style), prec)
        recon_style = decode_(params["decoder"], gray_style_feat, sf)
        r_loss = (jnp.mean(jnp.abs(recon_content - content))
                  + jnp.mean(jnp.abs(recon_style - style)))
        total = total + r_loss * lcfg.recon_weight
        metrics["recon"] = r_loss
        aux["recon_content"] = recon_content
        aux["recon_style"] = recon_style
    else:
        metrics["recon"] = 0.0

    if lcfg.temporal_loss and extra is not None and "BackwardFlow" in extra:
        # Figure-16 ablation: real MPI Sintel pairs + GT backward flow
        # (datasets D2, loss M18 — ``train/loss_networks.py:117-130``).
        from rerevst_tpu.losses.temporal import temporal_loss_mpi

        nxt = extra["NextContent"]
        flow = extra["BackwardFlow"]
        mask = extra["BackwardMask"]
        if mask.ndim == 3:
            mask = mask[..., None]
        styled_next = decode_(params["decoder"],
                              vgg.encode(params["encoder"], nxt, prec), sf)
        t_loss, fake_pre = temporal_loss_mpi(styled_next, styled, flow, mask)
        t_gt, _ = temporal_loss_mpi(nxt, content, flow, mask)
        total = total + t_loss * lcfg.temporal_weight
        metrics["temporal"] = t_loss
        metrics["temporal_gt"] = lax.stop_gradient(t_gt)
        aux["styled_second"] = styled_next
        aux["fake_styled_second"] = fake_pre
    elif lcfg.temporal_loss and extra is not None and "ForwardFlow" in extra:
        # Figure-16 ablation: real-video pairs + forward flow (D3 + M18,
        # ``train/loss_networks.py:132-145``).
        from rerevst_tpu.losses.temporal import temporal_loss_video

        nxt = extra["NextContent"]
        flow = extra["ForwardFlow"]
        mask = extra["ForwardMask"]
        if mask.ndim == 3:
            mask = mask[..., None]
        styled_next = decode_(params["decoder"],
                              vgg.encode(params["encoder"], nxt, prec), sf)
        t_loss, fake_cur = temporal_loss_video(styled_next, styled, flow, mask)
        t_gt, _ = temporal_loss_video(nxt, content, flow, mask)
        total = total + t_loss * lcfg.temporal_weight
        metrics["temporal"] = t_loss
        metrics["temporal_gt"] = lax.stop_gradient(t_gt)
        aux["styled_second"] = styled_next
        aux["fake_styled_second"] = fake_cur
    elif lcfg.temporal_loss:
        if extra is not None and "Second" in extra:
            # Injected fake pair (determinism / cross-framework tests).
            second, flow = extra["Second"], extra["FakeFlow"]
        else:
            second, flow = generate_fake_data(key, content, lcfg)
        second = lax.stop_gradient(second)
        f_second = vgg.encode(params["encoder"], second, prec)
        styled_second = decode_(params["decoder"], f_second, sf)
        t_loss, warped = temporal_loss(styled, styled_second, flow,
                                       use_warp=lcfg.data_w)
        t_gt, _ = temporal_loss(content, second, flow, use_warp=lcfg.data_w)
        total = total + t_loss * lcfg.temporal_weight
        metrics["temporal"] = t_loss
        metrics["temporal_gt"] = lax.stop_gradient(t_gt)
        aux["second"] = second
        aux["styled_second"] = styled_second
        aux["fake_styled_second"] = warped
    else:
        metrics["temporal"] = 0.0
        metrics["temporal_gt"] = 0.0

    if lcfg.tv_loss:
        t = tv_loss(styled)
        total = total + t * lcfg.tv_weight
        metrics["tv"] = t
    else:
        metrics["tv"] = 0.0

    metrics["total"] = total
    return total, (metrics, aux)


def _accum_loss_grads(params, cfg: TrainConfig, accum: int, content, style,
                      key, extra=None):
    """Gradient accumulation: mean loss grads over `accum` micro-batches via
    ``lax.scan`` — one optimizer update's worth of gradient at ~1/accum the
    activation memory.  Accumulates in fp32 (a low-precision running sum
    would quantize every partial), casts back to the param dtype at the end.
    Each micro-batch folds its own PRNG key (independent fake motion, like
    separate loader steps)."""
    b = content.shape[0]
    if b % accum:
        raise ValueError(
            f"grad_accum {accum} must divide the batch; got batch {b}")
    m = b // accum

    def resh(a):
        return a.reshape((accum, m) + a.shape[1:])

    cs, ss = resh(content), resh(style)
    ex = None if extra is None else jax.tree.map(resh, extra)
    keys = jax.random.split(key, accum)

    def body(g_acc, xs):
        if ex is None:
            c, s, k = xs
            e = None
        else:
            c, s, k, e = xs

        def loss_fn(p):
            total, (metrics, _) = compute_losses(p, c, s, k, cfg, e)
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        g_acc = jax.tree.map(
            lambda a, g: a + g.astype(jnp.float32), g_acc, grads)
        return g_acc, metrics

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    xs = (cs, ss, keys) if ex is None else (cs, ss, keys, ex)
    g_sum, metrics_stack = lax.scan(body, zeros, xs)
    grads = jax.tree.map(
        lambda g, p: (g / accum).astype(p.dtype), g_sum, params)
    metrics = jax.tree.map(lambda v: jnp.mean(v, axis=0), metrics_stack)
    return grads, metrics


def make_train_step(cfg: TrainConfig, params_template: Dict):
    """Jitted (state, content, style, key) -> (state, metrics)."""
    opt = make_optimizer(cfg, params_template)
    accum = max(int(getattr(cfg, "grad_accum", 1)), 1)

    @jax.jit
    def train_step(state: TrainState, content, style, key, extra=None):
        if accum > 1:
            grads, metrics = _accum_loss_grads(state.params, cfg, accum,
                                               content, style, key, extra)
        else:
            def loss_fn(params):
                return compute_losses(params, content, style, key, cfg,
                                      extra)

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (metrics, _)), grads = grad_fn(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_adversarial_train_step(cfg: TrainConfig, params_template: Dict,
                                d_params_template: Dict):
    """D-then-G alternating update (``train/train.py:320-415``), one program.

    D: 0.5 * (gan(D(stop_grad(styled)), fake) + gan(D(style), real)),
    Adam(1e-4, betas=(0.5, 0.9)) (``train/train.py:287``).
    G: the standard losses + gan_weight * gan(D(styled), real) with D's
    params stopped.  The GAN objective is ``cfg.loss.gan_mode``
    (lsgan/vanilla/wgangp, ``train/other_networks.py:81-101``).

    The generator runs ONCE per step, like the reference (which computes the
    styled frame once and ``.detach()``es it for D, ``train/train.py:324-369``):
    we take a vjp through ``compute_losses``, reuse its primal `styled` for
    the D update, and close the G backward by injecting the gan-loss
    cotangent at `styled` — dL_G/dp = dL_base/dp + gan_weight * dL_gan/dp,
    the same total gradient torch's retained graph produces.
    Returns (g_state, d_state, metrics) step fn over (g_state, d_state).
    """
    import optax as _optax

    from rerevst_tpu.losses.gan import gan_loss
    from rerevst_tpu.models.discriminator import discriminator

    g_opt = make_optimizer(cfg, params_template)
    d_opt = _optax.adam(1e-4, b1=0.5, b2=0.9)
    mode = cfg.loss.gan_mode
    if mode not in ("lsgan", "vanilla", "wgangp"):
        raise ValueError(f"unknown gan_mode {mode!r}")
    if getattr(cfg, "grad_accum", 1) > 1:
        # The single-forward vjp structure shares `styled` between the D and
        # G updates; micro-batching it is unimplemented — fail loudly rather
        # than silently ignoring the flag.
        raise ValueError("grad_accum > 1 is not supported with "
                         "adversarial_loss; drop one of the two")

    @jax.jit
    def train_step(g_state: TrainState, d_state: TrainState, content, style,
                   key):
        # --- one generator forward, vjp captured ------------------------
        def base_fn(params):
            total, (metrics, aux) = compute_losses(params, content, style,
                                                   key, cfg)
            return total, metrics, aux["styled"]

        (total, metrics, styled), base_vjp = jax.vjp(base_fn, g_state.params)

        # --- D update on the detached generator output ------------------
        styled_ng = lax.stop_gradient(styled)

        def d_loss_fn(d_params):
            pred_fake = discriminator(d_params, styled_ng)
            pred_real = discriminator(d_params, style)
            return 0.5 * (gan_loss(pred_fake, False, mode)
                          + gan_loss(pred_real, True, mode))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_updates, d_opt_state = d_opt.update(d_grads, d_state.opt_state,
                                              d_state.params)
        d_params = optax.apply_updates(d_state.params, d_updates)

        # --- G update with the (frozen) updated D -----------------------
        d_frozen = lax.stop_gradient(d_params)

        def g_gan_fn(s):
            return gan_loss(discriminator(d_frozen, s), True, mode)

        g_gan, styled_cot = jax.value_and_grad(g_gan_fn)(styled)
        zero_metrics = jax.tree.map(
            lambda v: jnp.zeros_like(jnp.asarray(v)), metrics)
        (g_grads,) = base_vjp((
            jnp.ones_like(total), zero_metrics,
            (styled_cot * cfg.loss.gan_weight).astype(styled.dtype)))
        g_updates, g_opt_state = g_opt.update(g_grads, g_state.opt_state,
                                              g_state.params)
        g_params = optax.apply_updates(g_state.params, g_updates)
        metrics["loss_G_GAN"] = g_gan
        metrics["loss_d"] = d_loss

        return (TrainState(g_params, g_opt_state, g_state.step + 1),
                TrainState(d_params, d_opt_state, d_state.step + 1), metrics)

    return train_step, d_opt


def make_sharded_train_step(cfg: TrainConfig, params_template: Dict,
                            mesh: Mesh, axis: str = "data"):
    """Data-parallel train step: batch sharded over `mesh`, params replicated,
    grads psum-averaged over ICI — the distributed layer the reference never
    had (SURVEY §5, communication backend row)."""
    opt = make_optimizer(cfg, params_template)

    accum = max(int(getattr(cfg, "grad_accum", 1)), 1)

    def local_step(state: TrainState, content, style, key):
        # Per-device PRNG stream: fold in the device index so fake motion
        # differs across shards (like independent dataloader workers).
        idx = lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)

        if accum > 1:
            # Micro-batch the PER-DEVICE shard, then pmean as usual —
            # accumulation and data-parallelism compose.
            grads, metrics = _accum_loss_grads(state.params, cfg, accum,
                                               content, style, key)
        else:
            def loss_fn(params):
                total, (metrics, _) = compute_losses(params, content, style,
                                                     key, cfg)
                return total, metrics

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        grads = lax.pmean(grads, axis)
        metrics = lax.pmean(metrics, axis)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    fn = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    n_shards = int(mesh.devices.size)
    from rerevst_tpu.parallel.mesh import (
        lift_local,
        local_device_count_in,
        mesh_process_count,
    )

    multihost = mesh_process_count(mesh) > 1
    n_local = local_device_count_in(mesh) if multihost else n_shards

    def step(state: TrainState, content, style, key):
        # Non-divisible batches are an error by contract: silently padding a
        # *training* batch would bias gradients (pmean weights every shard
        # equally), unlike inference where pad_to_multiple masks stats.
        # Multi-host: `content`/`style` are this process's LOCAL batches
        # (the loader feeds each host its own shard); they lift to one
        # global batch-sharded array, grads pmean over ICI+DCN.
        if content.shape[0] % n_local or style.shape[0] % n_local:
            scope = (f"this process's {n_local} mesh devices" if multihost
                     else f"the mesh ({n_shards} devices)")
            raise ValueError(
                f"sharded train step needs batch divisible by {scope}; got "
                f"content batch {content.shape[0]}, style batch "
                f"{style.shape[0]}. Pick batch_size = k * {n_local}.")
        if multihost:
            content = lift_local(mesh, content, what="content batch")
            style = lift_local(mesh, style, what="style batch")
        return fn(state, content, style, key)

    return step
