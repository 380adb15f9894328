"""Checkpoint conversion CLI: reference PyTorch .pth <-> native msgpack.

    python -m rerevst_tpu.convert style_net-TIP-final.pth model.msgpack
    python -m rerevst_tpu.convert model.msgpack reference.pth

Covers the released-checkpoint schema (``test/framework.py:74-78``) in both
directions, including legacy variants with extra keys (ignored on import,
mirroring the reference's 3-stage fallback loader, ``train/train.py:124-146``).

Full TRAIN-state interop (G + D + Adam moments, the reference's per-log
checkpoint trio ``train/train.py:446-457``):

    # native ckpt-stepN.msgpack (+ netD-stepN.msgpack) -> style_net-epoch-N
    # .pth + optimizer-epoch-N.pth + netD-epoch-N.pth (torch resumes drop-in)
    python -m rerevst_tpu.convert --train-export out/ckpt-step00000042.msgpack torch_out/

    # reference trio -> native ckpt-stepN.msgpack + netD-stepN.msgpack
    python -m rerevst_tpu.convert --train-import style_net-epoch-1.pth native_out/ \
        --optimizer optimizer-epoch-1.pth --netd netD-epoch-1.pth
"""

from __future__ import annotations

import argparse


def _train_export(args):
    import glob
    import os
    import re

    import jax

    from rerevst_tpu.config import TrainConfig
    from rerevst_tpu.io.checkpoint import load_params, restore_train_state
    from rerevst_tpu.io.torch_compat import export_train_checkpoint
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.train.state import init_train_state

    # Restoring through a typed template rebuilds the optax NamedTuple
    # structure (raw msgpack restore loses it).  Assumes the paper-recipe
    # (default) architecture, like the reference trio it mirrors.
    cfg = TrainConfig(lr=args.lr)
    template = init_transformer_params(jax.random.PRNGKey(cfg.seed),
                                       cfg.model, with_loss_net=True)
    state0 = init_train_state(template, cfg)
    params, opt_state = restore_train_state(args.src, template,
                                            state0.opt_state)
    m = re.search(r"step(\d+)", os.path.basename(args.src))
    epoch = args.epoch if args.epoch is not None else (
        int(m.group(1)) if m else 0)
    d_params = None
    netd = args.netd
    if netd is None:
        # Auto-discovery must pair D with THIS generator checkpoint's step:
        # the pruner keeps several netD-step* files, and exporting the
        # newest D with an older G would hand torch a mismatched GAN pair.
        src_dir = os.path.dirname(args.src) or "."
        if m is not None:
            exact = os.path.join(src_dir,
                                 f"netD-step{int(m.group(1)):08d}.msgpack")
            netd = exact if os.path.exists(exact) else None
        if netd is None:
            cands = sorted(glob.glob(os.path.join(src_dir,
                                                  "netD-step*.msgpack")))
            netd = cands[-1] if cands else None
            if netd is not None and m is not None:
                print(f"warning: no netD checkpoint at step "
                      f"{int(m.group(1))}; exporting newest ({netd}) — "
                      "G/D steps will not match", flush=True)
    if netd is not None:
        d_blob = load_params(netd)
        d_params = d_blob.get("params", d_blob)
    out = export_train_checkpoint(args.dst, epoch, params,
                                  opt_state=opt_state,
                                  d_params=d_params, lr=args.lr)
    print(f"exported train state -> {sorted(out.values())}")


def _train_import(args):
    import jax

    from rerevst_tpu.config import TrainConfig
    from rerevst_tpu.io.checkpoint import save_params, save_train_state
    from rerevst_tpu.io.torch_compat import import_train_checkpoint
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.train.state import init_train_state

    cfg = TrainConfig(lr=args.lr)
    template = init_transformer_params(jax.random.PRNGKey(cfg.seed),
                                       cfg.model, with_loss_net=True)
    state0 = init_train_state(template, cfg)
    params, opt_state, step, d_params = import_train_checkpoint(
        args.src, template, state0.opt_state,
        optimizer_pth=args.optimizer, netd_pth=args.netd)
    path = save_train_state(args.dst, step, params, opt_state)
    wrote = [path]
    if d_params is not None:
        import os

        import numpy as np
        import optax

        # Fresh D Adam state: the reference never persists D's optimizer
        # (train/train.py:281-287), so there is nothing to import.
        d_opt_state = jax.tree.map(
            np.asarray, optax.adam(1e-4, b1=0.5, b2=0.9).init(
                jax.tree.map(np.asarray, d_params)))
        dpath = os.path.join(args.dst, f"netD-step{step:08d}.msgpack")
        save_params(dpath, {"params": d_params, "opt_state": d_opt_state,
                            "step": np.asarray(step)})
        wrote.append(dpath)
    print(f"imported train state @ step {step} -> {wrote}")


def _export_aot(args):
    import os


    from rerevst_tpu.api import Stylization
    from rerevst_tpu.config import ModelConfig, dtype_from_name
    from rerevst_tpu.io.aot import save_bundle

    h, w = (int(v) for v in args.hw.lower().split("x"))
    batches = [int(b) for b in args.batches.split(",")]
    cfg = ModelConfig(dtype=dtype_from_name(args.dtype))
    session = Stylization(checkpoint=args.src, cfg=cfg, use_global=True)
    meta = save_bundle(args.dst, session, (h, w), batches=batches,
                       platforms=args.platforms.split(","))
    size_mb = os.path.getsize(args.dst) / (1 << 20)
    print(f"AOT bundle {args.dst}: {meta['hw'][0]}x{meta['hw'][1]} batches "
          f"{meta['batches']} platforms {meta['platforms']} "
          f"({size_mb:.1f} MB)")


def main(argv=None):
    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser("rerevst_tpu.convert")
    ap.add_argument("src", help=".pth or .msgpack checkpoint")
    ap.add_argument("dst", help="output path (.msgpack or .pth), or a "
                               "directory for --train-export/--train-import")
    ap.add_argument("--no-loss-net", action="store_true",
                    help="drop the frozen Vgg19 loss net (inference-only)")
    ap.add_argument("--train-export", action="store_true",
                    help="src = native ckpt-stepN.msgpack: write the "
                         "reference training trio (style_net/optimizer/netD "
                         "-epoch-N.pth) into dst/")
    ap.add_argument("--train-import", action="store_true",
                    help="src = reference style_net-epoch-N.pth: write a "
                         "native train-state checkpoint into dst/")
    ap.add_argument("--optimizer", default=None,
                    help="with --train-import: optimizer-epoch-N.pth")
    ap.add_argument("--netd", default=None,
                    help="discriminator checkpoint (either direction)")
    ap.add_argument("--epoch", type=int, default=None,
                    help="with --train-export: epoch tag for the filenames "
                         "(default: the native checkpoint's step)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--export-aot", action="store_true",
                    help="src = checkpoint, dst = .rvaot bundle: export the "
                         "compiled Pass-2 hot path (StableHLO via "
                         "jax.export) as a deployment artifact")
    ap.add_argument("--hw", default="640x640",
                    help="with --export-aot: PADDED frame geometry HxW "
                         "(512p content pads to 640x640)")
    ap.add_argument("--batches", default="1",
                    help="with --export-aot: comma-separated batch sizes "
                         "to export (e.g. 1,2,4,8)")
    ap.add_argument("--dtype", default="f16",
                    choices=["bf16", "f16", "f32"],
                    help="with --export-aot: model storage dtype")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="with --export-aot: lowering platforms")
    args = ap.parse_args(argv)

    if args.train_export:
        return _train_export(args)
    if args.train_import:
        return _train_import(args)
    if args.export_aot:
        return _export_aot(args)

    from rerevst_tpu.io.checkpoint import load_params, save_params
    from rerevst_tpu.io.torch_compat import (
        load_reference_checkpoint,
        to_reference_state_dict,
    )

    if args.src.endswith(".pth"):
        params = load_reference_checkpoint(args.src)
    else:
        params = load_params(args.src)
    if args.no_loss_net:
        params = {k: v for k, v in params.items() if k != "vgg_loss"}

    if args.dst.endswith(".pth"):
        import torch

        sd = {k: torch.from_numpy(v.copy() if hasattr(v, "copy") else v)
              for k, v in to_reference_state_dict(params).items()}
        torch.save(sd, args.dst)
    else:
        save_params(args.dst, params)
    print(f"converted {args.src} -> {args.dst} "
          f"({', '.join(sorted(params))})")


if __name__ == "__main__":
    main()
