"""Checkpoint conversion CLI: reference PyTorch .pth <-> native msgpack.

    python -m rerevst_tpu.convert style_net-TIP-final.pth model.msgpack
    python -m rerevst_tpu.convert model.msgpack reference.pth

Covers the released-checkpoint schema (``test/framework.py:74-78``) in both
directions, including legacy variants with extra keys (ignored on import,
mirroring the reference's 3-stage fallback loader, ``train/train.py:124-146``).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser("rerevst_tpu.convert")
    ap.add_argument("src", help=".pth or .msgpack checkpoint")
    ap.add_argument("dst", help="output path (.msgpack or .pth)")
    ap.add_argument("--no-loss-net", action="store_true",
                    help="drop the frozen Vgg19 loss net (inference-only)")
    args = ap.parse_args(argv)

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
