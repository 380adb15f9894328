"""Multi-style interpolation CLI (``Multi-style Interpolation/test.py`` driver).

``python -m rerevst_tpu.interpolate --styles A.jpg B.jpg --frames 'clip/*.png'
--checkpoint model.pth -o out/`` encodes every frame once, freezes per-style
sequence statistics (interval 16 sampling, ``Multi-style .../test.py:72``),
then replays decode-only per frame with the blend weight sweeping linearly
from the first style to the second (``:127-131``).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("rerevst_tpu.interpolate")
    p.add_argument("--styles", nargs="+", required=True,
                   help="2+ style image paths")
    p.add_argument("--frames", required=True,
                   help="glob of content frames or a video file")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-o", "--out", default="./result_interp")
    p.add_argument("--interval", type=int, default=16)
    p.add_argument("--weights", default=None,
                   help="per-frame weight schedule: inline JSON or a path to "
                        "a JSON file holding an [n_frames][n_styles] array "
                        "(arbitrary per-frame weights, the reference's "
                        "transfer(frame, weight) contract).  Default: linear "
                        "sweep through all styles.")
    p.add_argument("--style-size", type=int, default=384,
                   help="styles resized to this square (reference: 384)")
    p.add_argument("--dtype", default="f32",
                   choices=["f32", "bf16", "f16"])
    p.add_argument("--mix", default="none",
                   choices=["none", "out", "res2", "dec", "enc", "full", "body"],
                   help="with --dtype bf16: fp32-storage region "
                        "(ModelConfig.fp32_mix)")
    p.add_argument("--pairlane", action="store_true",
                   help="pair-lane Pallas boundary-conv kernels (documented "
                        "NEGATIVE result: beats the isolated conv, loses "
                        "composed — see PERF.md; bf16/f16 only)")
    p.add_argument("--devices", type=int, default=0,
                   help="shard per-style Pass-1 collection over this many "
                        "devices (0 = single; Pass 2 is per-frame by the "
                        "reference's per-frame-weights contract)")
    return p


def main(argv=None):
    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    import cv2

    from rerevst_tpu.config import (InferenceConfig, ModelConfig,
                                    dtype_from_name)
    from rerevst_tpu.data import video as vio
    from rerevst_tpu.multistyle import MultiStylization

    args = build_parser().parse_args(argv)
    cfg = ModelConfig(
        dtype=dtype_from_name(args.dtype),
        fp32_mix=args.mix,
        pairlane=args.pairlane)
    infer = InferenceConfig(sample_interval=args.interval)

    mesh = None
    if args.devices:
        from rerevst_tpu.parallel import frame_mesh

        mesh = frame_mesh(args.devices)
    ms = MultiStylization(checkpoint=args.checkpoint, cfg=cfg, infer=infer,
                          mesh=mesh)
    styles = [cv2.resize(vio.read_frame(s),
                         (args.style_size, args.style_size))
              for s in args.styles]
    ms.prepare_styles(styles)

    # Lazy frame source: the pipeline reads one frame at a time, and long
    # clips auto-spill their feature cache to a temp memmap.
    from rerevst_tpu.data.source import PathsSource, as_source

    source = as_source(args.frames)
    if isinstance(source, PathsSource):
        out_names = [os.path.basename(p) for p in source.paths]
    else:
        out_names = [f"frame_{i + 1:04d}.png" for i in range(len(source))]

    weights = None
    if args.weights is not None:
        raw = args.weights
        if not raw.lstrip().startswith("["):
            with open(raw) as f:
                raw = f.read()
        weights = json.loads(raw)

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    n = 0
    for i, styled in enumerate(ms.interpolate_video(source, weights=weights)):
        vio.write_frame(os.path.join(args.out, out_names[i]), styled)
        n += 1
    dt = time.time() - t0
    print(json.dumps({"frames": n, "seconds": round(dt, 2),
                      "out": args.out}))


if __name__ == "__main__":
    main()
