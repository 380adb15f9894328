"""Video stylization CLI — the reference driver as a real command.

``python -m rerevst_tpu.stylize --style S.jpg --frames 'clip/*.png'
--checkpoint model.pth -o out/`` replaces the edit-the-source constants of
``test/generate_real_video.py:20-43``; same pipeline (two-pass global
feature sharing, every-8th-frame sampling, MJPG .avi @ 24fps) with batched
on-device Pass 2.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from rerevst_tpu.api import Stylization
from rerevst_tpu.config import InferenceConfig, ModelConfig
from rerevst_tpu.data import video as vio


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("rerevst_tpu.stylize")
    p.add_argument("--style", required=True, help="style image path")
    p.add_argument("--frames", required=True,
                   help="glob of content frames (e.g. 'clip/*.png') or a "
                        "video file (.avi/.mp4/.mov/...)")
    p.add_argument("--checkpoint", required=True,
                   help=".pth (reference) or .msgpack (native) weights")
    p.add_argument("-o", "--out", default="./result_frames")
    p.add_argument("--video-out", default="./result_videos")
    p.add_argument("--no-global", action="store_true",
                   help="per-frame mode (no sequence-level feature sharing)")
    p.add_argument("--no-video", action="store_true")
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--interval", type=int, default=8,
                   help="global-pass sampling interval")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--dtype", default="f32",
                   choices=["f32", "bf16", "f16"])
    p.add_argument("--mix", default="none",
                   choices=["none", "out", "res2", "dec", "enc", "full", "body"],
                   help="with --dtype bf16: fp32-storage region "
                        "(ModelConfig.fp32_mix).  For a fast parity-passing "
                        "run use --dtype f16 (0.54e-3/pixel) — 'enc'/'dec' "
                        "alone FAIL the 1e-3 parity bar; see PERF.md")
    p.add_argument("--ewarp", action="store_true",
                   help="also report the E_warp temporal-consistency metric "
                        "of the styled output (Farneback flow)")
    p.add_argument("--devices", type=int, default=0,
                   help="shard Pass 1/2 over this many devices (0 = single)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run into DIR")
    return p


def main(argv=None):
    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    use_global = not args.no_global

    cfg = ModelConfig(
        dtype={"bf16": jnp.bfloat16, "f16": jnp.float16,
               "f32": jnp.float32}[args.dtype],
        fp32_mix=args.mix)
    infer = InferenceConfig(sample_interval=args.interval,
                            use_global=use_global, batch_size=args.batch,
                            fps=args.fps)
    mesh = None
    if args.devices:
        from rerevst_tpu.parallel import frame_mesh

        mesh = frame_mesh(args.devices)
    framework = Stylization(args.checkpoint, cfg=cfg, use_global=use_global,
                            infer=infer, mesh=mesh)
    framework.prepare_style(vio.read_frame(args.style))

    if vio.is_video_file(args.frames):
        frames = vio.read_video(args.frames)
        frame_paths = [f"frame_{i + 1:04d}.png" for i in range(len(frames))]
        clip_name = os.path.splitext(os.path.basename(args.frames))[0]
    else:
        frame_paths = vio.list_frames(args.frames)
        if not frame_paths:
            raise SystemExit(f"no frames match {args.frames!r}")
        frames = [vio.read_frame(p) for p in frame_paths]
        clip_name = os.path.basename(os.path.dirname(frame_paths[0]))

    style_name = os.path.splitext(os.path.basename(args.style))[0]
    name = f"ReReVST-{style_name}-{clip_name}" + (
        "" if use_global else "-no-global")
    out_dir = os.path.join(args.out, name)
    os.makedirs(out_dir, exist_ok=True)

    import contextlib

    from rerevst_tpu.profiling import PhaseTimer, trace

    timer = PhaseTimer()
    t0 = time.time()
    results = []
    with (trace(args.trace) if args.trace else contextlib.nullcontext()):
        with timer.phase("stylize+write"):
            for i, styled in enumerate(
                    framework.stylize_video(frames, args.batch)):
                vio.write_frame(
                    os.path.join(out_dir, os.path.basename(frame_paths[i])),
                    styled)
                results.append(styled)
    dt = time.time() - t0
    report = {"frames": len(results), "seconds": round(dt, 2),
              "fps": round(len(results) / dt, 2), "out": out_dir}
    if args.ewarp and len(results) >= 2:
        from rerevst_tpu.eval.ewarp import ewarp

        report.update({k: round(v, 4) for k, v in
                       ewarp(results, frames).items()})
    print(json.dumps(report))

    if not args.no_video:
        vio.write_video(os.path.join(args.video_out, f"{name}.avi"),
                        results, fps=args.fps)


if __name__ == "__main__":
    main()
