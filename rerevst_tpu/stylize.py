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
from rerevst_tpu.config import (InferenceConfig, ModelConfig,
                                dtype_from_name)
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
    p.add_argument("--pad", type=int, default=64,
                   help="reflect-pad margin (reference ReshapeTool: 64). "
                        "The network only needs x8 geometry, so e.g. "
                        "--pad 32 --granularity 8 is a reduced-pad fast "
                        "mode (fewer padded pixels per frame; border "
                        "quality cost measurable with --ewarp)")
    p.add_argument("--granularity", type=int, default=64,
                   help="padded-size multiple (reference: 64; must be a "
                        "positive multiple of 8)")
    p.add_argument("--dtype", default="f32",
                   choices=["f32", "bf16", "f16"])
    p.add_argument("--mix", default="none",
                   choices=["none", "out", "res2", "dec", "enc", "full", "body"],
                   help="with --dtype bf16: fp32-storage region "
                        "(ModelConfig.fp32_mix).  For a fast parity-passing "
                        "run use --dtype f16 (0.54e-3/pixel) — 'enc'/'dec' "
                        "alone FAIL the 1e-3 parity bar; see PERF.md")
    p.add_argument("--tiles", type=int, default=1,
                   help="spatial H-tiles for the full-resolution hot "
                        "regions (ModelConfig.spatial_tiles; exact "
                        "overlap-and-discard).  >1 bounds their HBM "
                        "working set at 1/N — lifts the true-1080p "
                        "batch>=12 OOM (PERF.md round 5); pixels are "
                        "IDENTICAL (tests/test_tiling.py)")
    p.add_argument("--pairlane", action="store_true",
                   help="pair-lane Pallas boundary-conv kernels (documented "
                        "NEGATIVE result: beats the isolated conv, loses "
                        "composed — see PERF.md; bf16/f16 only)")
    p.add_argument("--ewarp", action="store_true",
                   help="also report the temporal-consistency metrics of "
                        "the styled output: E_warp (L1) and temporal SSIM "
                        "(Farneback flow + occlusion masking)")
    p.add_argument("--devices", type=int, default=0,
                   help="shard Pass 1/2 over this many devices (0 = single)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run into DIR")
    return p


def main(argv=None):
    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()

    args = build_parser().parse_args(argv)
    if args.pad < 0 or args.granularity < 8 or args.granularity % 8:
        build_parser().error("--pad must be >= 0 and --granularity a "
                             "positive multiple of 8")
    use_global = not args.no_global

    cfg = ModelConfig(
        dtype=dtype_from_name(args.dtype),
        fp32_mix=args.mix,
        pairlane=args.pairlane,
        spatial_tiles=args.tiles)
    infer = InferenceConfig(sample_interval=args.interval,
                            use_global=use_global, batch_size=args.batch,
                            fps=args.fps, pad=args.pad,
                            granularity=args.granularity)
    mesh = None
    if args.devices:
        from rerevst_tpu.parallel import frame_mesh

        mesh = frame_mesh(args.devices)
    framework = Stylization(args.checkpoint, cfg=cfg, use_global=use_global,
                            infer=infer, mesh=mesh)
    framework.prepare_style(vio.read_frame(args.style))

    # Constant-memory input: the pipeline pulls frames from the source
    # lazily (reference behavior: one cv2.imread per frame,
    # test/generate_real_video.py:152-171), never the whole clip.
    from rerevst_tpu.data.source import PathsSource, as_source

    source = as_source(args.frames)
    if isinstance(source, PathsSource):
        out_names = [os.path.basename(p) for p in source.paths]
        clip_name = os.path.basename(os.path.dirname(source.paths[0]))
    else:
        out_names = [f"frame_{i + 1:04d}.png" for i in range(len(source))]
        clip_name = os.path.splitext(os.path.basename(args.frames))[0]

    style_name = os.path.splitext(os.path.basename(args.style))[0]
    name = f"ReReVST-{style_name}-{clip_name}" + (
        "" if use_global else "-no-global")
    out_dir = os.path.join(args.out, name)
    os.makedirs(out_dir, exist_ok=True)

    import contextlib

    from rerevst_tpu.profiling import PhaseTimer, trace

    ewarp_acc = None
    tssim_acc = None
    originals = None
    if args.ewarp:
        from rerevst_tpu.eval.ewarp import EwarpAccumulator
        from rerevst_tpu.eval.ssim import TemporalSSIMAccumulator

        ewarp_acc = EwarpAccumulator()
        tssim_acc = TemporalSSIMAccumulator()
        originals = iter(source)  # second lazy pass, one frame at a time

    video_writer = (None if args.no_video else vio.VideoWriter(
        os.path.join(args.video_out, f"{name}.avi"), fps=args.fps))
    timer = PhaseTimer()
    t0 = time.time()
    n_out = 0
    try:
        with (trace(args.trace) if args.trace else contextlib.nullcontext()):
            with timer.phase("stylize+write"):
                for i, styled in enumerate(
                        framework.stylize_video(source, args.batch)):
                    vio.write_frame(os.path.join(out_dir, out_names[i]),
                                    styled)
                    if video_writer is not None:
                        video_writer.write(styled)
                    if ewarp_acc is not None:
                        orig = next(originals)
                        ewarp_acc.push(orig, styled)
                        tssim_acc.push(orig, styled)
                    n_out += 1
    finally:
        if video_writer is not None:
            video_writer.close()
    dt = time.time() - t0
    report = {"frames": n_out, "seconds": round(dt, 2),
              "fps": round(n_out / dt, 2), "out": out_dir,
              "pass1": framework.pass1_mode}
    if ewarp_acc is not None and ewarp_acc.pairs >= 1:
        report.update({k: round(v, 4) if isinstance(v, float) else v
                       for k, v in ewarp_acc.result().items()})
        report.update({k: round(v, 4)
                       for k, v in tssim_acc.result().items()})
    print(json.dumps(report))


if __name__ == "__main__":
    main()
