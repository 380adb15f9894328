"""Benchmark: 512p video stylization throughput on one TPU chip.

Measures the hot loop of the flagship path — Pass 2 of sequence-global
inference (VGG encode + frozen-stats decode) on 512x512 content padded to
640x640 per the reference geometry (``test/generate_real_video.py:66-83``) —
and prints ONE JSON line:

    {"metric": "frames_per_sec_512p", "value": N, "unit": "frames/sec/chip",
     "vs_baseline": N/200, ...}

Baseline: the driver target of 200 frames/sec/chip (BASELINE.json; the
reference repo publishes no numbers).  The default config (f16 storage,
batch 32) is the headline operating point: parity-passing (0.54e-3/pixel
vs fp32-HIGHEST, see PERF.md) at full throughput.  Flags: --dtype
{bf16,f16,f32}, --tail/--precision (mixed-precision study), --packed,
--batch N, --frames N, --quick, --mode {infer,train,multistyle,1080p,parity}.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _acquire_devices_or_die(timeout_s: float = 300.0):
    """Fail FAST and loud if the TPU is unreachable.

    The tunneled backend's first contact retries forever when the tunnel
    is down; a bench invocation would hang silently with no artifact.
    Probe device init on a watchdog thread and emit a diagnostic JSON line
    (same one-line contract) + nonzero exit instead."""
    import os
    import threading

    done = threading.Event()
    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — reported below
            out["error"] = repr(e)
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s) or "error" in out:
        print(json.dumps({
            "metric": "frames_per_sec_512p", "value": 0.0,
            "unit": "frames/sec/chip", "vs_baseline": 0.0,
            "error": out.get(
                "error",
                f"device init did not complete in {timeout_s:.0f}s "
                "(TPU tunnel down?)")}), flush=True)
        os._exit(2)  # flush above: _exit skips stdio buffers
    return out["devices"]


def main():
    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    import sys

    # Parity mode delegates wholesale to the parity CLI (its flag surface —
    # --frames/--crop/--fast_dtype/... — overlaps this parser's, so intercept
    # before parsing).  Both argparse spellings are accepted: "--mode parity"
    # and "--mode=parity"; a trailing bare "--mode" falls through to argparse
    # for a proper error.
    argv = sys.argv[1:]
    want_help = bool({"-h", "--help"} & set(argv))
    if "--mode=parity" in argv:
        from rerevst_tpu.eval.parity import main as parity_main

        i = argv.index("--mode=parity")
        if not want_help:  # --help must answer instantly, device or not
            _acquire_devices_or_die()
        parity_main(argv[:i] + argv[i + 1:])
        return
    if ("--mode" in argv and argv.index("--mode") + 1 < len(argv)
            and argv[argv.index("--mode") + 1] == "parity"):
        from rerevst_tpu.eval.parity import main as parity_main

        i = argv.index("--mode")
        if not want_help:
            _acquire_devices_or_die()
        parity_main(argv[:i] + argv[i + 2:])
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f16",
                    choices=["bf16", "f16", "f32"],
                    help="f16 (default) = the headline config: parity-"
                         "passing (0.54e-3/pixel vs fp32-HIGHEST) at full "
                         "throughput — see PERF.md precision study")
    ap.add_argument("--tail", default="none", choices=["none", "out", "res2", "dec", "enc", "full", "body"],
                    help="fp32 storage region (ModelConfig.fp32_mix) — the "
                         "mixed-precision parity configs")
    ap.add_argument("--precision", default="auto",
                    choices=["auto", "default", "high", "highest"],
                    help="conv/matmul precision override (ModelConfig."
                         "precision); 'default' with --dtype f32 = fp32 "
                         "storage with single-pass bf16 MXU matmuls")
    ap.add_argument("--packed", action="store_true",
                    help="parity-packed boundary convs "
                         "(ModelConfig.parity_packed)")
    ap.add_argument("--pairlane", action="store_true",
                    help="pair-lane Pallas boundary-conv kernels "
                         "(documented NEGATIVE result — beats the isolated "
                         "conv 7.8 vs 13.9 ms, loses composed; see PERF.md)")
    ap.add_argument("--donate", action="store_true",
                    help="donate the frame-batch buffer to the hot call "
                         "(input and output are same-shape B,H,W,3 so XLA "
                         "may alias them) — buffer-donation micro-experiment")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 16 (infer/multistyle/sintel/1080p), "
                         "1 (latency)")
    ap.add_argument("--sweep-weights", action="store_true",
                    help="multistyle mode: per-FRAME weight rows (batched "
                         "blended state, MultiStylization.transfer_batch "
                         "path) instead of one scalar blend per batch")
    ap.add_argument("--frames", type=int, default=192,
                    help="frames per timed repetition")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--size", default="512",
                    help="content size: N (square) or HxW — e.g. 1080x1920 "
                         "(16:9), 436x1024 (the reference's ambush_4 "
                         "fixture geometry)")
    ap.add_argument("--tiles", type=int, default=None,
                    help="spatial H-tiles for the full-resolution hot "
                         "regions (ModelConfig.spatial_tiles; exact "
                         "overlap-and-discard — ops/tiling.py).  Default: "
                         "2 for --mode 1080p (lifts the batch-12+ HBM OOM "
                         "and beats batch-8-untiled, PERF.md round 5), "
                         "1 elsewhere")
    ap.add_argument("--outpairs", default="auto",
                    choices=["auto", "on", "off"],
                    help="force the paired-output out-conv on/off (gate "
                         "A/B on new geometries; 'auto' = the measured "
                         "pixel-count gate)")
    ap.add_argument("--luma-fold", action="store_true",
                    help="enable the rank-1 desaturation fold into conv1_1 "
                         "(ModelConfig.luma_fold) — documented NEGATIVE "
                         "result, off by default: the MXU pads input "
                         "channels to the tile minimum so C_in 3->1 saves "
                         "nothing; measured 247.7 vs 252.2 fps @512p "
                         "(PERF.md round 4)")
    ap.add_argument("--pad", type=int, default=64,
                    help="reflect-pad margin (reference ReshapeTool: 64). "
                         "The network only needs x8 geometry (three pools "
                         "to /8), so e.g. --pad 32 --granularity 8 is a "
                         "reduced-pad fast mode; quality cost measured via "
                         "--mode quality (PERF.md round 4)")
    ap.add_argument("--granularity", type=int, default=64,
                    help="padded-size multiple (reference: 64; must be a "
                         "multiple of 8)")
    ap.add_argument("--inner-dtype", default="same",
                    choices=["same", "bf16"],
                    help="train mode: relaxed-loss inner-loop compute dtype "
                         "(LossConfig.relaxed_inner_dtype) — 'bf16' runs the "
                         "16 inner VGG fwd+bwd passes in bfloat16 with fp32 "
                         "flow/loss bookkeeping")
    ap.add_argument("--blur-scale", type=int, default=1,
                    help="train mode: smooth the relaxed flow at 1/N "
                         "resolution (LossConfig.relaxed_blur_scale; the "
                         "round-5 lever from scripts/profile_relaxed.py — "
                         "the two full-res 101-tap HIGHEST blurs dominate "
                         "one inner iteration).  1 = reference recipe")
    ap.add_argument("--remat", action="store_true",
                    help="train mode: rematerialize decoder activations in "
                         "the backward pass (TrainConfig.remat)")
    ap.add_argument("--mode", default="infer",
                    choices=["infer", "train", "multistyle", "1080p",
                             "sintel", "latency", "parity", "quality"],
                    help="infer: 512p hot loop (headline); train: full train "
                         "step; multistyle: 2-style blended decode; 1080p: "
                         "TRUE 1920x1080 inference (pads to 2048x1216); "
                         "sintel: the reference fixture geometry 436x1024 "
                         "(pads to 576x1152); latency: batch-1 512p single-"
                         "frame latency (the live-serving operating point); "
                         "parity: bf16-vs-fp32 pixel error on the real "
                         "ambush_4 fixture (handled above); quality: E_warp "
                         "+ temporal-SSIM on the fixture with the bundled "
                         "trained checkpoint")
    ap.add_argument("--styles", type=int, default=1,
                    help="quality mode: sweep this many styles (1 = the "
                         "plum_flower fixture pair only — the cross-round "
                         "artifact; >1 adds styles from the reference's "
                         "bundled 35-image style set, emitting per-style "
                         "E_warp/tSSIM rows + aggregate.  The global-vs-"
                         "per-frame margin is style-dependent, so one pair "
                         "proves little — VERDICT r4 #5)")
    ap.add_argument("--clip", choices=["ambush", "pan"], default="ambush",
                    help="quality mode content: ambush = the 33-frame MPI "
                         "Sintel ambush_4 fixture (the cross-round "
                         "artifact); pan = a 25-frame synthesized camera "
                         "pan+zoom over a bundled reference image (second "
                         "content clip, real Farneback-estimable motion — "
                         "the margin is content-dependent too)")
    args = ap.parse_args()
    if args.pad < 0 or args.granularity < 8 or args.granularity % 8:
        ap.error("--pad must be >= 0 and --granularity a positive multiple "
                 "of 8 (three /2 pools need x8 input geometry)")
    # Probe AFTER parsing: --help / flag typos must answer instantly, not
    # block on (or bogus-report against) the device.
    _acquire_devices_or_die()
    if args.mode == "quality":
        bench_quality(args)
        return
    if args.batch is None:
        # 16 became the best 512p operating point in round 3: the paired
        # out conv wins there (246 vs 242 fps at batch 32 — PERF.md).
        # True-1080p: batch 4 HALVED per-pixel throughput (17.6 fps,
        # 44 Mpix/s — the chip sat half idle); batch 8 restores the full
        # 90 Mpix/s rate (36.1 fps); batch 12 OOMs HBM (24.3G needed vs
        # 15.75G).  Sintel geometry fits batch 16 and gains 11% over
        # batch 8 (151.4 vs 136.1 fps; batch 12 collapses to 73.6 — the
        # f16 conv layout tiles the batch dim by 8, so non-multiples of 8
        # get a pathological padded layout).  Round-4 matrix in PERF.md.
        # Round 5: H-tiling (--tiles) lifted the true-1080p HBM ceiling —
        # batch 16 + 2 tiles measured 37.4 fps vs batch 8 untiled's 36.1
        # (PERF.md round-5 matrix; batch 24/tiles 4 is +1% more at 1.5x
        # the batch latency).
        args.batch = {"1080p": 16, "latency": 1}.get(args.mode, 16)
    if args.mode == "1080p":
        args.size = "1080x1920"
    elif args.mode == "sintel":
        args.size = "436x1024"
    if args.mode == "train":
        if args.dtype == "f16":
            args.dtype = "f32"  # f16 is inference storage, not a train dtype
        bench_train(args)
        return
    if args.quick:
        # 4 chained iters (not 2): per-call time comes from (t_n - t_1)/(n-1),
        # and a 1-iter difference is swamped by tunnel RPC jitter.
        args.frames, args.reps = 4 * args.batch, 2

    from rerevst_tpu.config import ModelConfig, dtype_from_name
    from rerevst_tpu.models.transformer import (
        collect_stats,
        decode_global,
        encode_content,
        encode_style,
        init_transformer_params,
    )
    from rerevst_tpu.ops.image import padded_size

    if args.tiles is None:
        # True-1080p default measured in round 5 (PERF.md): tiling the two
        # full-res regions lifts the batch-12+ compile-time HBM OOM, and
        # batch 16 x 2 tiles beats the old batch-8-untiled ceiling.
        args.tiles = 2 if args.mode == "1080p" else 1
    dtype = dtype_from_name(args.dtype)
    cfg = ModelConfig(dtype=dtype, fp32_mix=args.tail,
                      precision=args.precision,
                      parity_packed=args.packed,
                      pairlane=args.pairlane,
                      outpairs=args.outpairs,
                      luma_fold=args.luma_fold,
                      spatial_tiles=args.tiles)
    if "x" in str(args.size):
        ch, cw = (int(v) for v in str(args.size).split("x"))
    else:
        ch = cw = int(args.size)
    # 512 -> 640x640; 1080x1920 -> 1216x2048 at the reference's pad=64/x64.
    h, w = padded_size(ch, cw, args.pad, args.granularity)

    params = init_transformer_params(jax.random.PRNGKey(0), cfg,
                                     with_loss_net=False)
    style = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3), dtype) * 0.5
    sample = jax.random.normal(jax.random.PRNGKey(2), (4, h, w, 3), dtype) * 0.5
    batch = jax.random.normal(jax.random.PRNGKey(3),
                              (args.batch, h, w, 3), dtype) * 0.5

    @jax.jit
    def prep(params, style, sample):
        sf = encode_style(params, style, cfg)
        feats = encode_content(params, sample, cfg)
        return sf, collect_stats(params["decoder"], feats, sf, cfg)

    if args.mode == "multistyle":
        from rerevst_tpu.models.transformer import (
            blend_pytrees,
            blend_pytrees_batched,
        )

        style2 = jax.random.normal(jax.random.PRNGKey(9), (1, h, w, 3),
                                   dtype) * 0.5
        sf2, stats2 = prep(params, style2, sample)
        w1, w2 = jnp.asarray(0.3, jnp.float32), jnp.asarray(0.7, jnp.float32)
        if args.sweep_weights:
            # Per-FRAME weight rows (the interpolation sweep served by
            # MultiStylization.transfer_batch): batched conditioning state,
            # [B,P,Q] filters instead of a broadcast [1,P,Q].
            t = jnp.linspace(0.0, 1.0, args.batch)
            wrows = jnp.stack([t, 1.0 - t], axis=1)

            def hot_fn(params, frames, sf, stats):
                bsf = blend_pytrees_batched([sf, sf2], wrows)
                bst = blend_pytrees_batched([stats, stats2], wrows)
                feats = encode_content(params, frames, cfg, desaturate=True)
                return decode_global(params["decoder"], feats, bsf, bst, cfg)
        else:
            def hot_fn(params, frames, sf, stats):
                bsf = blend_pytrees([sf, sf2], [w1, w2])
                bst = blend_pytrees([stats, stats2], [w1, w2])
                feats = encode_content(params, frames, cfg, desaturate=True)
                return decode_global(params["decoder"], feats, bsf, bst, cfg)
    else:
        def hot_fn(params, frames, sf, stats):
            feats = encode_content(params, frames, cfg, desaturate=True)
            return decode_global(params["decoder"], feats, sf, stats, cfg)
    hot = jax.jit(hot_fn, donate_argnums=(1,) if args.donate else ())

    sf, stats = prep(params, style, sample)

    # Warmup / compile.  NOTE: on the tunneled TPU platform block_until_ready
    # does not actually block, so all timing below uses data-dependent call
    # chains (output fed back as input) closed by a scalar fetch.
    out = hot(params, batch + 0, sf, stats)  # +0: keep `batch` if donating
    float(jnp.mean(out.astype(jnp.float32)))

    def chain(n):
        x = batch + 0  # fresh buffer per chain (donation invalidates inputs)
        float(jnp.mean(x[0, 0, 0].astype(jnp.float32)))  # materialize it
        t0 = time.perf_counter()
        for _ in range(n):
            # Cast back to the bench dtype: with an fp32 mix tail the output
            # is fp32, and feeding it straight back would compile (and time)
            # a second fp32-input executable instead of the production one.
            x = hot(params, x, sf, stats).astype(dtype)
        float(jnp.mean(x.astype(jnp.float32)))
        return time.perf_counter() - t0

    n_iters = max(args.frames // args.batch, 2)
    t1 = min(chain(1) for _ in range(args.reps))
    tn = min(chain(n_iters) for _ in range(args.reps))
    per_call = max(tn - t1, 1e-9) / (n_iters - 1)
    best = per_call / args.batch
    lat = [per_call * 1e3]

    fps = 1.0 / best
    metric = {"infer": "frames_per_sec_512p",
              "multistyle": "frames_per_sec_512p_2style",
              "1080p": "frames_per_sec_1080p_true",
              "sintel": "frames_per_sec_436x1024",
              "latency": "frames_per_sec_512p_batch1"}[args.mode]
    if args.mode == "infer" and (ch, cw) != (512, 512):
        metric = f"frames_per_sec_{ch}x{cw}"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 200.0, 3),
        "batch_latency_ms": round(lat[0], 2),
        "content_hw": [ch, cw],
        "padded_hw": [h, w],
        "batch": args.batch,
        "dtype": (args.dtype
                  + ("" if args.precision == "auto"
                     else f"/{args.precision}")
                  + ("" if args.tail == "none"
                     else f"+fp32mix:{args.tail}")
                  + ("+packed" if args.packed else "")
                  + ("+pairlane" if args.pairlane else "")
                  + ("+donate" if args.donate else "")
                  + ("+sweep" if args.sweep_weights else "")
                  + ("" if args.outpairs == "auto"
                     else f"+outpairs:{args.outpairs}")
                  + ("+lumafold" if args.luma_fold else "")
                  + ("" if args.tiles == 1 else f"+tiles{args.tiles}")
                  + ("" if (args.pad, args.granularity) == (64, 64)
                     else f"+pad{args.pad}/x{args.granularity}")),
        "device": str(jax.devices()[0]),
    }))


def synth_pan_clip(n_frames: int = 25, out_hw=(320, 480)):
    """Second quality-evaluation clip: a deterministic camera pan + slow
    zoom over a bundled reference image (`/root/reference/data/other_1.jpg`,
    426x640 — the style set doubles as natural content here).  A sliding,
    slowly shrinking crop window resampled to a fixed geometry produces
    real, smooth, Farneback-estimable motion (~4 px/frame diagonal
    translation + ~0.3%/frame scale), so E_warp/tSSIM measure temporal
    consistency on a SECOND content clip with a different motion model
    than ambush_4's articulated characters (VERDICT r4 #5)."""
    import cv2
    import numpy as np

    src = cv2.imread("/root/reference/data/other_1.jpg")
    sh, sw = src.shape[:2]
    oh, ow = out_hw
    frames = []
    for t in range(n_frames):
        a = t / max(n_frames - 1, 1)
        scale = 1.0 - 0.08 * a          # zoom in 8% over the clip
        ch, cw = int(round(oh * 1.2 * scale)), int(round(ow * 1.2 * scale))
        y0 = int(round(a * (sh - ch)))
        x0 = int(round(a * (sw - cw)))
        crop = src[y0:y0 + ch, x0:x0 + cw]
        frames.append(cv2.resize(crop, (ow, oh),
                                 interpolation=cv2.INTER_AREA))
    return frames


def bench_quality(args):
    """Temporal-quality artifact (one JSON line, like the fps modes): E_warp
    + warped-SSIM on the real ambush_4 fixture with the bundled trained
    checkpoint, sequence-global vs per-frame — so quality regressions show
    up across rounds exactly like perf regressions.  The numbers previously
    lived only as hand-recorded entries in DEMO_RESULTS.json."""
    import glob
    import os

    import cv2

    from rerevst_tpu.api import Stylization
    from rerevst_tpu.config import (
        InferenceConfig,
        ModelConfig,
        dtype_from_name,
    )
    from rerevst_tpu.eval.ewarp import EwarpAccumulator
    from rerevst_tpu.eval.ssim import TemporalSSIMAccumulator

    fixture = os.environ.get("RV_FIXTURE", "/root/reference/test/inputs")
    ckpt = os.environ.get(
        "RV_CKPT", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "models", "demo_plum_4000.msgpack"))
    if args.clip == "pan":
        frames = synth_pan_clip()
    else:
        paths = sorted(glob.glob(f"{fixture}/ambush_4/*.png"))
        frames = [cv2.imread(p) for p in paths]
    if args.quick:
        frames = frames[:9]
    # Style sweep: the fixture pair first (the cross-round artifact), then
    # a fixed slice of the reference's bundled style set (data/README.md:
    # 1-3 — the 35 images its own demos sample from).  Fixed order => the
    # per-style rows are comparable across rounds.
    style_paths = [f"{fixture}/plum_flower.jpg"]
    if args.styles > 1:
        pool = (sorted(glob.glob("/root/reference/data/img_*.jpg"))
                + sorted(glob.glob("/root/reference/data/other_*.jpg")))
        style_paths += pool[: args.styles - 1]
    cfg = ModelConfig(dtype=dtype_from_name(args.dtype))
    rows = []
    for sp in style_paths:
        style = cv2.imread(sp)
        results = {}
        for mode in ("global", "per_frame"):
            s = Stylization(checkpoint=ckpt, cfg=cfg,
                            use_global=(mode == "global"),
                            infer=InferenceConfig(
                                batch_size=args.batch or 8,
                                use_global=(mode == "global"),
                                pad=args.pad,
                                granularity=args.granularity))
            s.prepare_style(style)
            ew, ts = EwarpAccumulator(), TemporalSSIMAccumulator()
            for orig, styled in zip(
                    frames, s.stylize_video(frames,
                                            batch_size=args.batch or 8)):
                ew.push(orig, styled)
                ts.push(orig, styled)
            results[mode] = {**ew.result(), **ts.result()}
        g, p = results["global"], results["per_frame"]
        rows.append({
            "style": os.path.basename(sp),
            "ewarp_global": round(g["ewarp"], 4),
            "ewarp_per_frame": round(p["ewarp"], 4),
            # One convention everywhere (VERDICT r4 weak #4): improvement
            # = (per_frame - global) / per_frame — the fraction of the
            # per-frame instability the global pass removes; the tested
            # contract (test_api.py) is >= 10% in THIS convention.
            "ewarp_improvement_pct": round(
                100.0 * (p["ewarp"] - g["ewarp"]) / max(p["ewarp"], 1e-9),
                2),
            "tssim_global": round(g["tssim"], 4),
            "tssim_per_frame": round(p["tssim"], 4),
        })
        last_g, last_p = g, p
    fix = rows[0]
    import statistics

    print(json.dumps({
        "metric": ("ewarp_global_fixture" if args.clip == "ambush"
                   else "ewarp_global_panclip"),
        "clip": args.clip,
        "value": fix["ewarp_global"],
        "unit": "masked pixel L1, lower is better",
        # The behavioral contract (tested strictly in test_api.py): global
        # feature sharing removes >=10% of per-frame E_warp.  Convention:
        # (per_frame - global) / per_frame, stated per row above.
        "vs_baseline": round(fix["ewarp_per_frame"]
                             / max(fix["ewarp_global"], 1e-9), 4),
        "ewarp_per_frame": fix["ewarp_per_frame"],
        "ewarp_control_unstyled": round(last_g["ewarp_control"], 4),
        "tssim_global": fix["tssim_global"],
        "tssim_per_frame": fix["tssim_per_frame"],
        "tssim_control_unstyled": round(last_g["tssim_control"], 4),
        "pairs": last_g["pairs"],
        "styles": rows if args.styles > 1 else None,
        "ewarp_improvement_pct_median": round(statistics.median(
            r["ewarp_improvement_pct"] for r in rows), 2),
        "ewarp_improvement_pct_min": round(min(
            r["ewarp_improvement_pct"] for r in rows), 2),
        "pad": [args.pad, args.granularity],
        "dtype": args.dtype,
        "checkpoint": os.path.basename(ckpt),
        "device": str(jax.devices()[0]),
    }))


def bench_train(args):
    """Full training-step throughput (the paper recipe: batch 4, 256^2 crops,
    all losses incl. the 16-iteration relaxed-style inner optimization)."""
    import jax.numpy as jnp

    from rerevst_tpu.config import LossConfig, ModelConfig, TrainConfig
    from rerevst_tpu.models.transformer import init_transformer_params
    from rerevst_tpu.train.state import init_train_state
    from rerevst_tpu.train.step import make_train_step

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.inner_dtype == "bf16" and dtype == jnp.bfloat16:
        # relaxed.py's inner_bf16 gate requires model dtype != bf16; the
        # flag would silently no-op and mislabel the recorded JSON.
        import sys

        print("warning: --inner-dtype bf16 is redundant with --dtype bf16 "
              "(the whole step already runs bf16); recording as plain bf16",
              file=sys.stderr)
        args.inner_dtype = "same"
    cfg = TrainConfig(
        model=ModelConfig(dtype=dtype),
        loss=LossConfig(relaxed_inner_dtype=args.inner_dtype,
                        relaxed_blur_scale=args.blur_scale),
        remat=args.remat)
    params = init_transformer_params(jax.random.PRNGKey(0), cfg.model,
                                     with_loss_net=True)
    state = init_train_state(params, cfg)
    step = make_train_step(cfg, params)
    b = 4 if not args.quick else 2
    content = jax.random.normal(jax.random.PRNGKey(1), (b, 256, 256, 3),
                                cfg.model.dtype) * 0.5
    style = jax.random.normal(jax.random.PRNGKey(2), (b, 256, 256, 3),
                              cfg.model.dtype) * 0.5
    key = jax.random.PRNGKey(3)

    def chain(state, n):
        t0 = time.perf_counter()
        for i in range(n):
            state, metrics = step(state, content, style,
                                  jax.random.fold_in(key, i))
        float(metrics["total"])
        return time.perf_counter() - t0, state

    _, state = chain(state, 1)  # compile
    t1, state = chain(state, 1)
    n = 2 if args.quick else 6
    tn, state = chain(state, n)
    per = max(tn - t1, 1e-9) / (n - 1) if n > 1 else tn
    print(json.dumps({
        "metric": "train_steps_per_sec_b4_256",
        "value": round(1.0 / per, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": None,
        "step_ms": round(per * 1e3, 1),
        "dtype": (args.dtype
                  + ("" if args.inner_dtype == "same"
                     else f"+inner:{args.inner_dtype}")
                  + ("" if args.blur_scale == 1
                     else f"+blur/{args.blur_scale}")
                  + ("+remat" if args.remat else "")),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
