"""Cross-precision pixel parity on real frames.

Quantifies how far the *fast* config's output is from the *proven-correct*
config's output, closing the perf/parity split: fp32-HIGHEST is byte-level
verified against the original PyTorch pipeline (tests/test_driver_parity.py),
so ``bf16 vs fp32-HIGHEST`` on the same checkpoint transitively bounds
``bf16 vs reference``.

Runs the bundled ``ambush_4`` fixture (MPI Sintel, the reference's smoke
clip, ``test/generate_real_video.py:21-26``) + ``plum_flower.jpg`` through
the full two-pass ``Stylization`` pipeline once per precision config and
reports per-pixel uint8 error statistics.

CLI: ``python -m rerevst_tpu.eval.parity [--checkpoint ...] [--frames N]``
(also surfaced as ``python bench.py --mode parity``).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FIXTURE_FRAMES = "/root/reference/test/inputs/ambush_4"
FIXTURE_STYLE = "/root/reference/test/inputs/plum_flower.jpg"
BUNDLED_CHECKPOINT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "models", "demo_plum_4000.msgpack")


def load_fixture(n_frames: Optional[int] = None,
                 crop: Optional[Tuple[int, int]] = None
                 ) -> Tuple[List[np.ndarray], np.ndarray]:
    """(ambush_4 frames BGR, plum_flower style BGR)."""
    import cv2

    paths = sorted(glob.glob(os.path.join(FIXTURE_FRAMES, "frame_*.png")))
    if n_frames is not None:
        paths = paths[:n_frames]
    frames = [cv2.imread(p) for p in paths]
    if crop is not None:
        frames = [f[:crop[0], :crop[1]] for f in frames]
    style = cv2.imread(FIXTURE_STYLE)
    return frames, style


def _load_params(checkpoint: str) -> Dict:
    if checkpoint.endswith(".pth"):
        from rerevst_tpu.io.torch_compat import load_reference_checkpoint

        return load_reference_checkpoint(checkpoint)
    from rerevst_tpu.io.checkpoint import load_params

    return load_params(checkpoint)


def run_pipeline(params: Dict, cfg, frames_bgr, style_bgr,
                 interval: int = 8, batch_size: int = 8) -> List[np.ndarray]:
    """Full two-pass stylization of a clip under one precision config."""
    from rerevst_tpu.api import Stylization
    from rerevst_tpu.config import InferenceConfig

    params = jax.tree.map(lambda a: jnp.asarray(a, cfg.dtype), params)
    s = Stylization(params=params, cfg=cfg, use_global=True,
                    infer=InferenceConfig(sample_interval=interval))
    s.prepare_style(style_bgr)
    return list(s.stylize_video(frames_bgr, batch_size=batch_size))


def pixel_error(a: List[np.ndarray], b: List[np.ndarray]) -> Dict:
    """Per-pixel uint8 error stats between two rendered clips.

    ``mean_01`` / ``max_01`` are in [0,1]-image units (counts / 255) — the
    scale of the ≤1e-3/pixel parity target (BASELINE.md)."""
    diffs = [np.abs(x.astype(np.int16) - y.astype(np.int16))
             for x, y in zip(a, b)]
    flat = np.concatenate([d.ravel() for d in diffs])
    return {
        "mean_counts": float(flat.mean()),
        "max_counts": int(flat.max()),
        "p99_counts": float(np.percentile(flat, 99)),
        "frac_gt1": float((flat > 1).mean()),
        "frac_gt2": float((flat > 2).mean()),
        "mean_01": float(flat.mean() / 255.0),
        "max_01": float(flat.max() / 255.0),
        "n_frames": len(diffs),
    }


def compare_configs(checkpoint: str, cfg_fast, cfg_ref, n_frames=None,
                    crop=None, interval: int = 8,
                    batch_size: int = 8) -> Dict:
    frames, style = load_fixture(n_frames, crop)
    params = _load_params(checkpoint)
    fast = run_pipeline(params, cfg_fast, frames, style, interval, batch_size)
    ref = run_pipeline(params, cfg_ref, frames, style, interval, batch_size)
    return pixel_error(fast, ref)


def main(argv=None):
    import argparse
    import json

    from rerevst_tpu.config import ModelConfig, dtype_from_name

    ap = argparse.ArgumentParser("rerevst_tpu.eval.parity")
    ap.add_argument("--checkpoint", default=BUNDLED_CHECKPOINT)
    ap.add_argument("--frames", type=int, default=None,
                    help="limit fixture frames (default: all 33)")
    ap.add_argument("--crop", type=int, nargs=2, default=None,
                    metavar=("H", "W"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fast_dtype", default="f16",
                    choices=["bf16", "f16", "f32"])
    ap.add_argument("--fast_precision", default="auto",
                    choices=["auto", "default", "high", "highest"])
    ap.add_argument("--pairlane", action="store_true",
                    help="measure the fast config WITH the pair-lane "
                         "Pallas kernels (documented negative result — "
                         "not part of the production config)")
    ap.add_argument("--fast_packed", action="store_true",
                    help="parity-packed boundary convs in the fast config")
    ap.add_argument("--fast_tail", default="none",
                    choices=["none", "out", "res2", "dec", "enc", "full", "body"],
                    help="fp32 storage region in the fast config "
                         "(ModelConfig.fp32_mix)")
    args = ap.parse_args(argv)

    fast = ModelConfig(
        dtype=dtype_from_name(args.fast_dtype),
        precision=args.fast_precision, fp32_mix=args.fast_tail,
        parity_packed=args.fast_packed,
        pairlane=args.pairlane)
    ref = ModelConfig(dtype=jnp.float32)  # auto -> HIGHEST (parity-proven)
    stats = compare_configs(args.checkpoint, fast, ref,
                            n_frames=args.frames,
                            crop=tuple(args.crop) if args.crop else None,
                            batch_size=args.batch)
    print(json.dumps({
        "metric": "pixel_err_fast_vs_f32",
        "value": stats["mean_01"],
        "unit": "mean |Δ| per pixel, [0,1] scale",
        "vs_baseline": stats["mean_01"] / 1e-3,
        "fast_config": (f"{args.fast_dtype}/{args.fast_precision}"
                        f"/tail={args.fast_tail}"
                        + ("/packed" if args.fast_packed else "")),
        **stats,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
