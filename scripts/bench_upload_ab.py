"""A/B the one-upload-per-chunk pipeline against per-frame device_puts.

Round-3 VERDICT asked for the measured CLI wall-clock delta of the
single-upload `stylize_video` path (api.py:_next_chunk — host-side batch
prep + ONE `_upload` per chunk) vs the round-3 behavior it replaced
(`jnp.concatenate([self._prep(f) for f in chunk])`, i.e. `batch_size`
separate tunnel round trips per chunk).  The batched path is the only one
shipped; the per-frame control is reconstructed here by patching
`_prep_batch_host` with the old expression.

Workloads (both at the reference fixture geometry, 436x1024 -> 576x1152):
  * the real 33-frame ambush_4 clip (``test/generate_real_video.py:21-26``)
  * a synthetic 300-frame clip (uint8 noise; content doesn't matter for
    transfer cost; 300 frames ~ the long-video regime the streaming
    pipeline targets)

Wall time is end-to-end `stylize_video` consumption (Pass 1 + Pass 2 +
D2H), the thing a CLI user experiences.  Tunnel RPC variance is real
(PERF.md round 2: 60-170 s run-to-run on whole-CLI runs), so each cell
runs `--reps` times and reports all values.

Usage: python scripts/bench_upload_ab.py [--reps 2] [--frames 300]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import jax.numpy as jnp
import numpy as np

from rerevst_tpu.api import Stylization

FIXTURE = "/root/reference/test/inputs/ambush_4"
STYLE = "/root/reference/test/inputs/plum_flower.jpg"
CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models", "demo_plum_4000.msgpack")


def per_frame_prep_batch_host(self, frames_bgr):
    """The round-3 chunk assembly: one device_put per frame."""
    return jnp.concatenate([self._prep(f) for f in frames_bgr], axis=0)


def run_clip(frames, batched: bool, batch_size: int) -> float:
    s = Stylization(CKPT)
    if not batched:
        s._prep_batch_host = per_frame_prep_batch_host.__get__(s)
    s.prepare_style(cv2.imread(STYLE))
    t0 = time.perf_counter()
    n = 0
    for out in s.stylize_video(frames, batch_size=batch_size):
        n += 1
    assert n == len(frames)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--frames", type=int, default=300,
                    help="synthetic clip length")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    fixture = [cv2.imread(p) for p in
               sorted(glob.glob(os.path.join(FIXTURE, "*.png")))]
    rng = np.random.default_rng(0)
    synth = list(rng.integers(0, 256, (args.frames,) + fixture[0].shape,
                              dtype=np.uint8))

    results = {}
    for name, clip in [("ambush_4_33f", fixture),
                       (f"synthetic_{args.frames}f", synth)]:
        for mode, batched in [("batched_1_upload_per_chunk", True),
                              ("per_frame_uploads", False)]:
            # Warm once so compile time (shared by both modes) drops out.
            run_clip(clip[: 2 * args.batch], batched, args.batch)
            walls = [round(run_clip(clip, batched, args.batch), 2)
                     for _ in range(args.reps)]
            results[f"{name}/{mode}"] = walls
            print(json.dumps({"workload": name, "mode": mode,
                              "wall_s": walls, "batch": args.batch}),
                  flush=True)

    for name in ("ambush_4_33f", f"synthetic_{args.frames}f"):
        b = min(results[f"{name}/batched_1_upload_per_chunk"])
        p = min(results[f"{name}/per_frame_uploads"])
        print(json.dumps({"workload": name, "speedup_batched": round(p / b, 3),
                          "batched_best_s": b, "per_frame_best_s": p}),
              flush=True)


if __name__ == "__main__":
    main()
