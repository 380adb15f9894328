"""Serving cold start: fresh-process time to the first styled frame.

Measures what a user pays between ``python -m rerevst_tpu.serve`` (or any
fresh serving process) starting and the first styled frame coming back:
imports, checkpoint load, style prep (encode_style compile), Pass 1
(encode_content + collect_stats — the biggest graph), and the first Pass-2
frame.  The reference's analog is an instant ``torch.load`` + eager run
(``test/framework.py:57-78``) — it pays no compile, so OUR number has to
come from the persistent compile cache + boot warmup, and it has to be
measured, not assumed (VERDICT r4 missing #4).

Each variant runs in a FRESH subprocess (cold JIT state by construction):

- ``jit-cold``   — persistent compile cache DISABLED (worst case)
- ``jit-warm``   — persistent cache on and pre-populated (default serving)
- ``aot``        — Pass 2 from an AOT bundle (io/aot.py), cache on

Usage: python scripts/bench_cold_start.py [--size 512] [--batch 8]
           [--variants jit-warm,aot] [--json out.json]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
t0 = time.perf_counter()
import numpy as np
import jax
phase = {}
if os.environ.get("RV_COLD_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["RV_COLD_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from rerevst_tpu.api import Stylization
from rerevst_tpu.config import InferenceConfig, ModelConfig, dtype_from_name
phase["imports"] = time.perf_counter() - t0

size = int(os.environ["RV_COLD_SIZE"]); batch = int(os.environ["RV_COLD_BATCH"])
rng = np.random.default_rng(0)
frame = rng.integers(0, 255, (size, size, 3), np.uint8)
style = rng.integers(0, 255, (size, size, 3), np.uint8)

t = time.perf_counter()
s = Stylization(checkpoint=os.environ["RV_COLD_CKPT"],
                cfg=ModelConfig(dtype=dtype_from_name(
                    os.environ.get("RV_COLD_DTYPE", "f16"))),
                infer=InferenceConfig(batch_size=batch))
phase["checkpoint_load"] = time.perf_counter() - t

t = time.perf_counter()
s.prepare_style(style)
jax.block_until_ready(s.style)
np.asarray(s.style.means[0])  # force through the tunnel (block is a no-op)
phase["style_prep"] = time.perf_counter() - t

t = time.perf_counter()
s.add(frame); s.compute()
np.asarray(s.stats.norms["pre"].mean)
phase["pass1"] = time.perf_counter() - t

if os.environ.get("RV_COLD_AOT"):
    s.use_aot(os.environ["RV_COLD_AOT"])
t = time.perf_counter()
out = s.transfer(frame)
phase["pass2_first_frame"] = time.perf_counter() - t
assert out.shape == frame.shape and out.dtype == np.uint8
t = time.perf_counter()
out = s.transfer(frame)
phase["pass2_steady"] = time.perf_counter() - t
phase["total_to_first_frame"] = sum(
    phase[k] for k in ("imports", "checkpoint_load", "style_prep",
                       "pass1", "pass2_first_frame"))
print("COLDSTART " + json.dumps(phase))
"""


def run_variant(name: str, size: int, batch: int, dtype: str, ckpt: str,
                aot: str | None) -> dict:
    env = dict(os.environ)
    env.update(RV_COLD_SIZE=str(size), RV_COLD_BATCH=str(batch),
               RV_COLD_DTYPE=dtype, RV_COLD_CKPT=ckpt)
    if name == "jit-cold":
        # A throwaway cache dir = guaranteed-cold persistent cache without
        # touching the real one.
        env["RV_COLD_CACHE_DIR"] = tempfile.mkdtemp(prefix="rv_coldcache_")
    else:
        env["RV_COLD_CACHE_DIR"] = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax"))
    if name == "aot":
        assert aot, "--aot bundle path required for the aot variant"
        env["RV_COLD_AOT"] = aot
    proc = subprocess.run([sys.executable, "-c", _CHILD], cwd=HERE, env=env,
                          capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("COLDSTART "):
            return json.loads(line[len("COLDSTART "):])
    raise RuntimeError(
        f"variant {name} failed (rc={proc.returncode}):\n{proc.stdout}\n"
        f"{proc.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="f16")
    ap.add_argument("--ckpt", default=os.path.join(
        HERE, "models", "demo_plum_4000.msgpack"))
    ap.add_argument("--aot", default=None,
                    help="AOT bundle for the 'aot' variant (convert "
                         "--export-aot)")
    ap.add_argument("--variants", default="jit-warm,jit-warm",
                    help="comma list of {jit-cold,jit-warm,aot}; jit-warm "
                         "twice shows run-to-run spread")
    args = ap.parse_args()

    out = []
    for v in args.variants.split(","):
        r = {k: round(s, 2) for k, s in run_variant(
            v, args.size, args.batch, args.dtype, args.ckpt,
            args.aot).items()}
        out.append({"variant": v, **r})
        print(json.dumps(out[-1]), flush=True)
    print(json.dumps({"metric": "cold_start_to_first_frame",
                      "size": args.size, "batch": args.batch,
                      "dtype": args.dtype, "variants": out}))


if __name__ == "__main__":
    main()
